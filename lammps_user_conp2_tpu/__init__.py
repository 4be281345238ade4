"""TPU-native constant-potential molecular dynamics framework.

A from-scratch re-design of the capabilities of srtee/lammps-USER-CONP2
(constant-potential/charge/displacement electrodes for electrochemical MD)
for TPU hardware: JAX/XLA/Pallas compute, dense-linear-algebra Ewald,
jit-compiled MD loop, pjit/shard_map multi-chip scaling.
"""

__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA compilation cache, on by default.

    Large-N step programs compile in minutes (the 100k-atom PPPM step is
    ~8-16 min on the tunnel); the cache makes reruns near-instant.  Disable
    with CONP2_TPU_NO_COMPILE_CACHE=1 or point CONP2_TPU_COMPILE_CACHE at a
    different directory."""
    import os

    if os.environ.get("CONP2_TPU_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        path = os.environ.get(
            "CONP2_TPU_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         os.pardir, ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — the cache is an optimization only
        pass


_enable_compile_cache()
