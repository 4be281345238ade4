"""TPU-native constant-potential molecular dynamics framework.

A from-scratch re-design of the capabilities of srtee/lammps-USER-CONP2
(constant-potential/charge/displacement electrodes for electrochemical MD)
for TPU hardware: JAX/XLA/Pallas compute, dense-linear-algebra Ewald,
jit-compiled MD loop, pjit/shard_map multi-chip scaling.
"""

__version__ = "0.1.0"


def enable_compile_cache(path=None):
    """Opt-in persistent XLA compilation cache.

    Large-N step programs compile in minutes (the 100k-atom PPPM step is
    ~8-16 min); the cache can make reruns near-instant.  NOT enabled by
    default: CPU AOT cache entries record machine-feature flags and XLA
    loads mismatched entries with only a warning ("could lead to SIGILL"),
    so sharing one cache dir across backends/processes is unsafe to force
    on every user.  Call this (or set CONP2_TPU_COMPILE_CACHE=path in the
    environment) to opt in."""
    import os

    try:
        import jax

        if path is None:
            path = os.environ.get("CONP2_TPU_COMPILE_CACHE", "")
            if path.lower() in ("", "1", "true", "yes", "on"):
                # boolean-style opt-in: use the repo-local default dir
                path = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    os.pardir, ".jax_cache")
        # per-host subdirectory: XLA:CPU AOT entries bake machine features
        # and a mismatched host warns "could lead to SIGILL"; stale
        # cross-host TPU entries have produced hard UNIMPLEMENTED errors on
        # cache READ (observed via tools/kernel_oracle.py).  Same-host
        # reruns keep the full benefit.
        import socket

        path = os.path.join(os.path.abspath(path),
                            socket.gethostname() or "host")
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — the cache is an optimization only
        pass


import os as _os

if _os.environ.get("CONP2_TPU_COMPILE_CACHE"):
    enable_compile_cache()
del _os

# Hoist large device-array constants (PPPM influence function, A^-1, cell
# tables) out of the HLO into executable arguments — cuts the 100k-atom
# program from ~150 MB of literal text to a few MB and the cold compile
# with it.  Graceful no-op if the jax internals move (utils/hoistconst).
from .utils import hoistconst as _hoistconst

_hoistconst.enable()
del _hoistconst
