#!/usr/bin/env python
"""Sharded-engine overhead on the REAL chip (VERDICT r4 task 4).

All previous sharded evidence was CPU-mesh correctness.  This runs the
d=1 sharded program (same shard_map step the multi-chip path executes:
per-device row slices, psum'd k-space, all_gathered forces — collectives
degenerate to copies at d=1) on the real TPU next to the single-chip
engine, bounding the distributed program's fixed overhead (shard_map
plumbing, padding, per-shard tile caps) that the CPU dryrun cannot see.

The reference's MPI path is its production mode (tests/zmirror/input
runs 1/2/4 ranks for real); this is the closest statement a 1-chip
environment permits.

Usage: python tools/bench_sharded.py [workload] [nsteps]
Prints: single_ms=X sharded_d1_ms=Y overhead_pct=Z
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(run, state, nsteps, repeats=3):
    # TWO warmup calls: the sharded program's second invocation has been
    # observed to recompile/re-layout (572 ms/step once) before settling
    state = jax.block_until_ready(run(state))
    state = jax.block_until_ready(run(state))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = jax.block_until_ready(run(state))
        best = min(best, (time.perf_counter() - t0) / nsteps * 1e3)
    return best, state


def main():
    wl = sys.argv[1] if len(sys.argv) > 1 else "il_twolayer"
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    import lammps_user_conp2_tpu as pkg
    from lammps_user_conp2_tpu import workloads
    from lammps_user_conp2_tpu.models.conp import setup_conp
    from lammps_user_conp2_tpu.models.md import build_engine
    from lammps_user_conp2_tpu.parallel.sharded import build_sharded_engine
    from jax.sharding import Mesh

    pkg.enable_compile_cache()
    if wl == "synthetic33k":
        # mid-scale capacitor: PPPM + block path, the sharded fast-path mix
        import dataclasses
        from lammps_user_conp2_tpu.utils.config import KSpaceStyle, Solver
        system, md, cfg = workloads.synthetic(
            n_elyte=32768, nele_side=16, lz=160.0, lxy=81.0)
        cfg = dataclasses.replace(cfg, solver=Solver.INV,
                                  kspace=KSpaceStyle.PPPM)
        md = dataclasses.replace(md, pair_path="auto",
                                 kspace_style=KSpaceStyle.PPPM)
    else:
        system, md, cfg = getattr(workloads, wl)(0)
    solver = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    eng = build_engine(system, md, solver, dtype=jnp.float32)
    st = eng.init_state()

    run1 = jax.jit(lambda s: jax.lax.fori_loop(
        0, nsteps, lambda i, t: eng.step(t), s))
    single_ms, st1 = bench(run1, st, nsteps)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("s",))
    sheng = build_sharded_engine(eng, mesh)
    stp = sheng._prep_state(st)
    shards = sheng.shards
    runs = jax.jit(lambda s: jax.lax.fori_loop(
        0, nsteps, lambda i, t: sheng.step_fn(t, *shards), s))
    sharded_ms, st2 = bench(runs, stp, nsteps)

    assert np.isfinite(float(np.asarray(st1.energy)))
    assert np.isfinite(float(np.asarray(st2.energy)))
    ov = (sharded_ms / single_ms - 1.0) * 100.0
    print(f"workload={wl} single_ms={single_ms:.3f} "
          f"sharded_d1_ms={sharded_ms:.3f} overhead_pct={ov:.1f}")


if __name__ == "__main__":
    main()
