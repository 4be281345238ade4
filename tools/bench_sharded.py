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
    equilibrate = 0
    if wl.startswith("synthetic"):
        # the synthetic lattice start melts over the first few hundred
        # steps; run them through Engine.run (overflow-healing: capacities
        # regrow at host boundaries) BEFORE benching raw chains, so the
        # chained fori_loops below never hit a NaN-poisoned capacity
        equilibrate = 600
        # capacitor configs exercising the sharded fast-path mix (PPPM
        # tiled mesh + block/nlist pair path).  "synthetic8k" is the
        # bench.py default: same code paths as 33k at ~1/4 the compile
        # cost, so the section fits its subprocess budget even on a slow
        # tunnel hour (the 33k number is recorded in
        # validation/VALIDATION.md: +19-21%).
        import dataclasses
        from lammps_user_conp2_tpu.utils.config import KSpaceStyle, Solver
        n_elyte, nele, lz = ((32768, 16, 160.0) if wl == "synthetic33k"
                             else (8192, 12, 120.0))
        system, md, cfg = workloads.synthetic(
            n_elyte=n_elyte, nele_side=nele, lz=lz, lxy=81.0)
        cfg = dataclasses.replace(cfg, solver=Solver.INV,
                                  kspace=KSpaceStyle.PPPM)
        # block explicitly: auto's size threshold would route the 8k
        # config onto a slow path (15.6 ms/step), and the Verlet-skin
        # rebuild inside the step keeps long raw chains capacity-safe
        md = dataclasses.replace(md, pair_path="block",
                                 kspace_style=KSpaceStyle.PPPM)
    else:
        system, md, cfg = getattr(workloads, wl)(0)
    solver = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    eng = build_engine(system, md, solver, dtype=jnp.float32)
    st = eng.init_state()
    if equilibrate:
        st, _ = eng.run(st, equilibrate, thermo_every=0)
        jax.block_until_ready(st.x)

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
