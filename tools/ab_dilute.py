#!/usr/bin/env python
"""Dilute-section A/B probe (VERDICT r4 task 1).

Reproduces bench.py's dilute methodology exactly (chained 4000-step
fori_loop, compile+warm call first) but prints EVERY trial's steps/s plus
min/median/max, so hour-to-hour tunnel variance is visible instead of being
hidden by the best-of reduction.  Run it back-to-back at two commits (git
worktree) to A/B a regression with the tunnel hour held constant.

Usage: python tools/ab_dilute.py [repeats] [nsteps]
"""

import json
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 4000

    import jax
    import jax.numpy as jnp

    import lammps_user_conp2_tpu as pkg
    from lammps_user_conp2_tpu import workloads
    from lammps_user_conp2_tpu.models.conp import setup_conp
    from lammps_user_conp2_tpu.models.md import build_engine

    pkg.enable_compile_cache()

    system, md, cfg = workloads.dilute(0)
    solver = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    eng = build_engine(system, md, solver, dtype=jnp.float32)

    state = eng.init_state()
    run = jax.jit(lambda st: jax.lax.fori_loop(
        0, nsteps, lambda i, s: eng.step(s), st))
    t0 = time.perf_counter()
    state = jax.block_until_ready(run(state))
    compile_s = time.perf_counter() - t0

    trials = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = jax.block_until_ready(run(state))
        trials.append(nsteps / (time.perf_counter() - t0))
    print(json.dumps({
        "trials": [round(t, 1) for t in trials],
        "best": round(max(trials), 1),
        "median": round(statistics.median(trials), 1),
        "min": round(min(trials), 1),
        "compile_s": round(compile_s, 1),
        "nsteps": nsteps,
    }))


if __name__ == "__main__":
    main()
