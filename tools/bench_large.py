#!/usr/bin/env python
"""Production-scale benchmark: the 100k-atom synthetic capacitor.

Configuration: PPPM mesh k-space (tiled scatter-free spread/gather),
INV electrode solve (the host-assembled plane-factored A inverse — one
(Ne,Ne) matvec per step; pass cg_matfree as argv[3] for the matrix-free
CG path), Verlet neighbor lists with skin.  First run compiles for
~10 min at this size; the persistent compile cache (.jax_cache) makes
reruns fast.

Usage: python tools/bench_large.py [natoms_elyte] [nele_side] [solver] [pair] [lz]
(pair: nlist | block | tile — default auto; block measured parity at 100k.
lz: box height, default 240 — the 250k stretch config is
`bench_large.py 245760 23 inv auto 600`, same density, 2.5x the cell)
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.conp import setup_conp
from lammps_user_conp2_tpu.models.md import build_engine
from lammps_user_conp2_tpu.utils.config import KSpaceStyle, Solver


def main():
    n_elyte = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    nele_side = int(sys.argv[2]) if len(sys.argv) > 2 else 23
    solver = Solver[(sys.argv[3] if len(sys.argv) > 3 else "inv").upper()]
    pair = sys.argv[4] if len(sys.argv) > 4 else "auto"
    lz = float(sys.argv[5]) if len(sys.argv) > 5 else 240.0
    t0 = time.time()
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=nele_side, lz=lz, lxy=120.0)
    cfg = dataclasses.replace(cfg, solver=solver, kspace=KSpaceStyle.PPPM)
    md = dataclasses.replace(md, pair_path=pair,
                             kspace_style=KSpaceStyle.PPPM)
    conp = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    print(f"setup_conp done {time.time() - t0:.0f}s", file=sys.stderr,
          flush=True)
    eng = build_engine(system, md, conp, dtype=jnp.float32)
    st = eng.init_state()
    jax.block_until_ready(st.x)
    setup_s = time.time() - t0
    print(f"init_state done {setup_s:.0f}s", file=sys.stderr, flush=True)
    # ONE compiled program (the 100-step thermo-free chain): its first call
    # is both the compile and the warmup — no separate run(5) scan that
    # would compile the whole step body a second time (round-3 lesson: the
    # cold 100k compile of three programs blew the bench budget).
    # 100 steps per chain (round-4 verdict): the neighbor rebuild fires on
    # a ~20-step cadence, so 20-step chains let best-of select rebuild-free
    # windows; a 100-step chain integrates ~5 rebuild events every trial,
    # and the ~35 ms fixed tunnel overhead per call drops to 0.35 ms/step.
    nchain = 100
    st, _ = eng.run(st, nchain, thermo_every=0)
    jax.block_until_ready(st.x)
    print(f"compile+warmup done {time.time() - t0:.0f}s", file=sys.stderr,
          flush=True)
    # best-of-3: single trials on the tunnel can be stall-inflated 50x
    # (CLAUDE.md); a stall only ever slows a trial, so min() discards it
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st, _ = eng.run(st, nchain, thermo_every=0)
        jax.block_until_ready(st.x)
        best = min(best, (time.perf_counter() - t0) / nchain * 1e3)
    assert np.isfinite(float(st.energy)), "non-finite energy"
    print(f"natoms={system.natoms} setup_s={setup_s:.1f} "
          f"step_ms={best:.1f} steps_per_sec={1000.0 / best:.2f}")


if __name__ == "__main__":
    main()
