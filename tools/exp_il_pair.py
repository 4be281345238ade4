#!/usr/bin/env python
"""Pair-kernel ordering/tile-size sweep at il_twolayer scale (3776 atoms).

The engine currently runs order="z", tr=256 at this size; the round-3
3-D AABB culling + kd/hilbert orderings were tuned at 100k — this measures
whether they also win at the north-star size, with the CONP correction
fused (the production configuration).  Chained loops, 3 trials, min
(CLAUDE.md timing rules).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.conp import setup_conp
from lammps_user_conp2_tpu.models.md import build_engine
from lammps_user_conp2_tpu.ops.pallas.pair_kernel import (pair_forces_pallas,
                                                          pair_tile_count)

from timing import chain_ms as _chain_ms

ITERS = int(os.environ.get("ITERS", "1000"))


def chain_ms(fn, x0, trials=3):
    return _chain_ms(fn, x0, iters=ITERS, trials=trials)


def main():
    system, md, cfg = workloads.il_twolayer(0)
    conp = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    eng = build_engine(system, md, conp, dtype=jnp.float32)
    st = eng.init_state()
    u = system.units()
    x, q = st.x, st.q
    eps = jnp.asarray(1e-30, x.dtype)
    print("backend:", jax.devices()[0], "natoms:", system.natoms)

    kern = conp.kernels
    fuse = ((eng.elecheck != 0).astype(x.dtype),
            jnp.asarray(conp.elyte_mask, x.dtype),
            jnp.asarray(kern.eta_ij, x.dtype),
            jnp.asarray(kern.fo_ij, x.dtype))

    ref = None
    for order, tr in (("z", 256), ("z", 128), ("kd128", 128), ("kd128", 256),
                      ("hilbert", 128)):
        cnt = pair_tile_count(x, box=system.box, periodic=system.periodic,
                              cutoff=md.cutoff, tr=tr, order=order)
        cap = int(cnt * 1.3) + 8
        kw = dict(box=eng.ksp_force.box, periodic=system.periodic,
                  cutoff=md.cutoff, g_ewald=eng.ksp_force.g_ewald,
                  qqr2e=u.qqr2e, tr=tr, tc=tr, order=order, pair_cap=cap,
                  conp_fuse=fuse)

        def f_tile(xx):
            f, ev, ec, ecorr = pair_forces_pallas(
                xx, q, eng.type_idx, eng.tables, eng.exclusions, **kw)
            return xx + eps * f
        ms = chain_ms(f_tile, x)
        print(f"pair+corr {order:8s} tr={tr}: {ms:8.3f} ms  (pairs {cnt})")
        out = jax.jit(lambda xx: pair_forces_pallas(
            xx, q, eng.type_idx, eng.tables, eng.exclusions, **kw))(x)
        if ref is None:
            ref = out
        else:
            df = float(jnp.max(jnp.abs(out[0] - ref[0])))
            print(f"    max|df| vs first: {df:.3e}")


if __name__ == "__main__":
    main()
