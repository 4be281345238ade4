#!/usr/bin/env python
"""Tile-pair Pallas kernel vs Verlet nlist sweep at the 100k config.

Measures (chained 50-iter loops, 3 trials, min — CLAUDE.md timing rules):
  - nlist_pair_forces on a prebuilt list (the current production pair path)
  - pair_forces_pallas under each ordering (kd128 / hilbert / z)
  - the ordering sorts standalone (they run per step in the kernel path)
Plus force agreement pallas vs nlist.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.system import exclusion_lists
from lammps_user_conp2_tpu.ops.neighbors import (build_neighbor_list,
                                                 make_neighbor_config,
                                                 nlist_pair_forces)
from lammps_user_conp2_tpu.ops.pairs import make_pair_tables
from lammps_user_conp2_tpu.ops.pallas.pair_kernel import (pair_forces_pallas,
                                                          pair_tile_count)

from timing import chain_ms as _chain_ms

ITERS = int(os.environ.get("ITERS", "50"))


def chain_ms(fn, x0, trials=3):
    return _chain_ms(fn, x0, iters=ITERS, trials=trials)


def main():
    n_elyte = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=23, lz=240.0, lxy=120.0)
    u = system.units()
    rng = np.random.default_rng(3)
    x = jnp.asarray(system.x0 + 0.15 * rng.standard_normal(system.x0.shape),
                    jnp.float32)
    q = jnp.asarray(system.q0, jnp.float32)
    ti = jnp.asarray(system.type)
    tables = make_pair_tables(system.lj_eps, system.lj_sigma, system.type,
                              jnp.float32)
    excl = tuple(jnp.asarray(a) for a in exclusion_lists(system))
    g = 0.35
    eps = jnp.asarray(1e-30, jnp.float32)
    print("backend:", jax.devices()[0], "natoms:", system.natoms)

    ncfg = make_neighbor_config(system.box, tuple(system.box_lo), md.cutoff,
                                system.natoms, periodic=system.periodic,
                                x0=np.asarray(x))
    nbr = jax.jit(lambda xx: build_neighbor_list(ncfg, xx, tables, ti))(x)
    jax.block_until_ready(nbr.idx)

    def f_nlist(xx):
        f, ev, ec, ov = nlist_pair_forces(ncfg, nbr, xx, q, ti, tables, excl,
                                          g_ewald=g, qqr2e=u.qqr2e)
        return xx + eps * f
    print(f"nlist sweep (K={ncfg.k_max}): {chain_ms(f_nlist, x):8.3f} ms")

    fr, evr, ecr, _ = jax.jit(lambda xx: nlist_pair_forces(
        ncfg, nbr, xx, q, ti, tables, excl, g_ewald=g, qqr2e=u.qqr2e))(x)

    for order, tr in (("kd128", 128), ("kd256", 256), ("hilbert", 128),
                      ("z", 256)):
        cnt = pair_tile_count(x, box=system.box, periodic=system.periodic,
                              cutoff=md.cutoff, tr=tr, order=order)
        cap = int(cnt * 1.3) + 8
        kw = dict(box=system.box, periodic=system.periodic, cutoff=md.cutoff,
                  g_ewald=g, qqr2e=u.qqr2e, tr=tr, tc=tr, order=order,
                  pair_cap=cap)

        def f_tile(xx):
            f, ev, ec = pair_forces_pallas(xx, q, ti, tables, excl, **kw)
            return xx + eps * f
        ms = chain_ms(f_tile, x)
        print(f"pallas {order:8s} tr={tr}: {ms:8.3f} ms  "
              f"(pairs {cnt}, slots {cnt * tr * tr / 1e6:.0f}M)")
        ft, evt, ect = jax.jit(lambda xx: pair_forces_pallas(
            xx, q, ti, tables, excl, **kw))(x)
        df = float(jnp.max(jnp.abs(ft - fr)))
        sc = float(jnp.max(jnp.abs(fr)))
        print(f"    max|df|={df:.3e} (scale {sc:.1e})  "
              f"dev={float(evt - evr):.2e} dec={float(ect - ecr):.2e}")

    from lammps_user_conp2_tpu.ops.pallas.zorder import ORDERINGS
    for name in ("kd128", "hilbert", "z"):
        fn = ORDERINGS[name]

        def f_sort(xx):
            perm, zs = fn(xx, system.box, system.periodic)
            return xx + eps * zs[:, None]
        print(f"sort {name:8s}: {chain_ms(f_sort, x):8.3f} ms")


if __name__ == "__main__":
    main()
