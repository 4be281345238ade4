#!/usr/bin/env python
"""nlist vs XLA-block vs Mosaic-block pair sweep at the 100k config.

The Mosaic kernel (ops/pallas/block_pair.py) keeps the block sweep's
3.5x descriptor saving but runs the masked (NB, B, U) chain in VMEM.
Chained loops per CLAUDE.md; forces cross-checked vs the nlist sweep.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.system import exclusion_lists
from lammps_user_conp2_tpu.ops.neighbors import (block_pair_forces,
                                                 build_neighbor_list,
                                                 make_neighbor_config,
                                                 nlist_pair_forces)
from lammps_user_conp2_tpu.ops.pairs import make_pair_tables
from timing import chain_ms


def main():
    n_elyte = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=23, lz=240.0, lxy=120.0)
    u = system.units()
    x = jnp.asarray(system.x0, jnp.float32)
    q = jnp.asarray(system.q0, jnp.float32)
    ti = jnp.asarray(system.type)
    tables = make_pair_tables(system.lj_eps, system.lj_sigma, system.type,
                              jnp.float32)
    excl = tuple(jnp.asarray(a) for a in exclusion_lists(system))
    g = 0.35
    eps = jnp.asarray(1e-30, jnp.float32)
    print("backend:", jax.devices()[0], "natoms:", system.natoms)

    nc_n = make_neighbor_config(system.box, tuple(system.box_lo), md.cutoff,
                                system.natoms, periodic=system.periodic,
                                x0=np.asarray(system.x0))
    nb_n = jax.block_until_ready(jax.jit(
        lambda xx: build_neighbor_list(nc_n, xx, tables, ti))(x))
    nc_b = make_neighbor_config(system.box, tuple(system.box_lo), md.cutoff,
                                system.natoms, periodic=system.periodic,
                                x0=np.asarray(system.x0), block=8)
    from lammps_user_conp2_tpu.ops.neighbors import max_union_count
    import dataclasses
    base = dataclasses.replace(nc_b, block=0, u_max=0)
    nl0 = jax.block_until_ready(jax.jit(
        lambda xx: build_neighbor_list(base, xx, tables, ti))(x))
    um = max_union_count(nc_b, x, nl0)
    u_max = int(np.ceil(um * 1.3 / 8) * 8)
    nc_b = dataclasses.replace(nc_b, u_max=u_max)
    nb_b = jax.block_until_ready(jax.jit(
        lambda xx: build_neighbor_list(nc_b, xx, tables, ti))(x))
    print(f"K={nc_n.k_max} U={u_max} (max union {um})")

    def f_nlist(xx):
        f, ev, ec, ov = nlist_pair_forces(nc_n, nb_n, xx, q, ti, tables,
                                          excl, g_ewald=g, qqr2e=u.qqr2e)
        return xx + eps * f
    print(f"nlist sweep        : {chain_ms(f_nlist, x):8.3f} ms", flush=True)

    fr = jax.jit(lambda xx: nlist_pair_forces(
        nc_n, nb_n, xx, q, ti, tables, excl, g_ewald=g, qqr2e=u.qqr2e))(x)

    for name, up in (("block XLA ", False), ("block MOSA", True)):
        def f_blk(xx, up=up):
            f, ev, ec, ov = block_pair_forces(
                nc_b, nb_b, xx, q, ti, tables, excl, g_ewald=g,
                qqr2e=u.qqr2e, use_pallas=up)
            return xx + eps * f
        ms = chain_ms(f_blk, x)
        fb = jax.jit(lambda xx, up=up: block_pair_forces(
            nc_b, nb_b, xx, q, ti, tables, excl, g_ewald=g, qqr2e=u.qqr2e,
            use_pallas=up))(x)
        df = float(jnp.max(jnp.abs(fb[0] - fr[0])))
        sc = float(jnp.max(jnp.abs(fr[0])))
        print(f"{name} sweep       : {ms:8.3f} ms   max|df|={df:.2e} "
              f"(scale {sc:.1e}) dev={float(fb[1]-fr[1]):.2e}", flush=True)


if __name__ == "__main__":
    main()
