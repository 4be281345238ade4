#!/usr/bin/env python
"""Decompose build_neighbor_list cost at 100k atoms on the real TPU.

Cumulative stages of the current builder, plus selection alternatives.
Chained loops per CLAUDE.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.ops.cells import candidate_columns
from lammps_user_conp2_tpu.ops.neighbors import make_neighbor_config
from lammps_user_conp2_tpu.ops.pairs import make_pair_tables, min_image


def chain_ms(fn, x0, iters=20, trials=3):
    run = jax.jit(lambda s: jax.lax.fori_loop(0, iters, lambda i, t: fn(t), s))
    s = jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = jax.block_until_ready(run(s))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    n_elyte = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    nele_side = int(sys.argv[2]) if len(sys.argv) > 2 else 23
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=nele_side, lz=240.0, lxy=120.0)
    ncfg = make_neighbor_config(system.box, tuple(system.box_lo), md.cutoff,
                                system.natoms, periodic=system.periodic,
                                skin=md.neighbor_skin, x0=system.x0)
    grid = ncfg.grid
    k = ncfg.k_max
    n = system.natoms
    dtype = jnp.float32
    x = jnp.asarray(system.x0, dtype)
    type_idx = jnp.asarray(system.type)
    tables = make_pair_tables(system.lj_eps, system.lj_sigma, system.type,
                              dtype)
    eps = jnp.asarray(1e-30, dtype)
    print(f"n={n} K={k} cells={grid.ncells} cap={grid.cap} "
          f"m={27 * grid.cap}", flush=True)

    def rec(name, v):
        print(f"{name:26s}: {v:8.3f} ms", flush=True)

    def stage(xx, upto):
        table, cols, overflow = candidate_columns(grid, xx)
        c, cap = table.shape
        m = cols.shape[1]
        sentinel = jnp.asarray([[1e6, 1e6, 1e6]], dtype)
        xp = jnp.concatenate([xx, sentinel], axis=0)
        d = xp[table][:, :, None, :] - xp[cols][:, None, :, :]
        d = min_image(d, jnp.asarray(grid.box, dtype), grid.periodic)
        rsq = jnp.sum(d * d, axis=-1)
        valid = (table[:, :, None] != cols[:, None, :]) \
            & (table[:, :, None] < n) & (cols[:, None, :] < n)
        inr = valid & (rsq < grid.cutoff ** 2)
        if upto == 1:
            return jnp.sum(jnp.where(inr, rsq, 0.0))
        rsq_m = jnp.where(inr, rsq, jnp.inf).reshape(c * cap, m)
        _, sel = jax.lax.top_k(-rsq_m, k)
        if upto == 2:
            return jnp.sum(sel.astype(dtype))
        sel3 = sel.reshape(c, cap, k)
        nbr_slots = jnp.take_along_axis(
            jnp.broadcast_to(cols[:, None, :], (c, cap, m)), sel3, axis=2)
        hit = jnp.take_along_axis(inr, sel3, axis=2)
        nbr_slots = jnp.where(hit, nbr_slots, n)
        if upto == 3:
            return jnp.sum(nbr_slots.astype(dtype))
        idx = jnp.full((n + 1, k), n, jnp.int32).at[table.reshape(-1)].set(
            nbr_slots.reshape(c * cap, k))[:n]
        if upto == 4:
            return jnp.sum(idx.astype(dtype))
        tp = jnp.pad(type_idx, (0, 1))
        ti = type_idx[:, None]
        tj = tp[idx]
        lj = jnp.stack([tables.lj1[ti, tj], tables.lj2[ti, tj],
                        tables.lj3[ti, tj], tables.lj4[ti, tj]]).astype(dtype)
        return jnp.sum(idx.astype(dtype)) + jnp.sum(lj)

    for upto, name in ((1, "1 cand+rsq"), (2, "2 +top_k"),
                       (3, "3 +take_along"), (4, "4 +atom_scatter"),
                       (5, "5 +lj_pregather (full)")):
        rec(name, chain_ms(lambda xx, u=upto: xx + eps * stage(xx, u), x))

    # alternative selection: ONE int32 sort, values are the cols themselves
    def sortsel(xx, with_rest):
        table, cols, overflow = candidate_columns(grid, xx)
        c, cap = table.shape
        m = cols.shape[1]
        sentinel = jnp.asarray([[1e6, 1e6, 1e6]], dtype)
        xp = jnp.concatenate([xx, sentinel], axis=0)
        d = xp[table][:, :, None, :] - xp[cols][:, None, :, :]
        d = min_image(d, jnp.asarray(grid.box, dtype), grid.periodic)
        rsq = jnp.sum(d * d, axis=-1)
        valid = (table[:, :, None] != cols[:, None, :]) \
            & (table[:, :, None] < n) & (cols[:, None, :] < n)
        inr = valid & (rsq < grid.cutoff ** 2)
        key = jnp.where(inr, cols[:, None, :], jnp.int32(n + 1))
        skey = jax.lax.sort(key.reshape(c * cap, m), dimension=1)[:, :k]
        nbr_slots = jnp.where(skey <= n, skey, n)
        if not with_rest:
            return jnp.sum(nbr_slots.astype(dtype))
        idx = jnp.full((n + 1, k), n, jnp.int32).at[table.reshape(-1)].set(
            nbr_slots.reshape(c * cap, k))[:n]
        tp = jnp.pad(type_idx, (0, 1))
        ti = type_idx[:, None]
        tj = tp[idx]
        lj = jnp.stack([tables.lj1[ti, tj], tables.lj2[ti, tj],
                        tables.lj3[ti, tj], tables.lj4[ti, tj]]).astype(dtype)
        return jnp.sum(idx.astype(dtype)) + jnp.sum(lj)

    rec("alt sort-sel only", chain_ms(lambda xx: xx + eps * sortsel(xx, False), x))
    rec("alt sort-sel full", chain_ms(lambda xx: xx + eps * sortsel(xx, True), x))


if __name__ == "__main__":
    main()
