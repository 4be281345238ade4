#!/usr/bin/env python
"""Stage decomposition of the CURRENT neighbor-list builder at 100k, plus
an il_twolayer pair-kernel tile-size sweep.  Chained loops (CLAUDE.md)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.system import exclusion_lists
from lammps_user_conp2_tpu.ops import neighbors as NB
from lammps_user_conp2_tpu.ops.cells import bin_atoms
from lammps_user_conp2_tpu.ops.pairs import make_pair_tables


def chain_ms(fn, x0, iters=20, trials=3):
    run = jax.jit(lambda s: jax.lax.fori_loop(0, iters, lambda i, t: fn(t), s))
    s = jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = jax.block_until_ready(run(s))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def bench_rebuild():
    system, md, cfg = workloads.synthetic(
        n_elyte=98304, nele_side=23, lz=240.0, lxy=120.0)
    ncfg = NB.make_neighbor_config(system.box, tuple(system.box_lo),
                                   md.cutoff, system.natoms,
                                   periodic=system.periodic, x0=system.x0)
    grid = ncfg.grid
    n = system.natoms
    dtype = jnp.float32
    x = jnp.asarray(system.x0, dtype)
    ti = jnp.asarray(system.type)
    tables = make_pair_tables(system.lj_eps, system.lj_sigma, system.type,
                              dtype)
    eps = jnp.asarray(1e-30, dtype)
    print(f"n={n} K={ncfg.k_max} cells={grid.ncells} cap={grid.cap} "
          f"m={27 * grid.cap}", flush=True)

    def s_bin(xx):
        table, _cell, ovf = bin_atoms(grid, xx)
        return jnp.sum(table.astype(dtype))

    def s_prep(xx):
        table, _cell, ovf = bin_atoms(grid, xx)
        prep = NB._nlist_prep(ncfg, xx, table, ti)
        return jnp.sum(prep[2])

    def s_keys(xx, sort=True):
        table, _cell, ovf = bin_atoms(grid, xx)
        prep = NB._nlist_prep(ncfg, xx, table, ti)
        c = table.shape[0]
        if sort:
            skey, o2 = NB._cell_block_keys(ncfg, xx, prep, 0, c)
            return jnp.sum(skey.astype(dtype))
        # the sweep without the sort: reproduce _cell_block_keys up to `key`
        import lammps_user_conp2_tpu.ops.neighbors as nbm
        grid_ = ncfg.grid
        k = ncfg.k_max
        table_, ptab, xi, nb, uniq = prep
        cap = table_.shape[1]
        pcols = ptab[nb]
        pcols = jnp.where(uniq[:, :, None], pcols, jnp.int32(n << 5))
        m = 27 * cap
        pcols = pcols.reshape(c, m)
        cols = pcols >> 5
        xj = xi[nb].reshape(c, m, 3)
        from lammps_user_conp2_tpu.ops.pairs import min_image
        dd = xi[:, :, None, :] - xj[:, None, :, :]
        dd = min_image(dd, jnp.asarray(grid_.box, dtype), grid_.periodic)
        rsq = jnp.sum(dd * dd, axis=-1)
        valid = (table_[:, :, None] != cols[:, None, :]) \
            & (table_[:, :, None] < n) & (cols[:, None, :] < n)
        inr = valid & (rsq < grid_.cutoff ** 2)
        key = jnp.where(inr, pcols[:, None, :], jnp.int32((n + 1) << 5))
        return jnp.sum(key.astype(dtype))

    def s_full(xx):
        nb = NB.build_neighbor_list(ncfg, xx, tables, ti)
        return jnp.sum(nb.idx.astype(dtype))

    print(f"bin_atoms              : {chain_ms(lambda xx: xx + eps * s_bin(xx), x):8.2f} ms", flush=True)
    print(f"+prep (slab gathers)   : {chain_ms(lambda xx: xx + eps * s_prep(xx), x):8.2f} ms", flush=True)
    print(f"+sweep (rsq, no sort)  : {chain_ms(lambda xx: xx + eps * s_keys(xx, False), x):8.2f} ms", flush=True)
    print(f"+sort (keys)           : {chain_ms(lambda xx: xx + eps * s_keys(xx, True), x):8.2f} ms", flush=True)
    print(f"full build             : {chain_ms(lambda xx: xx + eps * s_full(xx), x):8.2f} ms", flush=True)


def bench_il_tiles():
    from lammps_user_conp2_tpu.ops.pallas.pair_kernel import pair_forces_pallas
    system, md, cfg = workloads.il_twolayer(0)
    u = system.units()
    x = jnp.asarray(system.x0, jnp.float32)
    q = jnp.asarray(system.q0, jnp.float32)
    ti = jnp.asarray(system.type)
    tables = make_pair_tables(system.lj_eps, system.lj_sigma, system.type,
                              jnp.float32)
    excl = tuple(jnp.asarray(a) for a in exclusion_lists(system))
    eps = jnp.asarray(1e-30, jnp.float32)
    for tr in (128, 192, 256):
        kw = dict(box=system.box, periodic=system.periodic, cutoff=md.cutoff,
                  g_ewald=0.35, qqr2e=u.qqr2e, tr=tr, tc=tr)

        def f(xx):
            ff, ev, ec = pair_forces_pallas(xx, q, ti, tables, excl, **kw)
            return xx + eps * ff
        print(f"il pair tr={tr:3d}        : "
              f"{chain_ms(f, x, iters=200):8.3f} ms", flush=True)




def bench_full_only():
    system, md, cfg = workloads.synthetic(
        n_elyte=98304, nele_side=23, lz=240.0, lxy=120.0)
    ncfg = NB.make_neighbor_config(system.box, tuple(system.box_lo),
                                   md.cutoff, system.natoms,
                                   periodic=system.periodic, x0=system.x0)
    n = system.natoms
    dtype = jnp.float32
    x = jnp.asarray(system.x0, dtype)
    ti = jnp.asarray(system.type)
    tables = make_pair_tables(system.lj_eps, system.lj_sigma, system.type,
                              dtype)
    eps = jnp.asarray(1e-30, dtype)

    def s_full(xx):
        nb = NB.build_neighbor_list(ncfg, xx, tables, ti)
        return jnp.sum(nb.idx.astype(dtype))
    print(f"full build (atom-major): "
          f"{chain_ms(lambda xx: xx + eps * s_full(xx), x):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    if "il" in sys.argv:
        bench_il_tiles()
    elif "full" in sys.argv:
        bench_full_only()
    else:
        bench_rebuild()
