#!/usr/bin/env python
"""Micro-phases of tiled PPPM spread/gather at 100k atoms on the real TPU:
slot binning, weight-matrix+matmul patch build, overlap-add, halo pad,
patch extraction.  Chained loops per CLAUDE.md."""
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
from lammps_user_conp2_tpu.ops import pppm as P


def chain_ms(fn, x0, iters=50, trials=3):
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
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=23, lz=240.0, lxy=120.0)
    u = system.units()
    q2 = float((system.q0 ** 2).sum()) * u.qqr2e
    grid = P.setup_pppm(
        box=system.box, box_lo=tuple(system.box_lo),
        accuracy_abs=md.kspace_accuracy * u.qqr2e, natoms=system.natoms,
        q2=q2, cutoff=md.cutoff, slabflag=True, slab_volfactor=3.0)
    geom = P._tile_geometry(grid, system.natoms)
    print(f"grid={grid.shape} geom={geom}", flush=True)
    p, hw, tlx, tly, tlz, ntx, nty, ntz, t_tiles, cap, z_span, dm = geom
    ex, ey, ez = tlx + 2 * hw, tly + 2 * hw, tlz + 2 * hw
    x = jnp.asarray(system.x0, jnp.float32)
    q = jnp.asarray(system.q0, jnp.float32) + 0.01
    eps = jnp.asarray(1e-30, jnp.float32)
    dtype = jnp.float32

    # 1. slot binning
    cf = jnp.asarray(grid.coeffs, dtype)
    def f_slots(xx):
        s = P.tile_slots(grid, xx, q)
        return xx + eps * (jnp.sum(s.qs) + jnp.sum(s.dxs))
    print(f"tile_slots            : {chain_ms(f_slots, x):7.2f} ms",
          flush=True)

    s0 = jax.jit(lambda xx: P.tile_slots(grid, xx, q))(x)
    qs, lxs, lys, lzs, dxs = s0.qs, s0.lxs, s0.lys, s0.lzs, s0.dxs

    # 2. weight mats + patch matmuls (spread core, no overlap-add)
    def f_patches(qq):
        def one(ql, lxl, lyl, lzl, dxl):
            wxy, wzd = P._local_weight_mats(
                lxl, lyl, lzl, dxl, cf, ex=ex, ey=ey, ez=ez, dtype=dtype)
            return jnp.matmul(wxy.T, ql[:, None] * wzd,
                              precision=jax.lax.Precision.HIGHEST)
        xs = tuple(a.reshape((ntx, nty * ntz) + a.shape[1:])
                   for a in (qq, lxs, lys, lzs, dxs))
        _, patches = jax.lax.scan(
            lambda _, args: (None, jax.vmap(one)(*args)), None, xs)
        return qq + eps * jnp.sum(patches)
    print(f"spread patches (scan) : {chain_ms(f_patches, qs):7.2f} ms",
          flush=True)

    # 3. overlap-add alone
    patches0 = jnp.ones((t_tiles, ex * ey, ez), dtype)
    def f_oadd(pp):
        rho = P._overlap_add(pp, geom, grid.nz)
        return pp + eps * rho[0, 0, 0]
    print(f"overlap_add           : {chain_ms(f_oadd, patches0):7.2f} ms",
          flush=True)

    # 4. halo pad (gather) alone
    brick = jnp.ones(grid.shape, dtype)
    if z_span:
        zr = max(0, (ntz - 1) * tlz + ez - (grid.nz + tlz + hw))
        zpad = (tlz + hw, zr)
    else:
        zpad = (hw, hw)
    def f_pad(b):
        bp = jnp.stack([jnp.pad(bb, ((hw, hw), (hw, hw), zpad), mode="wrap")
                        for bb in (b, b * 2, b * 3)])
        return b + eps * bp[0, 0, 0, 0]
    print(f"halo pad (3 bricks)   : {chain_ms(f_pad, brick):7.2f} ms",
          flush=True)

    # 5. full gather3 for reference
    def f_g3(xx):
        g = P.gather_tiled(grid, [brick, brick * 2, brick * 3], xx)
        return xx + eps * g[0][:, None]
    print(f"gather_tiled (3)      : {chain_ms(f_g3, x):7.2f} ms", flush=True)

    # 5b. ad gather (one mesh, derivative weights)
    def f_gad(xx):
        g = P.gather3_ad_tiled(grid, brick, xx)
        return xx + eps * g
    print(f"gather3_ad_tiled      : {chain_ms(f_gad, x):7.2f} ms", flush=True)

    # 6. full spread for reference
    def f_spread(xx):
        rho = P.spread_tiled(grid, xx, q)
        return xx + eps * rho[0, 0, 0]
    print(f"spread_tiled          : {chain_ms(f_spread, x):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
