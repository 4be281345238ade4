#!/usr/bin/env python
"""Phase isolation inside gather3_ad_tiled at the 100k production geometry.

After the z-first matmul restructure the gather still costs ~15 ms against
a ~1 ms MXU budget — this times each piece of the tile loop separately:

  weights   : the six per-axis one-hot weight builds + a trivial reduce
  slice+mm  : patch dynamic_slice + the (2cap, ez) @ (ez, exy) matmul
  xycombine : the three batched einsum matvecs + axis dots
  scatter   : the final (t_tiles*cap, 3) permutation scatter
  full      : gather3_ad (everything)

Usage: python tools/exp_gather3b.py [--cpu]
"""
import dataclasses
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

HI = jax.lax.Precision.HIGHEST


def chain_ms(fn, x0, iters=50, trials=3):
    eps = jnp.asarray(1e-30, jnp.float32)
    run = jax.jit(lambda s: jax.lax.fori_loop(
        0, iters, lambda i, t: t + eps * fn(t), s))
    s = jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = jax.block_until_ready(run(s))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    system, md, cfg = workloads.synthetic(
        n_elyte=98304, nele_side=23, lz=240.0, lxy=120.0)
    u = system.units()
    q2 = float((system.q0 ** 2).sum()) * u.qqr2e
    grid = P.setup_pppm(
        box=system.box, box_lo=tuple(system.box_lo),
        accuracy_abs=md.kspace_accuracy * u.qqr2e, natoms=system.natoms,
        q2=max(q2, 1e-10), cutoff=md.cutoff, slabflag=md.slab is not None,
        slab_volfactor=md.slab or 1.0)
    grid = P.with_tile_cap(grid, system.x0)
    n = system.natoms
    x = jnp.asarray(system.x0, jnp.float32)
    q = jnp.asarray(system.q0, jnp.float32)
    geom = P._tile_geometry(grid, n)
    p, hw, tlx, tly, tlz, ntx, nty, ntz, t_tiles, cap, z_span, dm = geom
    bw = hw + dm
    ex, ey, ez = tlx + 2 * bw, tly + 2 * bw, tlz + 2 * bw
    print(f"geom: tiles={t_tiles} cap={cap} ex,ey,ez={ex},{ey},{ez}")

    slots = jax.jit(lambda xx: P.tile_slots(grid, xx, q))(x)
    rho = jax.jit(lambda xx: P.spread(grid, xx, q, slots=slots))(x)
    umesh = jax.jit(lambda r: P.poisson_u(grid, r))(rho)
    cf = jnp.asarray(grid.coeffs, jnp.float32)
    lxs, lys, lzs, dxs = slots.lxs, slots.lys, slots.lzs, slots.dxs
    up = P._pad_brick(umesh, geom, grid.nz)

    def scan_tiles(one, reduce_scatter=False):
        xs = tuple(a.reshape((ntx, nty * ntz) + a.shape[1:])
                   for a in (jnp.arange(t_tiles, dtype=jnp.int32),
                             lxs, lys, lzs, dxs))
        _, vals = jax.lax.scan(
            lambda _, args: (None, jax.vmap(one)(*args)), None, xs)
        if reduce_scatter:
            out = jnp.zeros((n + 1, 3), jnp.float32).at[
                slots.table.reshape(-1)].add(vals.reshape(-1, 3))
            return jnp.sum(out)
        return jnp.sum(vals)

    def f_full(xx):
        return xx + 0 * jnp.sum(P.gather3_ad(grid, umesh, xx, slots=slots))

    def one_weights(t, lxl, lyl, lzl, dxl):
        wxl = P._axis_onehot(lxl, P._horner_w(dxl[:, 0], cf), e=ex)
        wyl = P._axis_onehot(lyl, P._horner_w(dxl[:, 1], cf), e=ey)
        wzd = P._axis_onehot(lzl, P._horner_w(dxl[:, 2], cf), e=ez)
        dwxl = P._axis_onehot(lxl, P._horner_dw(dxl[:, 0], cf), e=ex)
        dwyl = P._axis_onehot(lyl, P._horner_dw(dxl[:, 1], cf), e=ey)
        dwzd = P._axis_onehot(lzl, P._horner_dw(dxl[:, 2], cf), e=ez)
        return (jnp.sum(wxl, 1) + jnp.sum(wyl, 1) + jnp.sum(dwxl, 1)
                + jnp.sum(dwyl, 1))[:, None] + jnp.sum(wzd + dwzd, 1)[:, None]

    def one_slicemm(t, lxl, lyl, lzl, dxl):
        txi = t // (nty * ntz)
        tyi = (t // ntz) % nty
        tzi = t % ntz
        wzd = P._axis_onehot(lzl, P._horner_w(dxl[:, 2], cf), e=ez)
        dwzd = P._axis_onehot(lzl, P._horner_dw(dxl[:, 2], cf), e=ez)
        patch = jax.lax.dynamic_slice(
            up, (txi * tlx, tyi * tly, tzi * tlz), (ex, ey, ez))
        wz2 = jnp.concatenate([wzd, dwzd], axis=0)
        t1 = jnp.matmul(wz2, patch.reshape(ex * ey, ez).T, precision=HI)
        return jnp.sum(t1, 1)[:cap, None]

    wy_c = jnp.ones((cap, ey), jnp.float32)
    wx_c = jnp.ones((cap, ex), jnp.float32)
    tw_c = jnp.ones((cap, ex, ey), jnp.float32)

    def one_xycomb(t, lxl, lyl, lzl, dxl):
        # tie operands to the scanned args so XLA cannot hoist the work
        # out of the loop as a constant
        tw = tw_c * dxl[0, 0]
        wy = wy_c * dxl[0, 1]
        s1 = jnp.einsum("cxy,cy->cx", tw, wy, precision=HI)
        s2 = jnp.einsum("cxy,cy->cx", tw, wy * 2.0, precision=HI)
        s3 = jnp.einsum("cxy,cy->cx", tw * 2.0, wy, precision=HI)
        return jnp.stack([jnp.sum(wx_c * s1, 1), jnp.sum(wx_c * s2, 1),
                          jnp.sum(wx_c * s3, 1)], axis=1)

    def one_vals(t, lxl, lyl, lzl, dxl):
        return jnp.ones((cap, 3), jnp.float32) * dxl[:cap, :3]

    for name, fn in (
        ("full", f_full),
        ("weights", lambda xx: xx + 0 * scan_tiles(one_weights)),
        ("slice+mm", lambda xx: xx + 0 * scan_tiles(one_slicemm)),
        ("xycombine", lambda xx: xx + 0 * scan_tiles(one_xycomb)),
        ("scatter", lambda xx: xx + 0 * scan_tiles(one_vals,
                                                   reduce_scatter=True)),
    ):
        print(f"{name:10s}: {chain_ms(fn, x):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
