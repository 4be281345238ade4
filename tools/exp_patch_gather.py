#!/usr/bin/env python
"""Decompose the tiled PPPM phases at the 100k production geometry.

Hypothesis: gather3_ad_zbin's 11.6 ms is NOT flop-bound (~4 Gflop of f32
matmul on a v5e should be <1 ms) — the vmapped per-tile `dynamic_slice`
of the potential patch lowers to a gather HLO, and TPU gathers run at
descriptor rate.  Because the scan index IS the x-tile row, the patches
of one scan step can instead be built densely: one dynamic_slice for the
whole x-row plus nty static overlapping y-window slices (im2col) — zero
gather HLOs.

Variants (chained 50-iter loops, min of 3 — tools/timing.py):
  G0  gather3_ad_zbin baseline
  G1  row-sliced patches (dense im2col), same contraction
  G2  weights-only (constant patch, no slicing)   — bounds the onehot cost
  S0  _spread_rhok_tiled baseline
  S1  patch-build scan only (sum of patches)
  S2  merge+zdft+fft only (precomputed patches)
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
from lammps_user_conp2_tpu.ops import pppm as P
from timing import chain_ms


def gather3_zbin_rows(grid, uz, x, slots, geom):
    """gather3_ad_zbin with dense row-sliced patch extraction."""
    n = x.shape[0]
    dtype = x.dtype
    lxs, lys, lzs, dxs = slots.lxs, slots.lys, slots.lzs, slots.dxs
    overflow = slots.overflow
    p, hw, tlx, tly, tlz, ntx, nty, ntz, t_tiles, cap, z_span, dm = geom
    bw = hw + dm
    ex, ey, ez = tlx + 2 * bw, tly + 2 * bw, tlz + 2 * bw
    cf = jnp.asarray(grid.coeffs, dtype)
    up = jnp.pad(uz.astype(dtype), ((bw, bw), (bw, bw), (0, 0), (0, 0)),
                 mode="wrap")
    hi = jax.lax.Precision.HIGHEST

    def one(patch, lxl, lyl, lzl, dxl):
        wxl = P._axis_onehot(lxl, P._horner_w(dxl[:, 0], cf), e=ex)
        wyl = P._axis_onehot(lyl, P._horner_w(dxl[:, 1], cf), e=ey)
        wzd = P._axis_onehot(lzl, P._horner_w(dxl[:, 2], cf), e=ez)
        dwxl = P._axis_onehot(lxl, P._horner_dw(dxl[:, 0], cf), e=ex)
        dwyl = P._axis_onehot(lyl, P._horner_dw(dxl[:, 1], cf), e=ey)
        dwzd = P._axis_onehot(lzl, P._horner_dw(dxl[:, 2], cf), e=ez)
        wz2 = jnp.concatenate([wzd, dwzd], axis=0)
        t1 = jnp.matmul(wz2, patch.reshape(ex * ey, ez).T, precision=hi)
        tw = t1[:cap].reshape(cap, ex, ey)
        tdw = t1[cap:].reshape(cap, ex, ey)
        s1 = jnp.einsum("cxy,cy->cx", tw, wyl, precision=hi)
        s2 = jnp.einsum("cxy,cy->cx", tw, dwyl, precision=hi)
        s3 = jnp.einsum("cxy,cy->cx", tdw, wyl, precision=hi)
        gx = jnp.sum(dwxl * s1, axis=1)
        gy = jnp.sum(wxl * s2, axis=1)
        gz = jnp.sum(wxl * s3, axis=1)
        return jnp.stack([gx, gy, gz], axis=1)

    def row(txi, lxl, lyl, lzl, dxl):
        blk = jax.lax.dynamic_slice(
            up, (txi * tlx, jnp.zeros((), txi.dtype),
                 jnp.zeros((), txi.dtype), jnp.zeros((), txi.dtype)),
            (ex, up.shape[1], ntz, ez))
        wins = jnp.stack([jax.lax.slice_in_dim(blk, k * tly, k * tly + ey,
                                               axis=1)
                          for k in range(nty)])      # (nty, ex, ey, ntz, ez)
        patches = wins.transpose(0, 3, 1, 2, 4).reshape(
            nty * ntz, ex, ey, ez)
        return jax.vmap(one)(patches, lxl, lyl, lzl, dxl)

    xs = tuple(a.reshape((ntx, nty * ntz) + a.shape[1:])
               for a in (lxs, lys, lzs, dxs))
    _, vals = jax.lax.scan(
        lambda _, args: (None, row(args[0], *args[1:])), None,
        (jnp.arange(ntx, dtype=jnp.int32),) + xs)
    out = vals.reshape(t_tiles * cap, 3)[slots.slot]
    e = out * jnp.asarray(P._delinv(grid), dtype)[None, :]
    return jnp.where(overflow, jnp.nan, e)


def gather3_zbin_wonly(grid, uz, x, slots, geom):
    """Weights-only variant: one fixed patch broadcast to every tile."""
    n = x.shape[0]
    dtype = x.dtype
    lxs, lys, lzs, dxs = slots.lxs, slots.lys, slots.lzs, slots.dxs
    p, hw, tlx, tly, tlz, ntx, nty, ntz, t_tiles, cap, z_span, dm = geom
    bw = hw + dm
    ex, ey, ez = tlx + 2 * bw, tly + 2 * bw, tlz + 2 * bw
    cf = jnp.asarray(grid.coeffs, dtype)
    patch0 = uz[:ex, :ey, 0, :]        # (ex, ey, ez) fixed
    hi = jax.lax.Precision.HIGHEST

    def one(lxl, lyl, lzl, dxl):
        wxl = P._axis_onehot(lxl, P._horner_w(dxl[:, 0], cf), e=ex)
        wyl = P._axis_onehot(lyl, P._horner_w(dxl[:, 1], cf), e=ey)
        wzd = P._axis_onehot(lzl, P._horner_w(dxl[:, 2], cf), e=ez)
        dwxl = P._axis_onehot(lxl, P._horner_dw(dxl[:, 0], cf), e=ex)
        dwyl = P._axis_onehot(lyl, P._horner_dw(dxl[:, 1], cf), e=ey)
        dwzd = P._axis_onehot(lzl, P._horner_dw(dxl[:, 2], cf), e=ez)
        wz2 = jnp.concatenate([wzd, dwzd], axis=0)
        t1 = jnp.matmul(wz2, patch0.reshape(ex * ey, ez).T, precision=hi)
        tw = t1[:cap].reshape(cap, ex, ey)
        tdw = t1[cap:].reshape(cap, ex, ey)
        s1 = jnp.einsum("cxy,cy->cx", tw, wyl, precision=hi)
        s2 = jnp.einsum("cxy,cy->cx", tw, dwyl, precision=hi)
        s3 = jnp.einsum("cxy,cy->cx", tdw, wyl, precision=hi)
        gx = jnp.sum(dwxl * s1, axis=1)
        gy = jnp.sum(wxl * s2, axis=1)
        gz = jnp.sum(wxl * s3, axis=1)
        return jnp.stack([gx, gy, gz], axis=1)

    xs = tuple(a.reshape((ntx, nty * ntz) + a.shape[1:])
               for a in (lxs, lys, lzs, dxs))
    _, vals = jax.lax.scan(
        lambda _, args: (None, jax.vmap(one)(*args)), None, xs)
    out = vals.reshape(t_tiles * cap, 3)[slots.slot]
    return out * jnp.asarray(P._delinv(grid), dtype)[None, :]


def main():
    n_elyte = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=23, lz=240.0, lxy=120.0)
    u_sys = system.units()
    dtype = jnp.float32
    x = jnp.asarray(system.x0, dtype)
    q = jnp.asarray(system.q0, dtype)
    n = system.natoms
    q2 = float((system.q0 ** 2).sum()) * u_sys.qqr2e
    grid = P.setup_pppm(
        box=system.box, box_lo=tuple(system.box_lo),
        accuracy_abs=md.kspace_accuracy * u_sys.qqr2e, natoms=n,
        q2=q2, cutoff=md.cutoff, slabflag=True, slab_volfactor=3.0)
    grid = P.with_tile_cap(grid, np.asarray(x))
    geom = P._tile_geometry(grid, n)
    print("grid", grid.shape, "geom", geom, flush=True)
    slots = jax.block_until_ready(
        jax.jit(lambda xx, qq: P.tile_slots(grid, xx, qq))(x, q))

    rhok = jax.block_until_ready(jax.jit(
        lambda xx, qq: P.spread_rhok(grid, xx, qq, slots=slots))(x, q))
    ek, uz = jax.block_until_ready(jax.jit(
        lambda rk: P.pppm_energy_u_zbin(grid, rk, n))(rhok))

    ref = jax.block_until_ready(jax.jit(
        lambda xx: P.gather3_ad_zbin(grid, uz, xx, slots=slots))(x))
    scale = float(jnp.max(jnp.abs(ref)))
    eps = jnp.asarray(1e-30, dtype)

    def bench(name, fn, checkref=None):
        v = jax.block_until_ready(jax.jit(fn)(x))
        err = (float(jnp.max(jnp.abs(v - checkref))) / scale
               if checkref is not None else float("nan"))
        ms = chain_ms(lambda xx: xx + eps * fn(xx), x)
        print(f"{name:26s}: {ms:7.2f} ms  rel_err={err:.2e}", flush=True)
        return ms

    bench("G0 zbin baseline",
          lambda xx: P.gather3_ad_zbin(grid, uz, xx, slots=slots,
                                       use_pallas=False), ref)
    bench("G1 row-sliced patches",
          lambda xx: gather3_zbin_rows(grid, uz, xx, slots, geom), ref)
    bench("G2 weights only",
          lambda xx: gather3_zbin_wonly(grid, uz, xx, slots, geom))
    bench("G3 pallas fused kernel",
          lambda xx: P.gather3_ad_zbin(grid, uz, xx, slots=slots,
                                       use_pallas=True), ref)

    # ---- spread decomposition -------------------------------------------
    bench("S0 spread_rhok baseline",
          lambda xx: jnp.abs(P.spread_rhok(grid, xx, q, slots=slots)
                             ).sum() * jnp.ones((n, 3), dtype))

    p_, hw, tlx, tly, tlz, ntx, nty, ntz, t_tiles, cap, z_span, dm = geom
    bw = hw + dm
    ex, ey, ez = tlx + 2 * bw, tly + 2 * bw, tlz + 2 * bw
    cf = jnp.asarray(grid.coeffs, dtype)
    hi = jax.lax.Precision.HIGHEST

    def build_patches(qs):
        def one(ql, lxl, lyl, lzl, dxl):
            wxy, wzd = P._local_weight_mats(lxl, lyl, lzl, dxl, cf,
                                            ex=ex, ey=ey, ez=ez, dtype=dtype)
            return jnp.matmul(wxy.T, ql[:, None] * wzd, precision=hi)
        xs = tuple(a.reshape((ntx, nty * ntz) + a.shape[1:])
                   for a in (qs, slots.lxs, slots.lys, slots.lzs, slots.dxs))
        _, patches = jax.lax.scan(
            lambda _, args: (None, jax.vmap(one)(*args)), None, xs)
        return patches

    def s1(xx):
        patches = build_patches(slots.qs + eps * xx[0, 0])
        return jnp.abs(patches).sum() * jnp.ones((n, 3), dtype)
    bench("S1 patch-build scan only", s1)

    patches0 = jax.block_until_ready(jax.jit(build_patches)(slots.qs))

    def s2(xx):
        pt = (patches0 + eps * xx[0, 0]).reshape(
            ntx, nty, ntz, ex * ey, ez).reshape(ntx, nty, ntz, ex, ey, ez)
        pt = P._merge_axis(pt, 1, 4, tly, bw, periodic=True)
        pt = P._merge_axis(pt, 0, 3, tlx, bw, periodic=True)
        m = pt.transpose(0, 3, 1, 4, 2, 5).reshape(
            ntx * tlx, nty * tly, ntz * ez)
        C, S = P._zbin_dft(grid, geom)
        re = jnp.matmul(m, jnp.asarray(C, dtype), precision=hi)
        im = -jnp.matmul(m, jnp.asarray(S, dtype), precision=hi)
        rk = jnp.fft.fftn(re + 1j * im, axes=(0, 1))
        return jnp.abs(rk).sum() * jnp.ones((n, 3), dtype)
    bench("S2 merge+zdft+fft only", s2)


if __name__ == "__main__":
    main()
