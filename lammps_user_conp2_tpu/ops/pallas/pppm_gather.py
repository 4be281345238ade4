"""Pallas TPU kernel for the tiled PPPM ad force gather.

The XLA tile scan (ops/pppm.py gather3_ad_zbin) is fusion-overhead-bound,
not flop-bound: at the 100k production geometry its ~4 Gflop measure
9.7 ms — the six per-slot one-hot weight expansions, the z matmul and the
three xy combines each round-trip HBM between scan steps
(tools/exp_patch_gather.py: removing the patch reads entirely still
leaves 8.95 ms).  This kernel fuses the whole per-tile chain in VMEM:

  per tile t (one grid step):
    load patch (ez, exy)  [pre-built im2col block, shared by all slots]
    load slot rows (8, cap): lx, ly, lz, dxx, dxy, dxz
    build one-hot B-spline weight/derivative mats (e, cap) on the VPU
      (coefficients are STATIC python floats — LAMMPS compute_rho_coeff)
    t1w = patch^T (exy, ez) @ wz (ez, cap)   — MXU
    t1d = patch^T (exy, ez) @ dwz (ez, cap)  — MXU
    gx = sum_xy dwx⊗wy * t1w ;  gy = sum_xy wx⊗dwy * t1w
    gz = sum_xy wx⊗wy * t1d                  — VPU multiply-reduce
    write (8, cap) rows 0..2 = gx, gy, gz

Everything keeps ``cap`` on the 128-lane axis; the only HBM traffic per
tile is the 74 KB patch block, 10 KB of slot data and the 10 KB output.

Reference parity: this is LAMMPS ``fieldforce_ad`` (kspace_modify diff ad)
— the same stencil algebra as ops/pppm.py gather3_ad_zbin, reference
pppm.cpp compute_rho1d/compute_drho1d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot_weights(l_row, d_row, cf, e, cap, deriv, dtype):
    """(e, cap) one-hot-placed B-spline weights from the slot center index
    row ``l_row`` (1, cap) and fraction row ``d_row`` (1, cap).  ``cf`` is
    the static (p, p) numpy coefficient table; the polynomial is evaluated
    with the same Horner ordering as ops/pppm.py _horner_w/_horner_dw so
    the weights are bit-identical to the XLA path."""
    p = cf.shape[0]
    ie = jax.lax.broadcasted_iota(jnp.int32, (e, cap), 0)
    li = l_row.astype(jnp.int32)
    acc = jnp.zeros((e, cap), dtype)
    for a in range(p):
        if deriv:
            w = jnp.zeros((1, cap), dtype)
            for lp in range(p - 1, 0, -1):
                w = w * d_row + dtype(lp * cf[a, lp])
        else:
            w = jnp.zeros((1, cap), dtype)
            for lp in range(p - 1, -1, -1):
                w = w * d_row + dtype(cf[a, lp])
        acc = acc + jnp.where(ie == li + a, w, dtype(0.0))
    return acc


def _kernel(patch_ref, sl_ref, out_ref, *, cf, ex, ey, ez, cap):
    dtype = patch_ref.dtype.type
    patch = patch_ref[0]                       # (ez, exy)
    sl = sl_ref[0]                             # (8, cap)
    lx, ly, lz = sl[0:1, :], sl[1:2, :], sl[2:3, :]
    dxx, dxy, dxz = sl[3:4, :], sl[4:5, :], sl[5:6, :]

    wx = _onehot_weights(lx, dxx, cf, ex, cap, False, dtype)
    dwx = _onehot_weights(lx, dxx, cf, ex, cap, True, dtype)
    wy = _onehot_weights(ly, dxy, cf, ey, cap, False, dtype)
    dwy = _onehot_weights(ly, dxy, cf, ey, cap, True, dtype)
    wz = _onehot_weights(lz, dxz, cf, ez, cap, False, dtype)
    dwz = _onehot_weights(lz, dxz, cf, ez, cap, True, dtype)

    # precision=HIGHEST: Mosaic otherwise lowers the f32 dot as ONE-PASS
    # bf16 (measured 9.5e-3 relative force error at the 100k geometry —
    # the same trap as CLAUDE.md's XLA matmul note)
    dn = (((0,), (0,)), ((), ()))
    t1w = jax.lax.dot_general(patch, wz, dimension_numbers=dn,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
    t1d = jax.lax.dot_general(patch, dwz, dimension_numbers=dn,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
    # (exy, cap) weight outer products via 3-D broadcast (x outer, y sublane)
    wx3 = wx.reshape(ex, 1, cap)
    dwx3 = dwx.reshape(ex, 1, cap)
    wy3 = wy.reshape(1, ey, cap)
    dwy3 = dwy.reshape(1, ey, cap)
    t1w3 = t1w.reshape(ex, ey, cap)
    t1d3 = t1d.reshape(ex, ey, cap)
    gx = jnp.sum((dwx3 * wy3) * t1w3, axis=(0, 1))[None, :]
    gy = jnp.sum((wx3 * dwy3) * t1w3, axis=(0, 1))[None, :]
    gz = jnp.sum((wx3 * wy3) * t1d3, axis=(0, 1))[None, :]
    zero = jnp.zeros((5, cap), patch.dtype)
    out_ref[0] = jnp.concatenate([gx, gy, gz, zero], axis=0)


def gather3_tiles_pallas(patches, sl, cf, *, ex, ey, ez, cap,
                         interpret=False):
    """Per-slot (gx, gy, gz) for every tile.

    patches: (T, ez, ex*ey) im2col mesh blocks
    sl:      (T, 8, cap) float32 slot rows [lx, ly, lz, dxx, dxy, dxz, 0, 0]
    returns  (T, 8, cap) with rows 0..2 = gx, gy, gz
    """
    t_tiles = patches.shape[0]
    kern = functools.partial(_kernel, cf=cf, ex=ex, ey=ey, ez=ez, cap=cap)
    flops = t_tiles * (2 * 2 * ex * ey * ez * cap + 9 * ex * ey * cap)
    return pl.pallas_call(
        kern,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, ez, ex * ey), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cap), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, cap), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_tiles, 8, cap), patches.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=patches.size * 4 + sl.size * 4
            + t_tiles * 8 * cap * 4,
            transcendentals=0),
        interpret=interpret,
    )(patches, sl)
