"""Pallas TPU kernel for the tiled PPPM charge spread (patch build).

The XLA tile scan (ops/pppm.py spread_tiled / _spread_rhok_tiled ``one``)
builds three one-hot B-spline weight mats per tile and one MXU matmul; the
weight expansions round-trip HBM between scan steps exactly like the force
gather did (ops/pallas/pppm_gather.py fixed that side: 13.2 -> 4.3 ms).
This kernel fuses the whole per-tile patch build in VMEM:

  per tile t (one grid step):
    load slot rows (8, cap): lx, ly, lz, dxx, dxy, dxz, q
    build one-hot B-spline weight mats wx (ex, cap), wy (ey, cap),
      wz (ez, cap) on the VPU (static LAMMPS compute_rho_coeff table)
    patch (ex*ey, ez) = (wx ⊗ wy) (exy, cap) @ (q * wz)^T (cap, ez) — MXU
    write the patch block

The only HBM traffic per tile is 10 KB of slot data and the ~100 KB patch
block; the downstream overlap-add / z-DFT stays in XLA (ops/pppm.py).

Reference parity: LAMMPS ``make_rho`` (pppm.cpp compute_rho1d + the
charge assignment loop) — same stencil algebra as ops/pppm.py
spread_tiled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pppm_gather import _onehot_weights


def _kernel(sl_ref, out_ref, *, cf, ex, ey, ez, cap):
    dtype = sl_ref.dtype.type
    sl = sl_ref[0]                             # (8, cap)
    lx, ly, lz = sl[0:1, :], sl[1:2, :], sl[2:3, :]
    dxx, dxy, dxz = sl[3:4, :], sl[4:5, :], sl[5:6, :]
    q = sl[6:7, :]

    wx = _onehot_weights(lx, dxx, cf, ex, cap, False, dtype)
    wy = _onehot_weights(ly, dxy, cf, ey, cap, False, dtype)
    wz = _onehot_weights(lz, dxz, cf, ez, cap, False, dtype)
    wxy = (wx.reshape(ex, 1, cap) * wy.reshape(1, ey, cap)).reshape(
        ex * ey, cap)
    qwz = wz * q                               # (ez, cap)
    # precision=HIGHEST: Mosaic otherwise emits one-pass bf16 dots (same
    # trap as the gather kernel / CLAUDE.md's matmul note)
    dn = (((1,), (1,)), ((), ()))
    out_ref[0] = jax.lax.dot_general(
        wxy, qwz, dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def spread_tiles_pallas(sl, cf, *, ex, ey, ez, cap, interpret=False):
    """Per-tile (ex*ey, ez) charge patches from slotted atom data.

    sl: (T, 8, cap) float32 slot rows [lx, ly, lz, dxx, dxy, dxz, q, 0]
    returns (T, ex*ey, ez); caller overlap-adds (ops/pppm.py _overlap_add)
    or contracts the z-binned rows with the shifted z-DFT.
    """
    t_tiles = sl.shape[0]
    kern = functools.partial(_kernel, cf=cf, ex=ex, ey=ey, ez=ez, cap=cap)
    return pl.pallas_call(
        kern,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, cap), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ex * ey, ez), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_tiles, ex * ey, ez), sl.dtype),
        cost_estimate=pl.CostEstimate(
            flops=t_tiles * 2 * ex * ey * ez * cap,
            bytes_accessed=sl.size * 4 + t_tiles * ex * ey * ez * 4,
            transcendentals=0),
        interpret=interpret,
    )(sl)
