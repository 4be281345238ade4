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


def _piece(sl, cf, *, sx, ex_, sy, ey_, ez, cap, dtype):
    """(ex_*ey_, ez) charge patch restricted to a region of the OUTPUT
    tile: one-hot weights are built against the shifted local coordinates
    (l - s), so only atoms whose stencil reaches the region contribute —
    out-of-range rows produce all-false comparisons (zero weight)."""
    lx, ly, lz = sl[0:1, :], sl[1:2, :], sl[2:3, :]
    dxx, dxy, dxz = sl[3:4, :], sl[4:5, :], sl[5:6, :]
    q = sl[6:7, :]
    wx = _onehot_weights(lx - dtype(sx), dxx, cf, ex_, cap, False, dtype)
    wy = _onehot_weights(ly - dtype(sy), dxy, cf, ey_, cap, False, dtype)
    wz = _onehot_weights(lz, dxz, cf, ez, cap, False, dtype)
    wxy = (wx.reshape(ex_, 1, cap) * wy.reshape(1, ey_, cap)).reshape(
        ex_ * ey_, cap)
    dn = (((1,), (1,)), ((), ()))
    return jax.lax.dot_general(
        wxy, wz * q, dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).reshape(ex_, ey_, ez)


def _mesh_kernel(sc_ref, sw_ref, se_ref, ss_ref, sn_ref, swsr, swnr, sesr,
                 senr, out_ref, *, cf, tlx, tly, ez, bw, cap):
    """One output mesh tile = own center piece + 8 neighbor border pieces.

    Neighbor patch coordinates map into this tile's frame by construction:
    a west neighbor's stencil reaches our cells j in [0, bw) exactly where
    its extended-patch coordinate e = j + bw + tlx, i.e. shift bw + tlx."""
    dtype = out_ref.dtype.type
    pc = functools.partial(_piece, cf=cf, ez=ez, cap=cap, dtype=dtype)
    # shifts: our cell i sits at a neighbor's extended-patch coordinate
    # e = i + bw - dx*tlx; the piece's one-hot index is e - sx, so the own
    # piece shifts by bw, the west (dx=-1) piece by bw + tlx, and the east
    # (dx=+1) piece's first bw patch coords ARE our last bw cells (sx=0)
    own = pc(sc_ref[0, 0, 0], sx=bw, ex_=tlx, sy=bw, ey_=tly)
    w = pc(sw_ref[0, 0, 0], sx=bw + tlx, ex_=bw, sy=bw, ey_=tly)
    e = pc(se_ref[0, 0, 0], sx=0, ex_=bw, sy=bw, ey_=tly)
    s = pc(ss_ref[0, 0, 0], sx=bw, ex_=tlx, sy=bw + tly, ey_=bw)
    n = pc(sn_ref[0, 0, 0], sx=bw, ex_=tlx, sy=0, ey_=bw)
    ws = pc(swsr[0, 0, 0], sx=bw + tlx, ex_=bw, sy=bw + tly, ey_=bw)
    wn = pc(swnr[0, 0, 0], sx=bw + tlx, ex_=bw, sy=0, ey_=bw)
    es = pc(sesr[0, 0, 0], sx=0, ex_=bw, sy=bw + tly, ey_=bw)
    en = pc(senr[0, 0, 0], sx=0, ex_=bw, sy=0, ey_=bw)
    # x bands: west border rows, middle, east border rows
    acc = jnp.concatenate(
        [own[:bw] + w, own[bw:tlx - bw], own[tlx - bw:] + e], axis=0)
    # y bands: the s/n edge pieces span the full x extent; corners fold
    # into their first/last bw rows
    s_full = jnp.concatenate(
        [s[:bw] + ws, s[bw:tlx - bw], s[tlx - bw:] + es], axis=0)
    n_full = jnp.concatenate(
        [n[:bw] + wn, n[bw:tlx - bw], n[tlx - bw:] + en], axis=0)
    out_ref[0] = jnp.concatenate(
        [acc[:, :bw] + s_full, acc[:, bw:tly - bw],
         acc[:, tly - bw:] + n_full], axis=1)


def spread_mesh_pallas_supported(*, tly, nty) -> bool:
    """Mosaic lowering constraint for the fused mesh kernel's OUTPUT block
    (1, tlx, tly, ez): the second-to-last block dim must be divisible by 8
    or equal the full array dim (nty * tly).  Grids whose picked xy tile
    is not lane-aligned (e.g. a 100-point axis tiled 5x20) cannot lower —
    callers must fall back to the patch-build path.  Found by
    tools/kernel_oracle.py on the real device (interpret mode accepts any
    block shape, the exact round-3 failure class)."""
    return tly % 8 == 0 or nty == 1


def spread_mesh_pallas(sl, cf, *, tlx, tly, ez, bw, ntx, nty, ntz, cap,
                       interpret=False):
    """z-binned mesh (ntz, nx, ny, ez) straight from slot rows: every
    output tile sums its own center piece and the 8 xy-neighbor border
    pieces, so neither the per-tile patches nor the XLA overlap-add merges
    are ever materialized.  x/y wrap periodically via the index maps; the
    z axis stays binned (the shifted z-DFT consumes it, ops/pppm.py
    _zbin_dft).  Total matmul flops are LOWER than the patch build's
    (the pieces tile the output exactly; the patch computes the border
    region twice).

    sl: (ntx, nty, ntz, 8, cap) slot rows [lx, ly, lz, dxx, dxy, dxz, q, 0]
    """
    kern = functools.partial(_mesh_kernel, cf=cf, tlx=tlx, tly=tly, ez=ez,
                             bw=bw, cap=cap)
    blk = (1, 1, 1, 8, cap)

    def imap(dx, dy):
        return lambda tx, ty, tz: ((tx + ntx + dx) % ntx,
                                   (ty + nty + dy) % nty, tz, 0, 0)

    offs = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1),
            (-1, -1), (-1, 1), (1, -1), (1, 1)]
    pieces = tlx * tly + 2 * bw * tly + 2 * tlx * bw + 4 * bw * bw
    t_tiles = ntx * nty * ntz
    return pl.pallas_call(
        kern,
        grid=(ntx, nty, ntz),
        in_specs=[pl.BlockSpec(blk, imap(dx, dy),
                               memory_space=pltpu.VMEM)
                  for dx, dy in offs],
        out_specs=pl.BlockSpec((1, tlx, tly, ez),
                               lambda tx, ty, tz: (tz, tx, ty, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntz, ntx * tlx, nty * tly, ez),
                                       sl.dtype),
        cost_estimate=pl.CostEstimate(
            flops=t_tiles * 2 * pieces * cap * ez,
            bytes_accessed=9 * sl.size * 4
            + t_tiles * tlx * tly * ez * 4,
            transcendentals=0),
        interpret=interpret,
    )(*([sl] * 9))


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
