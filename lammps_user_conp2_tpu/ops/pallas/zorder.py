"""Shared per-step atom orderings for the tile-masked Pallas kernels.

The pair kernel and both electrode-row kernels (ops/pallas/pair_kernel.py,
ops/pallas/ele_rows_kernel.py) gate tile pairs on exact per-tile coordinate
bounds, which requires the column atoms in a spatially coherent order.  All
three run at the same positions within a step, so the (N,) sort is computed
ONCE — by the charge solve, which hands it to the force path through the
kcache alongside the factored-Ewald tables — instead of once per kernel.

Two orderings:

- ``z_perm``: sort by (wrapped) z.  Optimal for slab cells whose lateral
  extent is only a few cutoffs (the reference's il decks): tiles become
  thin z-slabs and the z gap is the only useful bound.
- ``morton_perm``: sort by a 30-bit Morton (Z-curve) interleave of the
  quantized wrapped coordinates.  For boxes that are many cutoffs wide in
  EVERY axis (the 100k production regime), tiles become compact 3-D blobs
  and per-tile axis-aligned bounding boxes cull tile pairs in all three
  axes — the tile analogue of LAMMPS's 3-D neighbor bins.

Any permutation is CORRECT (the masks only lose tightness if the order is
poor); correctness comes from the per-tile bounds being computed from the
same permuted positions the kernels read.

The bound tests carry a +1e-3 Angstrom margin (Z_MARGIN): the sort keys and
the kernels' minimum-image distances are computed by different float
expressions, and a pair sitting within a few ulps of the cutoff must never
be dropped by a bound that rounded the other way.  1e-3 A is physically
nothing (neighbor skins are ~1 A) and costs at most one extra tile pair.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Z_MARGIN = 1e-3


def wrap_z(z, lz, zperiodic):
    if zperiodic:
        return z - lz * jnp.floor(z * (1.0 / lz))
    return z


def wrap_coords(x, box, periodic):
    """Wrap each periodic axis into [0, L); non-periodic axes pass through.
    The common coordinate frame for per-tile AABB bounds."""
    cols = []
    for ax in range(3):
        cols.append(wrap_z(x[:, ax], float(box[ax]), bool(periodic[ax])))
    return jnp.stack(cols, axis=1)


def z_perm(x, box, periodic):
    """(perm, z_sorted) over the n real atoms; any permutation is CORRECT
    (the masks only lose tightness if the keys are stale), but the tile
    bounds are only tight when the keys are sorted."""
    zs = wrap_z(x[:, 2], float(box[2]), bool(periodic[2]))
    perm = jnp.argsort(zs)
    return perm, zs[perm]


def _part1by2(v):
    """Spread the low 10 bits of int32 v so they occupy every 3rd bit."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _quantized(x, box, periodic, bits):
    """Per-axis wrapped coordinates quantized to ``bits``-bit int32 cells.
    ISOTROPIC: all axes share one cell size (longest span / 2^bits), so
    curve runs are compact in Angstroms, not in normalized units — a
    span-normalized curve stretches blobs along the long axis (2x looser
    AABBs on a 120x120x240 slab cell)."""
    nq = 1 << bits
    ws, los, spans = [], [], []
    for ax in range(3):
        w = wrap_z(x[:, ax], float(box[ax]), bool(periodic[ax]))
        lo = jnp.min(w)
        ws.append(w)
        los.append(lo)
        spans.append(jnp.max(w) - lo)
    cell = jnp.maximum(jnp.maximum(spans[0], jnp.maximum(spans[1], spans[2]))
                       / nq, 1e-30)
    return [jnp.clip((w - lo) / cell, 0, nq - 1).astype(jnp.int32)
            for w, lo in zip(ws, los)]


def morton_perm(x, box, periodic, bits=10):
    """(perm, z_sorted) ordering atoms along a 3-D Morton curve of their
    wrapped coordinates (``bits`` of resolution per axis, 10 -> 0.12 A at a
    120 A box).  The second element is the wrapped-z of the permuted atoms
    so the tuple is interchangeable with z_perm's wherever only (perm, z)
    are consumed.  NOTE: Morton jumps at octant boundaries, so contiguous
    tile runs straddling a high-order boundary get huge AABBs — prefer
    hilbert_perm (measured ~3.5x fewer surviving tile pairs at 24k atoms
    in a wide box); this stays as the cheap baseline/reference ordering."""
    cx, cy, cz = _quantized(x, box, periodic, bits)
    key = _part1by2(cx) | (_part1by2(cy) << 1) | (_part1by2(cz) << 2)
    perm = jnp.argsort(key)
    zs = wrap_z(x[:, 2], float(box[2]), bool(periodic[2]))
    return perm, zs[perm]


def hilbert_perm(x, box, periodic, bits=10):
    """(perm, z_sorted) ordering atoms along a 3-D Hilbert curve of their
    wrapped coordinates.  Unlike Morton, the Hilbert curve has no jumps:
    EVERY contiguous run of atoms is a compact connected region, so fixed
    tile slices of the sorted order get tight axis-aligned bounding boxes —
    the ordering the tile-pair AABB mask wants in the many-cutoffs-wide
    regime.  Branchless vectorized AxesToTranspose (J. Skilling,
    "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004): ~6 int
    ops per bit level per axis on (N,) int32 lanes."""
    X = _quantized(x, box, periodic, bits)
    # inverse undo: walk bit levels high->low exchanging/inverting low bits
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(3):
            cond = (X[i] & q) != 0
            t = (X[0] ^ X[i]) & p
            x0_inv = X[0] ^ p
            x0_exch = X[0] ^ t
            xi_exch = X[i] ^ t
            X[0] = jnp.where(cond, x0_inv, x0_exch)
            if i > 0:
                X[i] = jnp.where(cond, X[i], xi_exch)
        q >>= 1
    # Gray encode
    X[1] = X[1] ^ X[0]
    X[2] = X[2] ^ X[1]
    t = jnp.zeros_like(X[2])
    q = 1 << (bits - 1)
    while q > 1:
        t = jnp.where((X[2] & q) != 0, t ^ (q - 1), t)
        q >>= 1
    X = [xi ^ t for xi in X]
    # transpose form -> single key: X[0] carries the MSB of each level
    key = (_part1by2(X[0]) << 2) | (_part1by2(X[1]) << 1) | _part1by2(X[2])
    perm = jnp.argsort(key)
    zs = wrap_z(x[:, 2], float(box[2]), bool(periodic[2]))
    return perm, zs[perm]


def kd_perm(x, box, periodic, tr=128):
    """(perm, z_sorted) ordering atoms into balanced k-d bricks: recursive
    median cuts by ATOM COUNT (at tile granularity) along a static axis
    schedule, so every contiguous ``tr``-atom run is one near-cubic spatial
    brick — AABB looseness ~1x the volumetric ideal, vs ~5x measured for
    Hilbert runs and unbounded for z slabs in wide boxes.  This is the tile
    analogue of LAMMPS's 3-D neighbor binning, re-expressed as a
    count-balanced decomposition so tile shapes stay static.

    The cut tree is STATIC (segment boundaries are tile counts; the split
    axis per segment is chosen on the host by greedy longest-remaining-
    extent from the box dims), so each level costs exactly one multi-key
    lax.sort of (static segment id, coordinate).  log2(N/tr) ~ 10 levels at
    100k atoms."""
    import numpy as np

    n = x.shape[0]
    ni = max((n + tr - 1) // tr, 1)
    xw = wrap_coords(x, box, periodic)
    dims = [float(box[0]), float(box[1]), float(box[2])]

    # static tree: (tile_lo, tile_hi, extents[3]) per segment
    segments = [(0, ni, tuple(dims))]
    perm = jnp.arange(n, dtype=jnp.int32)
    xs = xw
    while max(b - a for a, b, _ in segments) > 1:
        axis_at = np.zeros(n, np.int64)
        sid_at = np.zeros(n, np.int64)
        newsegs = []
        for s, (a, b, ext) in enumerate(segments):
            lo, hi = a * tr, min(b * tr, n)
            sid_at[lo:hi] = s
            if b - a > 1:
                ax = int(np.argmax(ext))
                axis_at[lo:hi] = ax
                m = a + (b - a + 1) // 2
                le = list(ext)
                le[ax] = ext[ax] * (m - a) / (b - a)
                re = list(ext)
                re[ax] = ext[ax] * (b - m) / (b - a)
                newsegs += [(a, m, tuple(le)), (m, b, tuple(re))]
            else:
                newsegs.append((a, b, ext))
        key = jnp.where(jnp.asarray(axis_at == 0), xs[:, 0],
                        jnp.where(jnp.asarray(axis_at == 1), xs[:, 1],
                                  xs[:, 2]))
        _, _, p2 = jax.lax.sort(
            (jnp.asarray(sid_at, jnp.int32), key,
             jnp.arange(n, dtype=jnp.int32)), num_keys=2)
        perm = perm[p2]
        xs = xs[p2]
        segments = newsegs
    zs = wrap_z(x[:, 2], float(box[2]), bool(periodic[2]))
    return perm, zs[perm]


def _kd128(x, box, periodic):
    return kd_perm(x, box, periodic, tr=128)


def _kd256(x, box, periodic):
    return kd_perm(x, box, periodic, tr=256)


ORDERINGS = {"z": z_perm, "morton": morton_perm, "hilbert": hilbert_perm,
             "kd128": _kd128, "kd256": _kd256}
