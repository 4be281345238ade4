"""Pallas TPU kernel for the all-pairs LJ + real-space Coulomb force sweep.

The XLA dense path (ops/pairs.py) materializes (block, N) intermediates in
HBM (~2.4 ms on il_twolayer).  This kernel tiles the pair matrix into
(TR, TC) VMEM blocks and fuses the whole per-pair chain — minimum image,
LJ via one-hot MXU matmuls, erfc Coulomb, force reduction — entirely
on-chip; only (N,3) forces and per-row energies ever leave VMEM.

Newton's third law halves the sweep (the reference's "compute half, mirror"
checkerboard, fix_conp.cpp:826-831 / km_ewald.cpp:604, re-expressed for
tiles): with an ODD number NI of square tiles per side, the round-robin
pairing (i, (i+jp) mod NI) for jp = 0..(NI-1)/2 visits every unordered tile
pair exactly once.  Each off-diagonal tile emits BOTH its row forces
(accumulated in the standard output) and its column forces (-sum over rows,
written to a per-(jp, col-block) side buffer reduced outside the kernel).
The diagonal tile (jp=0) contains both orderings of its pairs already, so
its column output is zero and its energies carry a 0.5 factor.

z-bounded tile skipping: electrochemical cells are z-extended slabs (the
reference's decks have lz >> cutoff), so most tile pairs are provably out
of range once atoms are ordered by z.  Per call the atoms are argsorted by
(wrapped) z, per-tile [zmin, zmax] bounds are computed, and a small SMEM
mask marks the tile pairs whose minimum-image z gap exceeds the cutoff;
the kernel skips their pair chain under ``pl.when``.  This is EXACT (the
bounds come from the same positions the kernel sees — no skin, no drift
window) and costs one (N,) sort plus (N,)-row gathers per call.

Special-bond exclusions are handled OUTSIDE the kernel: the kernel computes
the uniform si=1 sweep, and the (few thousand) excluded pairs get a flat
correction pass (exact algebraic difference).  This keeps the kernel free of
per-pair gathers.

The kernel assumes row/col padding to the tile sizes with q=0, x placed at
a far-away sentinel (> cutoff from everything) for pad atoms.  Pad-pad
pairs sit at zero distance and generate inf/nan — only into pad rows/cols,
which are sliced away before any reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..erfc import EWALD_F

EWALD_P = 0.3275911
A1, A2, A3, A4, A5 = (0.254829592, -0.284496736, 1.421413741,
                      -1.453152027, 1.061405429)


def _kernel(act_ref, xr_ref, qr_ref, cr_ref, xc_ref, qc_ref, ohc_ref,
            f_ref, fcols_ref, ev_ref, ec_ref, *, box, periodic, cutsq,
            g_ewald, qqr2e, tr, tc, ni):
    i = pl.program_id(0)
    jp = pl.program_id(1)
    diag = (jp == 0)
    active = diag | (act_ref[i, jp] != 0)

    @pl.when(diag)
    def _():
        f_ref[:] = jnp.zeros_like(f_ref)
        ev_ref[:] = jnp.zeros_like(ev_ref)
        ec_ref[:] = jnp.zeros_like(ec_ref)

    @pl.when(jnp.logical_not(active))
    def _():
        # this (jp, col) side-buffer block is visited exactly once — it must
        # be zeroed when the pair chain is skipped
        fcols_ref[:] = jnp.zeros_like(fcols_ref)

    @pl.when(active)
    def _():
        xr = xr_ref[:]                      # (TR, 3)
        xc = xc_ref[:]                      # (TC, 3)
        qr = qr_ref[:]                      # (TR, 1)
        qc = qc_ref[:]                      # (TC, 1)

        # pairwise displacement planes with minimum image
        rsq = jnp.zeros((tr, tc), xr.dtype)
        d = []
        for ax in range(3):
            da = xr[:, ax:ax + 1] - xc[:, ax:ax + 1].T        # (TR, TC)
            if periodic[ax]:
                L = box[ax]
                da = da - L * jnp.round(da * (1.0 / L))
            d.append(da)
            rsq = rsq + da * da

        jc = (i + jp) % ni
        i0 = i * tr
        j0 = jc * tc
        rows = i0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
        cols = j0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
        inrange = (rsq < cutsq) & (rows != cols)

        rsq_safe = jnp.where(inrange, rsq, 1.0)
        # one rsqrt serves every r power: r2inv, r (no div, no sqrt)
        rinv = jax.lax.rsqrt(rsq_safe)
        r2inv = rinv * rinv
        r6inv = r2inv * r2inv * r2inv
        # one-hot MXU matmuls for the per-pair LJ coefficients:
        # cr (TR, 4*T) holds [lj1|lj2|lj3|lj4] rows; ohc (TC, T) one-hot types
        cr = cr_ref[:]
        ohc = ohc_ref[:]
        t = ohc.shape[1]
        # cr is (TR, 4T): split the contraction into the 4 tables.
        # precision HIGHEST: Mosaic's default f32 matmul rounds operands to
        # bf16, corrupting the large LJ coefficients by ~0.4%
        dg = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=xr.dtype,
            precision=jax.lax.Precision.HIGHEST)
        l1 = dg(cr[:, 0 * t:1 * t], ohc)
        l2 = dg(cr[:, 1 * t:2 * t], ohc)
        l3 = dg(cr[:, 2 * t:3 * t], ohc)
        l4 = dg(cr[:, 3 * t:4 * t], ohc)

        flj = jnp.where(inrange, r6inv * (l1 * r6inv - l2) * r2inv, 0.0)
        elj = jnp.where(inrange, r6inv * (l3 * r6inv - l4), 0.0)

        grij = (g_ewald * rsq_safe) * rinv        # g * r
        expm2 = jnp.exp(-grij * grij)
        tt = 1.0 / (1.0 + EWALD_P * grij)
        erfc = tt * (A1 + tt * (A2 + tt * (A3 + tt * (A4 + tt * A5)))) * expm2
        prefactor = (qqr2e * rinv) * (qr * qc.T)
        fcoul = jnp.where(inrange, prefactor * (erfc + EWALD_F * grij * expm2), 0.0)
        ecoul = jnp.where(inrange, prefactor * erfc, 0.0)

        fpair = flj + fcoul * r2inv
        px = fpair * d[0]
        py = fpair * d[1]
        pz = fpair * d[2]
        fblk = jnp.stack([jnp.sum(px, axis=1), jnp.sum(py, axis=1),
                          jnp.sum(pz, axis=1)], axis=1)       # (TR, 3)

        # Newton mirror: force on the column atoms = -sum over rows.
        # Zero on the diagonal tile (it already holds both pair orderings).
        csc = jnp.where(diag, 0.0, 1.0).astype(xr.dtype)
        fcols_ref[0, :, :] = -csc * jnp.stack(
            [jnp.sum(px, axis=0), jnp.sum(py, axis=0), jnp.sum(pz, axis=0)],
            axis=1)                                           # (TC, 3)

        # energies live on the row side; the diagonal tile double-counts its
        # unordered pairs, off-diagonal round-robin tiles count each pair once
        esc = jnp.where(diag, 0.5, 1.0).astype(xr.dtype)

        f_ref[:] = f_ref[:] + fblk
        ev_ref[:] = ev_ref[:] + esc * jnp.sum(elj, axis=1, keepdims=True)
        ec_ref[:] = ec_ref[:] + esc * jnp.sum(ecoul, axis=1, keepdims=True)


def _tile_mask(zkey, n, ni, tr, njp, cutoff, lz, zperiodic):
    """(ni, njp) int32 mask: 1 where tile i and its round-robin partner
    (i+jp) mod ni can hold a pair within the cutoff, judged by exact
    per-tile [zmin, zmax] bounds of the SORTED z keys (pads carry key
    _PAD_KEY and are excluded from the bounds)."""
    big = jnp.asarray(1e8, zkey.dtype)
    zt = zkey.reshape(ni, tr)
    valid = zt < big
    zmin = jnp.min(jnp.where(valid, zt, big), axis=1)
    zmax = jnp.max(jnp.where(valid, zt, -big), axis=1)
    tvalid = jnp.any(valid, axis=1)
    ii = jnp.arange(ni)[:, None]
    jj = (ii + jnp.arange(njp)[None, :]) % ni
    gd = jnp.maximum(zmin[jj] - zmax[ii], zmin[ii] - zmax[jj])
    act = gd <= cutoff
    if zperiodic:
        span = jnp.maximum(zmax[ii], zmax[jj]) - jnp.minimum(zmin[ii], zmin[jj])
        act = act | ((lz - span) <= cutoff)
    act = act & tvalid[ii] & tvalid[jj]
    act = act.at[:, 0].set(True)
    return act.astype(jnp.int32)


_PAD_KEY = 1e9


def pair_forces_pallas(x, q, type_idx, tables, exclusions, *, box, periodic,
                       cutoff, g_ewald, qqr2e, tr=256, tc=256,
                       interpret=False):
    """Drop-in equivalent of ops.pairs.dense_pair_forces (same return values)."""
    assert tr == tc, "Newton round-robin tiling requires square tiles"
    n = x.shape[0]
    dtype = x.dtype
    nt1 = tables.lj1.shape[0]
    npr = n + (-n) % tr
    ni = npr // tr
    if ni % 2 == 0:
        # round-robin pairing needs an odd tile count; add one pad tile
        npr += tr
        ni += 1
    npad = npr - n
    # sentinel far outside every cutoff so pad pairs are out of range
    sentinel = jnp.asarray([1e6, 1e6, 1e6], dtype)
    xp = jnp.concatenate([x, jnp.tile(sentinel, (npad, 1))], axis=0)
    qp = jnp.pad(q, (0, npad))
    tp = jnp.pad(type_idx, (0, npad))

    # z-order the atoms so the per-tile z bounds are tight (pads sort last);
    # the sort key wraps z into [0, L) when z is periodic — the kernel's own
    # minimum image is unaffected (it sees the raw coordinates)
    zs = xp[:, 2]
    if periodic[2]:
        L = float(box[2])
        zs = zs - L * jnp.floor(zs * (1.0 / L))
    zkey = jnp.where(jnp.arange(npr) < n, zs, jnp.asarray(_PAD_KEY, dtype))
    perm = jnp.argsort(zkey)
    zkey = zkey[perm]
    xp = xp[perm]
    qp = qp[perm]
    tp = tp[perm]

    # per-row coefficient table [lj1|lj2|lj3|lj4][type_i] : (N', 4T)
    cr = jnp.concatenate([tables.lj1[tp], tables.lj2[tp],
                          tables.lj3[tp], tables.lj4[tp]], axis=1).astype(dtype)
    ohc = (tp[:, None] == jnp.arange(nt1)[None, :]).astype(dtype)

    njp = (ni + 1) // 2
    act = _tile_mask(zkey, n, ni, tr, njp, float(cutoff),
                     float(box[2]), bool(periodic[2]))
    grid = (ni, njp)
    kern = functools.partial(
        _kernel, box=tuple(float(b) for b in box), periodic=periodic,
        cutsq=float(cutoff) ** 2, g_ewald=float(g_ewald), qqr2e=float(qqr2e),
        tr=tr, tc=tc, ni=ni)
    cmap = lambda i, j: ((i + j) % ni, 0)
    f, fcols, ev_rows, ec_rows = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tr, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((tr, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tr, 4 * nt1), lambda i, j: (i, 0)),
            pl.BlockSpec((tc, 3), cmap),
            pl.BlockSpec((tc, 1), cmap),
            pl.BlockSpec((tc, nt1), cmap),
        ],
        out_specs=[
            pl.BlockSpec((tr, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tc, 3), lambda i, j: (j, (i + j) % ni, 0)),
            pl.BlockSpec((tr, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tr, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npr, 3), dtype),
            jax.ShapeDtypeStruct((njp, npr, 3), dtype),
            jax.ShapeDtypeStruct((npr, 1), dtype),
            jax.ShapeDtypeStruct((npr, 1), dtype),
        ],
        interpret=interpret,
    )(act, xp, qp[:, None], cr, xp, qp[:, None], ohc)

    fs = f + jnp.sum(fcols, axis=0)
    # undo the z-sort (pads sorted last, so valid rows are the first n)
    f = jnp.zeros((npr, 3), dtype).at[perm].set(fs)[:n]
    ev = jnp.sum(ev_rows[:n])
    ec = jnp.sum(ec_rows[:n])

    # exclusion corrections: exact algebraic difference between si=s and si=1
    exi, exv = exclusions
    m = exi.shape[1]
    rows = jnp.repeat(jnp.arange(n), m)
    cols = exi.reshape(-1)
    sval = exv.reshape(-1).astype(dtype)
    valid = cols < n
    cols_safe = jnp.where(valid, cols, 0)
    dx_ = x[rows] - x[cols_safe]
    boxj = jnp.asarray(box, dtype)
    from ..pairs import min_image
    dx_ = min_image(dx_, boxj, periodic)
    rsq = jnp.sum(dx_ * dx_, axis=1)
    valid = valid & (rsq < cutoff ** 2)
    rsq_safe = jnp.where(valid, rsq, 1.0)
    r2inv = 1.0 / rsq_safe
    r6inv = r2inv ** 3
    ti = type_idx[rows]
    tj = type_idx[cols_safe]
    l1 = tables.lj1[ti, tj]
    l2 = tables.lj2[ti, tj]
    l3 = tables.lj3[ti, tj]
    l4 = tables.lj4[ti, tj]
    ds = (sval - 1.0)
    dflj = ds * r6inv * (l1 * r6inv - l2) * r2inv
    delj = ds * r6inv * (l3 * r6inv - l4)
    r = jnp.sqrt(rsq_safe)
    pref = qqr2e * q[rows] * q[cols_safe] / r
    dfcoul = ds * pref            # -(1-s)*prefactor, both force and energy
    decoul = ds * pref
    dfpair = jnp.where(valid, dflj + dfcoul * r2inv, 0.0)
    fcorr = dfpair[:, None] * dx_
    f = f.at[rows].add(jnp.where(valid[:, None], fcorr, 0.0))
    ev = ev + 0.5 * jnp.sum(jnp.where(valid, delj, 0.0))
    ec = ec + 0.5 * jnp.sum(jnp.where(valid, decoul, 0.0))
    return f, ev, ec
