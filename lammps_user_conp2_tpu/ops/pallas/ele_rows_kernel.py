"""Pallas TPU kernels for the electrode-row sweeps.

Two per-step sweeps walk the same (Ne, N) geometry (VERDICT round 1, weak
#4): the b-vector real-space block (fix_conp.cpp:1281-1365 blist_coul_cal)
and the Gaussian correction forces (fix_conp.cpp:1368-1444
blist_coul_cal_post_force).  The XLA paths materialize (Ne, N) intermediates
in HBM; these kernels fuse the whole chain — minimum image, EHGO/ETA
Gaussian kernels via one-hot MXU table lookups, erfc — in VMEM tiles.

Both pair modes share one parameterization: eta_ij per-type-pair widths and
fo_ij overlap prefactors (ETA = uniform eta, fo = 0; fix_conp.cpp:1467-1573):

    potential(rsq) = fo * exp(-e2/2) - erfcr(e2) * et     e2 = et^2 rsq
    force(rsq)     = e2 * fo * exp(-e2/2) - ferfcr(e2) * et

The correction kernel accumulates row forces over column tiles (contiguous
revisit) and emits per-entry partial column forces reduced outside in XLA;
the b kernel emits row sums only.

Tile-pair compaction (the pair kernel's scheme, adapted to rectangular
electrode x all-atom sweeps): electrodes sit on a handful of z planes and
the cell is a z-extended slab, so most (row-tile, col-tile) pairs are
provably out of range once columns are z-argsorted.  The surviving pairs
are COMPACTED into a 1-D grid whose (row, col) tile indices are
scalar-prefetched from SMEM — out-of-range pairs never get a grid step
(at the 100k production config ~97% of the dense (9, 195) grid is dead,
and a dense grid pays its block DMAs on every step whether or not the
body runs).  Column tile 0 is forced active per row so every output block
is visited (zeroed) at least once.  ``cap`` bounds the compacted grid
(None = the full pair count, always sufficient); if the live count ever
exceeds a tighter cap the outputs come back NaN-poisoned (fail loud, the
same contract as the pair kernel / neighbor list).

Operands are PACKED into one row array and one column array (the kernels
are DMA-issue-bound: 2 block copies per grid step instead of 6-8):
    rows: [eta T | fo T | x 3 | q 1]        (q column unused by the b kernel)
    cols: [ohc T | x 3 | q 1 | cmask 1]
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..erfc import A1, A2, A3, A4, A5, ERFC_MAX, EWALD_F, EWALD_P
from .zorder import Z_MARGIN, wrap_z, z_perm

_ERFC_MAX_SQ = ERFC_MAX * ERFC_MAX


def _geometry(xr, xc, box, periodic, tr, tc):
    rsq = jnp.zeros((tr, tc), xr.dtype)
    d = []
    for ax in range(3):
        da = xr[:, ax:ax + 1] - xc[:, ax:ax + 1].T
        if periodic[ax]:
            L = box[ax]
            da = da - L * jnp.round(da * (1.0 / L))
        d.append(da)
        rsq = rsq + da * da
    return d, rsq


def _erfcr(a2_r2, expm2=None):
    """erfc(sqrt(u))/sqrt(u) with the A&S polynomial + ERFC_MAX clamp.

    ``expm2``: exp(-u) if the caller already has it (the Gaussian chain
    computes exp(-u/2), whose square is exp(-u) — one transcendental
    instead of two).  One rsqrt serves both sqrt(u) and the 1/sqrt(u)."""
    safe = jnp.maximum(a2_r2, 1e-30)
    rs = jax.lax.rsqrt(safe)
    a_r = safe * rs
    if expm2 is None:
        expm2 = jnp.exp(-safe)
    t = 1.0 / (1.0 + EWALD_P * a_r)
    val = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2 * rs
    return jnp.where(a2_r2 < _ERFC_MAX_SQ, val, 0.0), expm2


def _gauss_pair(pr, pc, rsq_s, t, dtype):
    """Per-pair Gaussian kernel tables from the packed operands."""
    dg = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST)
    ohc = pc[:, 0:t]
    et = dg(pr[:, 0:t], ohc)
    fo = dg(pr[:, t:2 * t], ohc)
    return et, fo


def _corr_kernel(ri_ref, cj_ref, meta_ref, pr_ref, pc_ref, out_ref, fcp_ref,
                 *, box, periodic, cutsq, qqr2e, tr, tc, t):
    p = pl.program_id(0)
    m = meta_ref[p]
    active = (m & 1) != 0
    first = (m & 4) != 0

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_not(active))
    def _():
        # visited exactly once: must be zeroed when the chain is skipped
        fcp_ref[:] = jnp.zeros_like(fcp_ref)

    @pl.when(active)
    def _():
        pr = pr_ref[:]
        pc = pc_ref[:]
        xr = pr[:, 2 * t:2 * t + 3]
        xc = pc[:, t:t + 3]
        qr = pr[:, 2 * t + 3:2 * t + 4]
        qc = pc[:, t + 3:t + 4]
        cmask = pc[:, t + 4:t + 5]
        d, rsq = _geometry(xr, xc, box, periodic, tr, tc)
        mask = (rsq < cutsq) & (cmask.T > 0.0)  # elyte columns only
        rsq_s = jnp.where(mask, rsq, 1.0)

        et, fo = _gauss_pair(pr, pc, rsq_s, t, xr.dtype)
        e2 = et * et * rsq_s
        ghalf = jnp.exp(-0.5 * e2)
        erfcr, expm2 = _erfcr(e2, expm2=ghalf * ghalf)
        gexp = fo * ghalf
        ek = gexp - erfcr * et
        ferfcr = jnp.where(e2 < _ERFC_MAX_SQ, erfcr + EWALD_F * expm2, 0.0)
        fk = e2 * gexp - ferfcr * et

        pref = qqr2e * qr * qc.T
        epair = jnp.where(mask, pref * ek, 0.0)
        fpair = jnp.where(mask, pref * fk, 0.0) / rsq_s

        px = fpair * d[0]
        py = fpair * d[1]
        pz = fpair * d[2]
        acc = jnp.concatenate(
            [jnp.stack([jnp.sum(px, axis=1), jnp.sum(py, axis=1),
                        jnp.sum(pz, axis=1)], axis=1),
             jnp.sum(epair, axis=1, keepdims=True)], axis=1)   # (TR, 4)
        out_ref[:] = out_ref[:] + acc
        fcp_ref[0, :, :] = -jnp.stack(
            [jnp.sum(px, axis=0), jnp.sum(py, axis=0), jnp.sum(pz, axis=0)],
            axis=1)                                            # (TC, 3)


def _b_kernel(ri_ref, cj_ref, meta_ref, pr_ref, pc_ref, br_ref, *,
              box, periodic, cutsq, g_ewald, tr, tc, t):
    p = pl.program_id(0)
    m = meta_ref[p]
    active = (m & 1) != 0
    first = (m & 4) != 0

    @pl.when(first)
    def _():
        br_ref[:] = jnp.zeros_like(br_ref)

    @pl.when(active)
    def _():
        pr = pr_ref[:]
        pc = pc_ref[:]
        xr = pr[:, 2 * t:2 * t + 3]
        xc = pc[:, t:t + 3]
        qc = pc[:, t + 3:t + 4]
        cmask = pc[:, t + 4:t + 5]
        d, rsq = _geometry(xr, xc, box, periodic, tr, tc)
        mask = (rsq < cutsq) & (cmask.T > 0.0)
        rsq_s = jnp.where(mask, rsq, 1.0)

        et, fo = _gauss_pair(pr, pc, rsq_s, t, xr.dtype)
        e2 = et * et * rsq_s
        ghalf = jnp.exp(-0.5 * e2)
        erfcr_e, _ = _erfcr(e2, expm2=ghalf * ghalf)
        ek = fo * ghalf - erfcr_e * et
        erfcr_g, _ = _erfcr(g_ewald * g_ewald * rsq_s)
        dudq = erfcr_g * g_ewald + ek

        contrib = jnp.where(mask, dudq, 0.0) * qc.T               # (TR, TC)
        br_ref[:] = br_ref[:] - jnp.sum(contrib, axis=1, keepdims=True)


def _rect_zmask(zr_key, rvalid, zc_key, cvalid, nri, tr_, ncj, tc_,
                cutoff, lz, zperiodic):
    """(nri, ncj) int32 mask: 1 where the (electrode row tile, column tile)
    pair can hold an in-range pair, judged by exact per-tile z bounds.
    Row bounds use all real electrodes in the tile; column bounds only the
    entries flagged by ``cvalid`` (electrolyte — electrode columns are
    masked in-kernel anyway, so they must not widen the bounds).  Column
    tile 0 is forced active so every row output block is visited."""
    big = jnp.asarray(1e8, zr_key.dtype)
    zrt = zr_key.reshape(nri, tr_)
    rv = rvalid.reshape(nri, tr_)
    rmin = jnp.min(jnp.where(rv, zrt, big), axis=1)
    rmax = jnp.max(jnp.where(rv, zrt, -big), axis=1)
    zct = zc_key.reshape(ncj, tc_)
    cv = cvalid.reshape(ncj, tc_)
    cmin = jnp.min(jnp.where(cv, zct, big), axis=1)
    cmax = jnp.max(jnp.where(cv, zct, -big), axis=1)
    cutoff = cutoff + Z_MARGIN   # float-noise insurance; see zorder.py
    gap = jnp.maximum(cmin[None, :] - rmax[:, None],
                      rmin[:, None] - cmax[None, :])
    act = gap <= cutoff
    if zperiodic:
        span = (jnp.maximum(rmax[:, None], cmax[None, :])
                - jnp.minimum(rmin[:, None], cmin[None, :]))
        act = act | ((lz - span) <= cutoff)
    act = act & jnp.any(rv, axis=1)[:, None] & jnp.any(cv, axis=1)[None, :]
    act = act.at[:, 0].set(True)
    return act.astype(jnp.int32)


def _compact_rect(act, nri, ncj, cap):
    """Row-major compaction of the dense active mask into (ri, cj, meta)
    lists of static length ``cap``.  meta bits: 1=active, 4=first visit of
    this row tile.  Tail pads replay the last active entry with all bits
    clear (windows stay resident, nothing is written)."""
    flat = act.reshape(-1)
    order = jnp.argsort(1 - flat, stable=True)
    count = jnp.sum(flat)
    idx = order[:cap]
    valid = jnp.arange(cap) < count
    last = order[jnp.maximum(count - 1, 0)]
    idx = jnp.where(valid, idx, last)
    ri = (idx // ncj).astype(jnp.int32)
    cj = (idx % ncj).astype(jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), ri[1:] != ri[:-1]]) & valid
    meta = valid.astype(jnp.int32) | (first.astype(jnp.int32) << 2)
    return ri, cj, meta, count


def _prep(x, q_col, ele_idx, elyte_mask_f, eta_rows, fo_rows, ohc, box,
          periodic, cutoff, tr, tc, zsort, cap, dtype):
    """Shared packing + masking for both kernels.  Returns the prefetch
    lists, packed operands, grid geometry, and the live count."""
    n = x.shape[0]
    ne = ele_idx.shape[0]
    padr = (-ne) % tr
    padc = (-n) % tc
    npr = ne + padr
    npc = n + padc

    sentinel = jnp.asarray([1e6, 1e6, 1e6], dtype)
    xe = jnp.concatenate([x[ele_idx], jnp.tile(sentinel, (padr, 1))], axis=0)
    qe = jnp.pad(q_col[ele_idx], (0, padr))[:, None]
    etar = jnp.pad(eta_rows, ((0, padr), (0, 0))).astype(dtype)
    forr = jnp.pad(fo_rows, ((0, padr), (0, 0))).astype(dtype)
    rows = jnp.concatenate([etar, forr, xe, qe], axis=1)

    lz = float(box[2])
    zper = bool(periodic[2])
    if zsort is None:
        zsort = z_perm(x, box, periodic)
    perm, zs_n = zsort
    xc = jnp.concatenate([x[perm], jnp.tile(sentinel, (padc, 1))], axis=0)
    qc = jnp.pad(q_col[perm], (0, padc))[:, None]
    ohcp = jnp.pad(ohc[perm], ((0, padc), (0, 0))).astype(dtype)
    cmask = jnp.pad(elyte_mask_f[perm], (0, padc)).astype(dtype)[:, None]
    cols = jnp.concatenate([ohcp, xc, qc, cmask], axis=1)

    nri, ncj = npr // tr, npc // tc
    zr_key = jnp.pad(wrap_z(x[ele_idx, 2], lz, zper), (0, padr),
                     constant_values=1e9)
    act = _rect_zmask(zr_key, zr_key < 1e8,
                      jnp.pad(zs_n.astype(dtype), (0, padc),
                              constant_values=1e9),
                      cmask[:, 0] > 0.0, nri, tr, ncj, tc,
                      float(cutoff), lz, zper)
    full = nri * ncj
    cap = full if cap is None else min(int(cap), full)
    ri, cj, meta, count = _compact_rect(act, nri, ncj, cap)
    return (ri, cj, meta, rows, cols, perm, npr, npc, nri, ncj, cap, count,
            ne, n)


def conp_correction_pallas(x, q, ele_idx, elyte_mask_f, eta_rows, fo_rows,
                           ohc, *, box, periodic, cutoff, qqr2e,
                           tr=128, tc=512, zsort=None, cap=None,
                           interpret=False):
    """Fused Gaussian correction: returns (f (N,3), ecorr).

    eta_rows/fo_rows: (Ne, T) per-electrode kernel table rows;
    ohc: (N, T) one-hot column types; elyte_mask_f: (N,) float 1.0=elyte."""
    dtype = x.dtype
    t = ohc.shape[1]
    (ri, cj, meta, rows, cols, perm, npr, npc, nri, ncj, cap, count,
     ne, n) = _prep(x, q, ele_idx, elyte_mask_f, eta_rows, fo_rows, ohc,
                    box, periodic, cutoff, tr, tc, zsort, cap, dtype)
    kern = functools.partial(
        _corr_kernel, box=tuple(float(b) for b in box), periodic=periodic,
        cutsq=float(cutoff) ** 2, qqr2e=float(qqr2e), tr=tr, tc=tc, t=t)
    rmap = lambda p, ri_, cj_, mt_: (ri_[p], 0)
    cmap = lambda p, ri_, cj_, mt_: (cj_[p], 0)
    out, fcp = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cap,),
            in_specs=[pl.BlockSpec((tr, rows.shape[1]), rmap),
                      pl.BlockSpec((tc, cols.shape[1]), cmap)],
            out_specs=[pl.BlockSpec((tr, 4), rmap),
                       pl.BlockSpec((1, tc, 3),
                                    lambda p, ri_, cj_, mt_: (p, 0, 0))],
        ),
        out_shape=[jax.ShapeDtypeStruct((npr, 4), dtype),
                   jax.ShapeDtypeStruct((cap, tc, 3), dtype)],
        interpret=interpret,
    )(ri, cj, meta, rows, cols)

    # segment-add the per-entry column mirrors onto their column tiles via
    # a one-hot MXU matmul, then undo the column z-sort
    onehot = (jnp.arange(ncj)[:, None] == cj[None, :]).astype(dtype)
    fcs = jnp.matmul(onehot, fcp.reshape(cap, tc * 3),
                     precision=jax.lax.Precision.HIGHEST).reshape(npc, 3)
    f = jnp.zeros((n, 3), dtype).at[perm].set(fcs[:n])
    f = f.at[ele_idx].add(out[:ne, :3])
    bad = count > cap
    f = jnp.where(bad, jnp.nan, f)
    return f, jnp.where(bad, jnp.nan, jnp.sum(out[:ne, 3]))


def b_realspace_pallas(x, q_elyte, ele_idx, elyte_mask_f, eta_rows, fo_rows,
                       ohc, *, box, periodic, cut_coulsq, g_ewald,
                       tr=128, tc=512, zsort=None, cap=None,
                       interpret=False):
    """Fused b-vector real-space block: returns b_real (Ne,).

    b_i = -sum_j q_j (erfc(g r)/r + potential(rsq)), elyte cols in range."""
    dtype = x.dtype
    t = ohc.shape[1]
    (ri, cj, meta, rows, cols, perm, npr, npc, nri, ncj, cap, count,
     ne, n) = _prep(x, q_elyte, ele_idx, elyte_mask_f, eta_rows, fo_rows,
                    ohc, box, periodic, math.sqrt(float(cut_coulsq)),
                    tr, tc, zsort, cap, dtype)
    kern = functools.partial(
        _b_kernel, box=tuple(float(b) for b in box), periodic=periodic,
        cutsq=float(cut_coulsq), g_ewald=float(g_ewald), tr=tr, tc=tc, t=t)
    rmap = lambda p, ri_, cj_, mt_: (ri_[p], 0)
    cmap = lambda p, ri_, cj_, mt_: (cj_[p], 0)
    br = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cap,),
            in_specs=[pl.BlockSpec((tr, rows.shape[1]), rmap),
                      pl.BlockSpec((tc, cols.shape[1]), cmap)],
            out_specs=[pl.BlockSpec((tr, 1), rmap)],
        ),
        out_shape=[jax.ShapeDtypeStruct((npr, 1), dtype)],
        interpret=interpret,
    )(ri, cj, meta, rows, cols)[0]
    return jnp.where(count > cap, jnp.nan, br[:ne, 0])
