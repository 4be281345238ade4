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

z-bounded tile compaction: electrochemical cells are z-extended slabs (the
reference's decks have lz >> cutoff), so most tile pairs are provably out
of range once atoms are ordered by z.  Per call the atoms are argsorted by
(wrapped) z, per-tile [zmin, zmax] bounds are computed, and the tile pairs
whose minimum-image z gap is within the cutoff are COMPACTED into a 1-D
grid whose (row, col) tile indices are scalar-prefetched from SMEM
(PrefetchScalarGridSpec) — out-of-range tile pairs never get a grid step,
so they cost neither DMA nor compute.  This is EXACT (the bounds come from
the same positions the kernel sees — no skin, no drift window) and costs
one (N,) sort plus (N,)-row gathers per call.  The compacted list is
i-major so each row's output block stays resident across its visits (the
accumulation contract); entries beyond the live count replay the last
active (i, jc) with all flags clear, so they are resident no-ops (no DMA,
no compute — only the grid-step overhead).  The static capacity
``pair_cap`` defaults to the full tile-pair count, which never overflows
and measures within ~2% of a tight cap at the N this kernel serves (the
cell/nlist paths take over at large N); a caller passing a tighter cap
gets NaN-poisoned forces if the live count ever exceeds it (the same
fail-loud contract as the neighbor list).

Special-bond exclusions are handled OUTSIDE the kernel: the kernel computes
the uniform si=1 sweep, and the (few thousand) excluded pairs get a flat
correction pass (exact algebraic difference).  This keeps the kernel free of
per-pair gathers.

Rows/cols are padded to the tile sizes; pad atoms (sorted-order index >= n)
are masked out of ``inrange`` inside the kernel, so they contribute exactly
zero everywhere (a pad-pad pair sits at zero distance and would otherwise
inject inf/nan that the column segment-sum matmul spreads to real rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..erfc import ERFC_MAX, EWALD_F

EWALD_P = 0.3275911
A1, A2, A3, A4, A5 = (0.254829592, -0.284496736, 1.421413741,
                      -1.453152027, 1.061405429)
_ERFC_MAX_SQ = ERFC_MAX * ERFC_MAX


def _kernel(il_ref, jc_ref, meta_ref, pr_ref, pc_ref, out_ref, fcols_ref,
            *, box, periodic, cutsq, g_ewald, qqr2e, tr, tc, npts, nt1,
            fuse_corr):
    # Packed operands (ONE row DMA + ONE column DMA per grid step — the
    # kernel is DMA-issue-bound, not compute-bound: unpacked operands cost
    # ~4-6 us per step in 6-9 small lane-misaligned block copies):
    #   p* layout: [cr 4T | ohc T | (gr 2T) | x 3 | q 1 | (fl 2)]
    #   out layout: [fx fy fz | ev | ec | (ecorr) | pad] (8 lanes)
    t = nt1
    xoff = 7 * t if fuse_corr else 5 * t
    p = pl.program_id(0)
    m = meta_ref[p]
    active = (m & 1) != 0
    diag = (m & 2) != 0
    first = (m & 4) != 0

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_not(active))
    def _():
        # this side-buffer block is visited exactly once — it must be
        # zeroed when the pair chain is skipped (tail pad entries)
        fcols_ref[:] = jnp.zeros_like(fcols_ref)

    @pl.when(active)
    def _():
        pr = pr_ref[:]                      # (TR, W)
        pc = pc_ref[:]                      # (TC, W)
        xr = pr[:, xoff:xoff + 3]           # (TR, 3)
        xc = pc[:, xoff:xoff + 3]           # (TC, 3)
        qr = pr[:, xoff + 3:xoff + 4]       # (TR, 1)
        qc = pc[:, xoff + 3:xoff + 4]       # (TC, 1)

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

        i0 = il_ref[p] * tr
        j0 = jc_ref[p] * tc
        rows = i0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
        cols = j0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
        # pad atoms (global index >= n) are excluded here, at the source:
        # pad-pad pairs sit at zero distance and would otherwise inject
        # inf/nan that the column segment-sum matmul spreads to real rows
        inrange = ((rsq < cutsq) & (rows != cols)
                   & (rows < npts) & (cols < npts))

        rsq_safe = jnp.where(inrange, rsq, 1.0)
        # one rsqrt serves every r power: r2inv, r (no div, no sqrt)
        rinv = jax.lax.rsqrt(rsq_safe)
        r2inv = rinv * rinv
        r6inv = r2inv * r2inv * r2inv
        # one-hot MXU matmuls for the per-pair LJ coefficients:
        # pr[:, :4T] holds [lj1|lj2|lj3|lj4] rows; pc[:, 4T:5T] one-hot types
        ohc = pc[:, 4 * t:5 * t]
        # split the contraction into the 4 tables.
        # precision HIGHEST: Mosaic's default f32 matmul rounds operands to
        # bf16, corrupting the large LJ coefficients by ~0.4%
        dg = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=xr.dtype,
            precision=jax.lax.Precision.HIGHEST)
        l1 = dg(pr[:, 0 * t:1 * t], ohc)
        l2 = dg(pr[:, 1 * t:2 * t], ohc)
        l3 = dg(pr[:, 2 * t:3 * t], ohc)
        l4 = dg(pr[:, 3 * t:4 * t], ohc)

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
        acc = jnp.concatenate(
            [fblk, esc * jnp.sum(elj, axis=1, keepdims=True),
             esc * jnp.sum(ecoul, axis=1, keepdims=True),
             jnp.zeros((tr, 3), xr.dtype)], axis=1)          # (TR, 8)
        out_ref[:] = out_ref[:] + acc

        if fuse_corr:
            # fused CONP Gaussian correction (the reference's second
            # coul_cal neighbor pass, fix_conp.cpp:1467-1573) — only tiles
            # that can hold an (electrode, elyte) pair carry meta bit 8;
            # the kernel is compute-bound, so pl.when-gating the chain on
            # those tiles is a real saving (most tiles are pure
            # electrolyte under any spatial ordering).
            @pl.when((m & 8) != 0)
            def _():
                etap = dg(pr[:, 5 * t:6 * t], ohc)
                fop = dg(pr[:, 6 * t:7 * t], ohc)
                flr = pr[:, xoff + 4:xoff + 6]               # (TR, 2)
                flc = pc[:, xoff + 4:xoff + 6]               # (TC, 2)
                cm = inrange & ((flr[:, 0:1] * flc[:, 1:2].T
                                 + flr[:, 1:2] * flc[:, 0:1].T) > 0.0)
                e2 = etap * etap * rsq_safe
                ghalf = jnp.exp(-0.5 * e2)
                em2 = ghalf * ghalf        # exp(-e2): one transcendental
                safe = jnp.maximum(e2, 1e-30)
                rs = jax.lax.rsqrt(safe)
                ar = safe * rs             # sqrt(e2)
                t2 = 1.0 / (1.0 + EWALD_P * ar)
                erfcr = (t2 * (A1 + t2 * (A2 + t2 * (A3 + t2 * (A4 + t2 * A5))))
                         * em2 * rs)       # erfc(ar)/ar
                inmax = e2 < _ERFC_MAX_SQ
                erfcr = jnp.where(inmax, erfcr, 0.0)
                gexp = fop * ghalf
                ekc = gexp - erfcr * etap
                ferfcr = jnp.where(inmax, erfcr + EWALD_F * em2, 0.0)
                fkc = e2 * gexp - ferfcr * etap
                cpref = qqr2e * (qr * qc.T)
                ecp = jnp.where(cm, cpref * ekc, 0.0)
                fcp = jnp.where(cm, cpref * fkc, 0.0) * r2inv
                cx = fcp * d[0]
                cy = fcp * d[1]
                cz = fcp * d[2]
                cacc = jnp.concatenate(
                    [jnp.stack([jnp.sum(cx, axis=1), jnp.sum(cy, axis=1),
                                jnp.sum(cz, axis=1)], axis=1),
                     jnp.zeros((tr, 2), xr.dtype),
                     esc * jnp.sum(ecp, axis=1, keepdims=True),
                     jnp.zeros((tr, 2), xr.dtype)], axis=1)  # (TR, 8)
                out_ref[:] = out_ref[:] + cacc
                fcols_ref[0, :, :] = fcols_ref[0, :, :] - csc * jnp.stack(
                    [jnp.sum(cx, axis=0), jnp.sum(cy, axis=0),
                     jnp.sum(cz, axis=0)], axis=1)


def _tile_mask3(xw, valid, ni, tr, njp, cutoff, box, periodic):
    """(ni, njp) int32 mask: 1 where tile i and its round-robin partner
    (i+jp) mod ni can hold a pair within the cutoff, judged by exact
    per-tile axis-aligned bounding boxes of the WRAPPED coordinates
    (pads excluded via ``valid``).  For z-sorted atoms the xy bounds span
    the box and this reduces to the z-gap test; for Morton-sorted atoms
    (compact 3-D tile blobs) all three axes cull — the tile analogue of
    LAMMPS's 3-D neighbor bins.  Per-axis gaps take the minimum of the
    direct and the around-the-box distance on periodic axes; a tile whose
    own AABB wraps the boundary just reads as axis-spanning (gap 0) —
    conservative, never wrong."""
    big = jnp.asarray(1e8, xw.dtype)
    xt = xw.reshape(ni, tr, 3)
    vt = valid.reshape(ni, tr, 1)
    mins = jnp.min(jnp.where(vt, xt, big), axis=1)       # (ni, 3)
    maxs = jnp.max(jnp.where(vt, xt, -big), axis=1)
    tvalid = jnp.any(vt[:, :, 0], axis=1)
    from .zorder import Z_MARGIN
    cutoff = cutoff + Z_MARGIN   # float-noise insurance; see zorder.py
    ii = jnp.arange(ni)[:, None]
    jj = (ii + jnp.arange(njp)[None, :]) % ni
    gapsq = jnp.zeros((ni, njp), xw.dtype)
    for ax in range(3):
        direct = jnp.maximum(mins[jj, ax] - maxs[ii, ax],
                             mins[ii, ax] - maxs[jj, ax])
        gap = jnp.maximum(direct, 0.0)
        if periodic[ax]:
            span = (jnp.maximum(maxs[ii, ax], maxs[jj, ax])
                    - jnp.minimum(mins[ii, ax], mins[jj, ax]))
            gap = jnp.minimum(gap, jnp.maximum(box[ax] - span, 0.0))
        gapsq = gapsq + gap * gap
    act = gapsq <= cutoff * cutoff
    act = act & tvalid[ii] & tvalid[jj]
    act = act.at[:, 0].set(True)
    return act.astype(jnp.int32)


def pair_tile_count(x, *, box, periodic, cutoff, tr=256, order="z"):
    """Live compacted tile-pair count at positions ``x`` — the build-time
    sizing input for ``pair_cap`` (engines take count x headroom; the
    NaN-poison + host regrow in Engine.run covers drift beyond it)."""
    import jax

    from .zorder import ORDERINGS, wrap_coords

    @jax.jit
    def count(x):
        n = x.shape[0]
        npr = n + (-n) % tr
        ni = npr // tr
        if ni % 2 == 0:
            npr += tr
            ni += 1
        perm, _ = ORDERINGS[order](x, box, periodic)
        xp = jnp.concatenate(
            [x[perm], jnp.full((npr - n, 3), 1e6, x.dtype)], axis=0)
        xw = wrap_coords(xp, box, periodic)
        act = _tile_mask3(xw, jnp.arange(npr) < n, ni, tr, (ni + 1) // 2,
                          float(cutoff), tuple(float(b) for b in box),
                          periodic)
        return jnp.sum(act)

    return int(count(jnp.asarray(x)))


def _compact_pairs(act, ni, njp, cap, corr=None):
    """Compact the (ni, njp) active-tile mask into i-major (il, jc, meta)
    lists of static length ``cap``.  meta bits: 1=active, 2=diagonal,
    4=first visit of this row tile, 8=tile pair can hold an
    (electrode, electrolyte) pair (from ``corr``, same (ni, njp) layout).
    Tail pads replay the last active entry with all bits clear (windows
    stay resident, nothing is written).  Returns (il, jc, meta, count)."""
    flat = act.reshape(-1)                          # i-major: idx = i*njp+jp
    order = jnp.argsort(1 - flat, stable=True)      # actives first, in order
    count = jnp.sum(flat)
    idx = order[:cap]
    valid = jnp.arange(cap) < count
    last = order[jnp.maximum(count - 1, 0)]
    idx = jnp.where(valid, idx, last)
    il = (idx // njp).astype(jnp.int32)
    jp = (idx % njp).astype(jnp.int32)
    jc = ((il + jp) % ni).astype(jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), il[1:] != il[:-1]]) & valid
    meta = (valid.astype(jnp.int32)
            | ((jp == 0).astype(jnp.int32) << 1)
            | (first.astype(jnp.int32) << 2))
    if corr is not None:
        meta = meta | ((corr.reshape(-1)[idx] & valid.astype(jnp.int32)) << 3)
    return il, jc, meta, count


def pair_forces_pallas(x, q, type_idx, tables, exclusions, *, box, periodic,
                       cutoff, g_ewald, qqr2e, tr=256, tc=256, pair_cap=None,
                       zsort=None, order="z", conp_fuse=None, interpret=False):
    """Drop-in equivalent of ops.pairs.dense_pair_forces (same return values).

    ``pair_cap`` bounds the compacted active-tile-pair grid; None means the
    full tile-pair count (always sufficient).  A tighter cap (engines derive
    one from the build-time geometry) shrinks the grid; if the live count
    ever exceeds it the forces come back NaN-poisoned (host-side regrow).

    ``zsort``: optional (perm, z_sorted) from ops.pallas.zorder.z_perm or
    morton_perm — the per-step ordering shared with the electrode-row
    kernels.  When None, one is computed here per ``order`` ("z" for slab
    cells a few cutoffs wide, "morton" for boxes many cutoffs wide in every
    axis — the tile AABB mask then culls in all three axes).

    ``conp_fuse``: optional (ele_flag, elyte_flag, eta_ij, fo_ij) — per-atom
    0/1 flags (n,) plus the (T, T) Gaussian width / overlap type tables.
    When given, the CONP Gaussian correction (the reference's second
    coul_cal neighbor pass, fix_conp.cpp:1467-1573) is fused into the same
    tile sweep — it shares the geometry, the charges, and the one-hot type
    encodings already resident in VMEM — and a FOURTH value ecorr is
    returned (forces already include the correction)."""
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

    # order the atoms so the per-tile bounds are tight (pads sort last);
    # the sort keys wrap coords into [0, L) on periodic axes — the kernel's
    # own minimum image is unaffected (it sees the raw coordinates)
    from .zorder import ORDERINGS, wrap_coords
    if zsort is None:
        zsort = ORDERINGS[order](x, box, periodic)
    perm, zs_n = zsort
    # sentinel far outside every cutoff so pad pairs are out of range
    sentinel = jnp.asarray([1e6, 1e6, 1e6], dtype)
    xp = jnp.concatenate([x[perm], jnp.tile(sentinel, (npad, 1))], axis=0)
    qp = jnp.pad(q[perm], (0, npad))
    tp = jnp.pad(type_idx[perm], (0, npad))
    xw = wrap_coords(xp, box, periodic)
    pvalid = jnp.arange(npr) < n

    # per-row coefficient table [lj1|lj2|lj3|lj4][type_i] : (N', 4T)
    cr = jnp.concatenate([tables.lj1[tp], tables.lj2[tp],
                          tables.lj3[tp], tables.lj4[tp]], axis=1).astype(dtype)
    ohc = (tp[:, None] == jnp.arange(nt1)[None, :]).astype(dtype)

    njp = (ni + 1) // 2
    act = _tile_mask3(xw, pvalid, ni, tr, njp, float(cutoff),
                      tuple(float(b) for b in box), periodic)
    corr_tiles = None
    if conp_fuse is not None:
        ele_f, ely_f, eta_tab, fo_tab = conp_fuse
        flp = jnp.pad(jnp.stack([ele_f[perm], ely_f[perm]], axis=1)
                      .astype(dtype), ((0, npad), (0, 0)))
        gr = jnp.concatenate([jnp.asarray(eta_tab, dtype)[tp],
                              jnp.asarray(fo_tab, dtype)[tp]], axis=1)
        # tile pairs that can hold an (electrode, elyte) pair in either
        # orientation carry meta bit 8 (z-ordering groups the electrode
        # planes into few tiles, so most tiles skip the correction chain)
        he = jnp.any(flp[:, 0].reshape(ni, tr) > 0, axis=1)
        hy = jnp.any(flp[:, 1].reshape(ni, tr) > 0, axis=1)
        ii = jnp.arange(ni)[:, None]
        jj = (ii + jnp.arange(njp)[None, :]) % ni
        corr_tiles = ((he[ii] & hy[jj]) | (hy[ii] & he[jj])).astype(jnp.int32)
    ntp = ni * njp
    cap = ntp if pair_cap is None else min(int(pair_cap), ntp)
    il, jc, meta, count = _compact_pairs(act, ni, njp, cap, corr_tiles)
    kern = functools.partial(
        _kernel, box=tuple(float(b) for b in box), periodic=periodic,
        cutsq=float(cutoff) ** 2, g_ewald=float(g_ewald), qqr2e=float(qqr2e),
        tr=tr, tc=tc, npts=n, nt1=nt1, fuse_corr=conp_fuse is not None)
    rmap = lambda p, il_, jc_, mt_: (il_[p], 0)
    cmap = lambda p, il_, jc_, mt_: (jc_[p], 0)
    # ONE packed per-atom operand serves both the row and the column block
    # (layout documented in _kernel); the kernel is DMA-issue-bound, so
    # collapsing 6-9 small block copies per grid step into 2 is the win
    parts = [cr, ohc]
    if conp_fuse is not None:
        parts.append(gr)
    parts += [xp, qp[:, None]]
    if conp_fuse is not None:
        parts.append(flp)
    packed = jnp.concatenate(parts, axis=1)
    w = packed.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap,),
        in_specs=[pl.BlockSpec((tr, w), rmap), pl.BlockSpec((tc, w), cmap)],
        out_specs=[pl.BlockSpec((tr, 8), rmap),
                   pl.BlockSpec((1, tc, 3), lambda p, il_, jc_, mt_: (p, 0, 0))],
    )
    rowout, fcols = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((npr, 8), dtype),
                   jax.ShapeDtypeStruct((cap, tc, 3), dtype)],
        interpret=interpret,
    )(il, jc, meta, packed, packed)

    # segment-add the per-entry column mirrors onto their column tiles via
    # a one-hot MXU matmul (cap is O(100): cheaper than a scatter)
    onehot = (jnp.arange(ni)[:, None] == jc[None, :]).astype(dtype)
    fcs = jnp.matmul(onehot, fcols.reshape(cap, tc * 3),
                     precision=jax.lax.Precision.HIGHEST)
    fs = rowout[:, :3] + fcs.reshape(npr, 3)
    # fail-loud on capacity overflow: dropped tile pairs would silently
    # corrupt the physics, so poison the forces instead (run() regrows)
    fs = jnp.where(count > cap, jnp.nan, fs)
    # undo the z-sort (pad rows are provably zero: masked in-kernel)
    f = jnp.zeros((n, 3), dtype).at[perm].set(fs[:n])
    ev = jnp.where(count > cap, jnp.nan, jnp.sum(rowout[:n, 3]))
    ec = jnp.where(count > cap, jnp.nan, jnp.sum(rowout[:n, 4]))
    ecorr = None
    if conp_fuse is not None:
        ecorr = jnp.where(count > cap, jnp.nan, jnp.sum(rowout[:n, 5]))

    # exclusion corrections: exact algebraic difference between si=s and
    # si=1, computed in (n, m) layout — the "row" side is every atom in
    # order, so the row gather is a broadcast and the per-atom reduction is
    # a reshape-sum, never a scatter (TPU scatters/gathers are the cost
    # here, not the flops); the (n, m) column gather is the only gather
    exi, exv = exclusions
    m = exi.shape[1]
    sval = exv.astype(dtype)                        # (n, m)
    valid = exi < n
    cols_safe = jnp.where(valid, exi, 0)            # (n, m)
    dx_ = x[:, None, :] - x[cols_safe]              # (n, m, 3)
    boxj = jnp.asarray(box, dtype)
    from ..pairs import min_image
    dx_ = min_image(dx_.reshape(-1, 3), boxj, periodic).reshape(n, m, 3)
    rsq = jnp.sum(dx_ * dx_, axis=2)
    valid = valid & (rsq < cutoff ** 2)
    rsq_safe = jnp.where(valid, rsq, 1.0)
    rinv = jax.lax.rsqrt(rsq_safe)
    r2inv = rinv * rinv
    r6inv = r2inv ** 3
    # per-pair LJ coefficients via a one-hot contraction over the column
    # type instead of a 2-D table gather (types are few, gathers are slow)
    tj = type_idx[cols_safe]                        # (n, m)
    ohj = (tj[..., None] == jnp.arange(nt1)).astype(dtype)   # (n, m, T)
    rowtab = jnp.stack([tables.lj1, tables.lj2, tables.lj3, tables.lj4],
                       axis=0).astype(dtype)[:, type_idx]    # (4, n, T)
    l1, l2, l3, l4 = jnp.einsum('knt,nmt->knm', rowtab, ohj)
    ds = (sval - 1.0)
    dflj = ds * r6inv * (l1 * r6inv - l2) * r2inv
    delj = ds * r6inv * (l3 * r6inv - l4)
    pref = (qqr2e * rinv) * q[:, None] * q[cols_safe]
    dfcoul = ds * pref            # -(1-s)*prefactor, both force and energy
    decoul = ds * pref
    dfpair = jnp.where(valid, dflj + dfcoul * r2inv, 0.0)
    f = f + jnp.sum(dfpair[..., None] * dx_, axis=1)
    ev = ev + 0.5 * jnp.sum(jnp.where(valid, delj, 0.0))
    ec = ec + 0.5 * jnp.sum(jnp.where(valid, decoul, 0.0))
    if conp_fuse is not None:
        return f, ev, ec, ecorr
    return f, ev, ec
