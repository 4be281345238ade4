"""Mosaic kernel for the block-union Verlet pair sweep.

The block form of the neighbor list (ops/neighbors.py _attach_block_list:
i-blocks of B = 8 cell-sorted atoms share the sorted-unique union of their
(N, K) rows) cuts the hot gather to ~3.5x fewer descriptors than the
per-atom list — but in XLA the (NB, B, U) masked pair chain materializes
its intermediates in HBM and returns the whole saving (measured parity,
14.13 vs 13.94 ms at 100k; VALIDATION.md round-3a).  This kernel runs the
chain in VMEM: per grid step it loads G blocks' union rows (already
gathered OUTSIDE — the only descriptor-rate cost left), the block atoms,
the per-atom LJ coefficient rows + union types (the (4, NB, B, U)
pre-typed planes are ~240 MB of HBM stream at 100k; expanding them from
types in VMEM costs 4*nt masked FMAs and cut the kernel 10.0 -> 6.2 ms)
and the id rows for masking, and emits per-atom forces + per-atom energy
partials.  Every array in the chain is (G, B, U) with B x U = one native
(8, 128) f32 vreg per block.

Pair physics is identical to ops/neighbors.py nlist_pair_rows /
block_pair_forces (LAMMPS pair_lj_cut_coul_long compute(), the A&S 7.1.26
erfc; reference fix_conp.cpp:1242-1276 sweeps the same list).  Energies
carry the full-list 0.5.
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


# shared with the XLA twin in ops/neighbors.py so the oracle comparison is
# exact (ADVICE r4: a local 5.6^2 here diverged from the twin's 5.8^2 for
# eta*r in [5.6, 5.8))
_ERFC_MAX_SQ = ERFC_MAX * ERFC_MAX


def _kernel(xu_ref, xi_ref, un_ref, rows_ref, cr_ref, tu_ref, cf_ref,
            out_ref, *, box, periodic, cutsq, g_ewald, qqr2e, npts, gb,
            bsz, usz, nt1, fuse_corr):
    # Component/plane axes sit BEFORE the tiled (sublane, lane) pair and are
    # indexed statically on the ref: a middle-axis index on a loaded value
    # lowers to an unsupported >2-D gather in Mosaic.
    f32 = jnp.float32
    un = un_ref[0]                      # (G, U) int32
    rows = rows_ref[0]                  # (G, B) int32
    tu = tu_ref[0]                      # (G, U) int32 union types

    rsq = jnp.zeros((gb, bsz, usz), f32)
    d = []
    for c in range(3):
        dc = xi_ref[0, c][:, :, None] - xu_ref[0, c][:, None, :]  # (G, B, U)
        if periodic[c]:
            L = f32(box[c])
            dc = dc - L * jnp.round(dc * f32(1.0 / box[c]))
        d.append(dc)
        rsq = rsq + dc * dc
    mask = ((un[:, None, :] != rows[:, :, None])
            & (un[:, None, :] < npts) & (rows[:, :, None] < npts)
            & (rsq < f32(cutsq)))
    rsq_safe = jnp.where(mask, rsq, f32(1.0))
    r2inv = f32(1.0) / rsq_safe
    r6inv = r2inv * r2inv * r2inv
    zero = jnp.zeros((), f32)
    # expand the pre-typed LJ planes in VMEM: 4*nt masked FMAs replace a
    # (4, NB, B, U) HBM plane stream (~240 MB/step at 100k)
    l1 = jnp.zeros((gb, bsz, usz), f32)
    l2 = jnp.zeros((gb, bsz, usz), f32)
    l3 = jnp.zeros((gb, bsz, usz), f32)
    l4 = jnp.zeros((gb, bsz, usz), f32)
    for t in range(nt1):
        mt = (tu[:, None, :] == t).astype(f32)           # (G, 1->B, U)
        l1 = l1 + cr_ref[0, 0, t][:, :, None] * mt
        l2 = l2 + cr_ref[0, 1, t][:, :, None] * mt
        l3 = l3 + cr_ref[0, 2, t][:, :, None] * mt
        l4 = l4 + cr_ref[0, 3, t][:, :, None] * mt
    flj = jnp.where(mask, r6inv * (l1 * r6inv - l2) * r2inv, zero)
    elj = jnp.where(mask, r6inv * (l3 * r6inv - l4), zero)
    r = jnp.sqrt(rsq_safe)
    grij = f32(g_ewald) * r
    expm2 = jnp.exp(-grij * grij)
    tt = f32(1.0) / (f32(1.0) + f32(EWALD_P) * grij)
    erfc = tt * (f32(A1) + tt * (f32(A2) + tt * (
        f32(A3) + tt * (f32(A4) + tt * f32(A5))))) * expm2
    pref = (f32(qqr2e) * xi_ref[0, 3][:, :, None]
            * xu_ref[0, 3][:, None, :] / r)
    fcoul = jnp.where(mask, pref * (erfc + f32(EWALD_F) * grij * expm2),
                      zero)
    ecoul = jnp.where(mask, pref * erfc, zero)
    fpair = flj + fcoul * r2inv
    # base sweep write is UNCONDITIONAL and identical to the unfused
    # kernel — restructuring it under pl.when measurably slowed the hot
    # path (14.7 vs 12.3 ms at 100k); the fused correction ADDS into the
    # same output block on the gated steps only
    outs = [jnp.sum(fpair * dc, axis=2).reshape(1, gb * bsz) for dc in d]
    outs.append(jnp.sum(elj, axis=2).reshape(1, gb * bsz))
    outs.append(jnp.sum(ecoul, axis=2).reshape(1, gb * bsz))
    outs.append(jnp.zeros((3, gb * bsz), f32))
    out_ref[0] = jnp.concatenate(outs, axis=0)          # (8, G*B)
    if not fuse_corr:
        return

    # ---- fused CONP Gaussian correction (fix_conp.cpp:1368-1444 as a
    # second masked chain on the SAME (G, B, U) slots; the math mirrors
    # ops/pallas/pair_kernel.py's fused path, which is pinned against the
    # XLA twins).  In the full block list every (ele, elyte) pair appears
    # in both atoms' rows, so forces are row-local and the energy carries
    # the full-list 0.5 at the caller.  The chain is gated per grid step
    # (cf_ref) — cell-sorted electrode planes concentrate in few blocks,
    # so ~99% of steps skip it entirely.  The ele/ely flags ride ONE
    # packed channel (+1 electrode / -1 electrolyte / 0 neither): a
    # correction pair is exactly a NEGATIVE flag product.
    @pl.when(cf_ref[pl.program_id(0)] != 0)
    def _():
        # per-pair eta/fo from the row atoms' type rows x union-type mask
        etap = jnp.zeros((gb, bsz, usz), f32)
        fop = jnp.zeros((gb, bsz, usz), f32)
        for t in range(nt1):
            mt = (tu[:, None, :] == t).astype(f32)
            etap = etap + cr_ref[0, 4, t][:, :, None] * mt
            fop = fop + cr_ref[0, 5, t][:, :, None] * mt
        cm = mask & ((xi_ref[0, 4][:, :, None]
                      * xu_ref[0, 4][:, None, :]) < zero)
        e2 = etap * etap * rsq_safe
        ghalf = jnp.exp(f32(-0.5) * e2)
        em2 = ghalf * ghalf               # exp(-e2): one transcendental
        safe = jnp.maximum(e2, f32(1e-30))
        rs = jax.lax.rsqrt(safe)
        ar = safe * rs                    # sqrt(e2)
        t2 = f32(1.0) / (f32(1.0) + f32(EWALD_P) * ar)
        erfcr = (t2 * (f32(A1) + t2 * (f32(A2) + t2 * (
            f32(A3) + t2 * (f32(A4) + t2 * f32(A5))))) * em2 * rs)
        inmax = e2 < f32(_ERFC_MAX_SQ)
        erfcr = jnp.where(inmax, erfcr, zero)
        gexp = fop * ghalf
        ekc = gexp - erfcr * etap
        ferfcr = jnp.where(inmax, erfcr + f32(EWALD_F) * em2, zero)
        fkc = e2 * gexp - ferfcr * etap
        cpref = (f32(qqr2e) * xi_ref[0, 3][:, :, None]
                 * xu_ref[0, 3][:, None, :])
        ecp = jnp.where(cm, cpref * ekc, zero)
        fcp = jnp.where(cm, cpref * fkc, zero) * r2inv
        adds = [jnp.sum(fcp * dc, axis=2).reshape(1, gb * bsz) for dc in d]
        adds.append(jnp.zeros((2, gb * bsz), f32))
        adds.append(jnp.sum(ecp, axis=2).reshape(1, gb * bsz))
        adds.append(jnp.zeros((2, gb * bsz), f32))
        out_ref[0] = out_ref[0] + jnp.concatenate(adds, axis=0)


def block_pair_pallas(xqu, xqi, un, rows, bcr, btu, *, box, periodic,
                      cutoff, g_ewald, qqr2e, npts, gblocks=16,
                      interpret=False):
    """Per-atom (cell-sorted order) forces and energy partials from the
    block-union list.

    xqu: (NB, U, C) gathered union rows [x, y, z, q (, flag)]
    xqi: (NB, B, C) block atom rows — C=5 fuses the CONP Gaussian
         correction into the sweep (the extra channel packs the
         electrode/electrolyte flag: +1 ele / -1 ely / 0 neither)
    un/rows: (NB, U)/(NB, B) int32 atom ids (n = pad sentinel)
    bcr: (P, NB, B, nt+1) coefficient rows per block atom and type —
         P=4 LJ planes, or P=6 with the eta/fo rows appended (fused mode)
    btu: (NB, U) int32 union neighbor types
    Returns (f (NB*B, 3), elj_sum, ecoul_sum[, ecorr_sum]) in block-row
    order; caller applies binv, the 0.5 energy factors and exclusion
    corrections (ecorr_sum only in fused mode, raw double-counted sum).
    """
    nb, usz, nch = xqu.shape
    bsz = xqi.shape[1]
    nplanes = bcr.shape[0]
    nt1 = bcr.shape[-1]
    fuse_corr = nch == 5
    assert nplanes == (6 if fuse_corr else 4)
    gb = gblocks
    nbp = -(-nb // gb) * gb
    pad = nbp - nb
    if pad:
        n_i32 = jnp.full((pad, usz), npts, un.dtype)
        un = jnp.concatenate([un, n_i32], axis=0)
        rows = jnp.concatenate(
            [rows, jnp.full((pad, bsz), npts, rows.dtype)], axis=0)
        # pad rows: sentinel positions/charges; FLAG channels must pad 0
        # (a 1e6 flag would enable the correction mask on pad slots)
        padu = jnp.full((pad, usz, nch), 1e6, xqu.dtype)
        padi = jnp.full((pad, bsz, nch), 1e6, xqi.dtype)
        if fuse_corr:
            padu = padu.at[:, :, 4:].set(0.0)
            padi = padi.at[:, :, 4:].set(0.0)
        xqu = jnp.concatenate([xqu, padu], axis=0)
        xqi = jnp.concatenate([xqi, padi], axis=0)
        bcr = jnp.concatenate(
            [bcr, jnp.zeros((nplanes, pad, bsz, nt1), bcr.dtype)], axis=1)
        btu = jnp.concatenate(
            [btu, jnp.zeros((pad, usz), btu.dtype)], axis=0)
    nsteps = nbp // gb
    xu_t = (xqu.transpose(0, 2, 1).reshape(nsteps, gb, nch, usz)
            .transpose(0, 2, 1, 3))                      # (T, C, G, U)
    xi_t = (xqi.transpose(0, 2, 1).reshape(nsteps, gb, nch, bsz)
            .transpose(0, 2, 1, 3))                      # (T, C, G, B)
    un_r = un.reshape(nsteps, gb, usz)
    rows_r = rows.reshape(nsteps, gb, bsz)
    cr_r = (bcr.transpose(0, 3, 1, 2)                    # (P, nt, NB, B)
            .reshape(nplanes, nt1, nsteps, gb, bsz).transpose(2, 0, 1, 3, 4))
    tu_r = btu.reshape(nsteps, gb, usz)
    if fuse_corr:
        # per-grid-step correction gate: only steps whose blocks can hold
        # an (electrode, elyte) pair run the second chain (~1% of steps at
        # production electrode fractions under cell-sorted ordering)
        be = jnp.any(xqi[:, :, 4] > 0, axis=1).reshape(nsteps, gb)
        by = jnp.any(xqi[:, :, 4] < 0, axis=1).reshape(nsteps, gb)
        ue = jnp.any(xqu[:, :, 4] > 0, axis=1).reshape(nsteps, gb)
        uy = jnp.any(xqu[:, :, 4] < 0, axis=1).reshape(nsteps, gb)
        cf = jnp.any((be & uy) | (by & ue), axis=1).astype(jnp.int32)
    else:
        cf = jnp.zeros((nsteps,), jnp.int32)

    kern = functools.partial(
        _kernel, box=tuple(float(b) for b in box), periodic=periodic,
        cutsq=float(cutoff) ** 2, g_ewald=float(g_ewald),
        qqr2e=float(qqr2e), npts=npts, gb=gb, bsz=bsz, usz=usz, nt1=nt1,
        fuse_corr=fuse_corr)
    out = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, nch, gb, usz), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nch, gb, bsz), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gb, usz), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gb, bsz), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nplanes, nt1, gb, bsz),
                         lambda t: (t, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gb, usz), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole (T,) vector in SMEM (rank-1 SMEM blocks must cover
            # the array); the kernel indexes it by program_id
            pl.BlockSpec((nsteps,), lambda t: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, gb * bsz), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps, 8, gb * bsz), xqu.dtype),
        cost_estimate=pl.CostEstimate(
            flops=nbp * bsz * usz * (40 + 8 * nt1),
            bytes_accessed=xqu.size * 4 + bcr.size * 4 + btu.size * 4,
            transcendentals=nbp * bsz * usz),
        interpret=interpret,
    )(xu_t, xi_t, un_r, rows_r, cr_r, tu_r, cf)
    f = out[:, :3, :].transpose(0, 2, 1).reshape(nbp * bsz, 3)[:nb * bsz]
    elj = jnp.sum(out[:, 3, :])
    ecoul = jnp.sum(out[:, 4, :])
    if fuse_corr:
        return f, elj, ecoul, jnp.sum(out[:, 5, :])
    return f, elj, ecoul
