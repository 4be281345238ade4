"""Pallas TPU kernels for SHAKE / RATTLE constraint iteration.

The XLA cluster-batched path (models/shake.py) is latency-bound: 12
Gauss-Seidel sweeps x C constraint slots of tiny (M,3) ops cost ~1.4 ms on
il_twolayer — a third of the whole step.  The entire constraint state
(M clusters x K<=4 atoms x 3 coords, ~11 KB at il scale) fits in VMEM, so
one kernel runs ALL iterations in registers: inputs in, converged positions
out, ~20 us.

Layout: clusters along the 128-lane axis (M padded to 128); cluster-local
atom columns K and constraint slots C are unrolled Python loops (K<=4,
C<=6).  Gathers/scatters to the global (N,3) arrays stay outside in XLA
(two ops per call).  Math is bit-identical to the XLA path: same
Gauss-Seidel slot order, same masking, same omega.

Reference: LAMMPS fix shake (SURVEY.md section 7 'hard parts' #1); the
reference gets SHAKE from host LAMMPS, so this kernel has no counterpart
file — cited behavior is fix_shake.cpp's cluster constraint semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _pack(cons):
    """Host-side static layout: lane-major constraint tables.

    Returns dict of numpy arrays with M padded to a multiple of 128:
      ohi, ohj   (C, K, Mp) one-hot cluster-local column selectors
      invmi/j    (C, Mp), invm_sum (C, Mp)
      dist2      (C, Mp), cmask (C, Mp) as float 0/1
    """
    atoms = np.asarray(cons.atoms)
    M, K = atoms.shape
    C = np.asarray(cons.ci).shape[1]
    Mp = -(-M // 128) * 128
    pad = Mp - M

    def padlane(a, val=0.0):
        return np.pad(np.asarray(a, np.float64), [(0, 0)] * (a.ndim - 1)
                      + [(0, pad)], constant_values=val)

    ci = np.asarray(cons.ci)          # (M, C)
    cj = np.asarray(cons.cj)
    ohi = np.zeros((C, K, M))
    ohj = np.zeros((C, K, M))
    for s in range(C):
        ohi[s, ci[:, s], np.arange(M)] = 1.0
        ohj[s, cj[:, s], np.arange(M)] = 1.0
    invm = np.asarray(cons.invm)      # (M, K)
    invmi = np.take_along_axis(invm, ci, axis=1).T    # (C, M)
    invmj = np.take_along_axis(invm, cj, axis=1).T
    return dict(
        M=M, Mp=Mp, K=K, C=C,
        ohi=padlane(ohi), ohj=padlane(ohj),
        invmi=padlane(invmi), invmj=padlane(invmj),
        invm_sum=padlane(invmi + invmj),
        dist2=padlane(np.asarray(cons.dist2).T, val=1.0),
        cmask=padlane(np.asarray(cons.cmask).T.astype(np.float64)),
    )


def get_pack(cons):
    # cons is a frozen dataclass holding device arrays; key by identity
    if not hasattr(cons, "_pallas_pack"):
        object.__setattr__(cons, "_pallas_pack", _pack(cons))
    return cons._pallas_pack


def _mi(da, L, periodic_ax):
    if periodic_ax:
        return da - L * jnp.round(da * (1.0 / L))
    return da


def _shake_kernel(xc_ref, rold_ref, ohi_ref, ohj_ref, invmi_ref, invmj_ref,
                  isum_ref, dist2_ref, cmask_ref, out_ref, *,
                  K, C, iters, omega, box, periodic):
    xc = [[xc_ref[k * 3 + a, :] for a in range(3)] for k in range(K)]
    rold = [[rold_ref[s * 3 + a, :] for a in range(3)] for s in range(C)]
    ohi = [[ohi_ref[s * K + k, :] for k in range(K)] for s in range(C)]
    ohj = [[ohj_ref[s * K + k, :] for k in range(K)] for s in range(C)]
    invmi = [invmi_ref[s, :] for s in range(C)]
    invmj = [invmj_ref[s, :] for s in range(C)]
    isum = [isum_ref[s, :] for s in range(C)]
    dist2 = [dist2_ref[s, :] for s in range(C)]
    cmask = [cmask_ref[s, :] for s in range(C)]

    for _ in range(iters):
        for s in range(C):
            rn = []
            for a in range(3):
                acc = None
                for k in range(K):
                    t = (ohi[s][k] - ohj[s][k]) * xc[k][a]
                    acc = t if acc is None else acc + t
                rn.append(_mi(acc, box[a], periodic[a]))
            diff = rn[0] * rn[0] + rn[1] * rn[1] + rn[2] * rn[2] - dist2[s]
            dot = rn[0] * rold[s][0] + rn[1] * rold[s][1] + rn[2] * rold[s][2]
            denom = 2.0 * isum[s] * dot
            denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
            lam = (omega * cmask[s]) * diff / denom
            for a in range(3):
                corr = lam * rold[s][a]
                ci_c = invmi[s] * corr
                cj_c = invmj[s] * corr
                for k in range(K):
                    xc[k][a] = xc[k][a] - ohi[s][k] * ci_c + ohj[s][k] * cj_c

    for k in range(K):
        for a in range(3):
            out_ref[k * 3 + a, :] = xc[k][a]


def _rattle_kernel(vc_ref, r_ref, denom_ref, ohi_ref, ohj_ref,
                   invmi_ref, invmj_ref, cmask_ref, out_ref, *,
                   K, C, iters, omega):
    vc = [[vc_ref[k * 3 + a, :] for a in range(3)] for k in range(K)]
    r = [[r_ref[s * 3 + a, :] for a in range(3)] for s in range(C)]
    ohi = [[ohi_ref[s * K + k, :] for k in range(K)] for s in range(C)]
    ohj = [[ohj_ref[s * K + k, :] for k in range(K)] for s in range(C)]
    invmi = [invmi_ref[s, :] for s in range(C)]
    invmj = [invmj_ref[s, :] for s in range(C)]
    denom = [denom_ref[s, :] for s in range(C)]
    cmask = [cmask_ref[s, :] for s in range(C)]

    for _ in range(iters):
        for s in range(C):
            vij = []
            for a in range(3):
                acc = None
                for k in range(K):
                    t = (ohi[s][k] - ohj[s][k]) * vc[k][a]
                    acc = t if acc is None else acc + t
                vij.append(acc)
            dot = vij[0] * r[s][0] + vij[1] * r[s][1] + vij[2] * r[s][2]
            mu = (omega * cmask[s]) * dot / denom[s]
            for a in range(3):
                corr = mu * r[s][a]
                ci_c = invmi[s] * corr
                cj_c = invmj[s] * corr
                for k in range(K):
                    vc[k][a] = vc[k][a] - ohi[s][k] * ci_c + ohj[s][k] * cj_c

    for k in range(K):
        for a in range(3):
            out_ref[k * 3 + a, :] = vc[k][a]


def _lanes(arr_mk3, Mp):
    """(M, K, 3) -> (K*3, Mp) lane-major."""
    M, K, _ = arr_mk3.shape
    out = jnp.transpose(arr_mk3, (1, 2, 0)).reshape(K * 3, M)
    return jnp.pad(out, ((0, 0), (0, Mp - M)))


def shake_positions_pallas(cons, x_new, x_old, dt, *, box, periodic,
                           iters=12, omega=1.0, interpret=False):
    """Drop-in for models.shake.shake_positions (TPU f32 path)."""
    from ..pairs import min_image
    pk = get_pack(cons)
    M, Mp, K, C = pk["M"], pk["Mp"], pk["K"], pk["C"]
    dtype = x_new.dtype
    boxj = jnp.asarray(box, dtype)

    xc = _lanes(x_new[cons.atoms], Mp)                    # (K*3, Mp)
    xo = x_old[cons.atoms]                                # (M, K, 3)
    # reference bond vectors per slot from pre-drift positions
    rold = []
    ci = cons.ci
    cj = cons.cj
    for s in range(C):
        ri = jnp.take_along_axis(xo, ci[:, s][:, None, None].repeat(3, -1), 1)[:, 0]
        rj = jnp.take_along_axis(xo, cj[:, s][:, None, None].repeat(3, -1), 1)[:, 0]
        rold.append(min_image(ri - rj, boxj, periodic))   # (M, 3)
    rold = jnp.stack(rold, axis=1)                        # (M, C, 3)
    rold_l = _lanes(rold, Mp)                             # (C*3, Mp)

    consts = [jnp.asarray(pk[k], dtype) for k in
              ("ohi", "ohj", "invmi", "invmj", "invm_sum", "dist2", "cmask")]
    ohi_l = consts[0].reshape(C * K, Mp)
    ohj_l = consts[1].reshape(C * K, Mp)

    kern = functools.partial(
        _shake_kernel, K=K, C=C, iters=iters, omega=omega,
        box=tuple(float(b) for b in box), periodic=periodic)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K * 3, Mp), dtype),
        interpret=interpret,
    )(xc, rold_l, ohi_l, ohj_l, consts[2], consts[3], consts[4],
      consts[5], consts[6])

    xc_new = jnp.transpose(out[:, :M].reshape(K, 3, M), (2, 0, 1))  # (M,K,3)
    flat_idx = jnp.where(cons.amask, cons.atoms, x_new.shape[0])
    x = x_new.at[flat_idx.reshape(-1)].set(xc_new.reshape(-1, 3), mode="drop")
    dv = (x - x_new) / dt
    return x, dv


def rattle_velocities_pallas(cons, x, v, *, box, periodic, iters=12,
                             omega=1.0, interpret=False):
    """Drop-in for models.shake.rattle_velocities (TPU f32 path)."""
    from ..pairs import min_image
    pk = get_pack(cons)
    M, Mp, K, C = pk["M"], pk["Mp"], pk["K"], pk["C"]
    dtype = x.dtype
    boxj = jnp.asarray(box, dtype)

    xc = x[cons.atoms]
    vc = _lanes(v[cons.atoms], Mp)
    ci = cons.ci
    cj = cons.cj
    isum = jnp.asarray(pk["invm_sum"], dtype)
    r = []
    denom = []
    for s in range(C):
        ri = jnp.take_along_axis(xc, ci[:, s][:, None, None].repeat(3, -1), 1)[:, 0]
        rj = jnp.take_along_axis(xc, cj[:, s][:, None, None].repeat(3, -1), 1)[:, 0]
        rs = min_image(ri - rj, boxj, periodic)           # (M, 3)
        r.append(rs)
        dn = jnp.pad(jnp.sum(rs * rs, axis=1), (0, Mp - M)) * isum[s]
        denom.append(jnp.where(dn > 1e-12, dn, 1e-12))
    r_l = _lanes(jnp.stack(r, axis=1), Mp)                # (C*3, Mp)
    denom_l = jnp.stack(denom, axis=0)                    # (C, Mp)

    consts = [jnp.asarray(pk[k], dtype) for k in
              ("ohi", "ohj", "invmi", "invmj", "cmask")]
    ohi_l = consts[0].reshape(C * K, Mp)
    ohj_l = consts[1].reshape(C * K, Mp)

    kern = functools.partial(_rattle_kernel, K=K, C=C, iters=iters,
                             omega=omega)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K * 3, Mp), dtype),
        interpret=interpret,
    )(vc, r_l, denom_l, ohi_l, ohj_l, consts[2], consts[3], consts[4])

    vc_new = jnp.transpose(out[:, :M].reshape(K, 3, M), (2, 0, 1))
    flat_idx = jnp.where(cons.amask, cons.atoms, x.shape[0])
    return v.at[flat_idx.reshape(-1)].set(vc_new.reshape(-1, 3), mode="drop")
