"""Virial / pressure diagnostic.

The reference books its correction-force virial through LAMMPS ev_tally
(fix_conp.cpp:1436) and lets LAMMPS assemble the pressure; here the whole
virial is computed in one place.  Scalar (isotropic) virial:

    W = sum_pairs f_ij . r_ij            (pair, bonded, conp correction)
      + W_kspace                         (Ewald: standard k-space virial)
      + W_self/background/slab

    P = (N_dof k T + W) / (3 V)   — LAMMPS convention:
    P = (2 KE + W) / (3 V) in energy units * nktv2p.

Implemented for the Ewald force path (the PPPM path can use the same
k-space formula since the physics is identical at convergence).  Validated
against the numerical volume derivative P = -dE/dV at fixed fractional
coordinates (tests/test_pressure.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.pairs import min_image


def pair_virial_scalar(x, q, type_idx, tables, exclusions, *, box, periodic,
                       cutoff, g_ewald, qqr2e, block=512):
    """Scalar pair virial W = sum_(i<j) f_ij . r_ij for LJ + real-space
    Coulomb incl. exclusion corrections.  Returns W (no volume factor)."""
    import jax

    from ..ops.pairs import _pad_rows
    n = x.shape[0]
    exi, exv = exclusions
    block = min(block, n)
    nb, pad = _pad_rows(n, block)
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    qp = jnp.pad(q, (0, pad))
    tp = jnp.pad(type_idx, (0, pad))
    exip = jnp.pad(exi, ((0, pad), (0, 0)), constant_values=n)
    exvp = jnp.pad(exv, ((0, pad), (0, 0)))
    rowvalid = jnp.pad(jnp.ones(n, bool), (0, pad))

    # W = sum_i x_i . f_i is not translation invariant under PBC; instead
    # accumulate sum_pairs fpair * rsq per row block (arithmetic mirrors
    # ops/pairs.py::pair_rowblock conventions)
    from ..ops.erfc import EWALD_F
    cutsq = cutoff * cutoff
    boxj = jnp.asarray(box, x.dtype)
    idx_all = jnp.arange(n)

    def wblock(w, blk):
        xi, qi, ti, ei, evl, rv, i0 = blk
        bsz = xi.shape[0]
        si = jnp.ones((bsz, n), x.dtype).at[
            jnp.arange(bsz)[:, None], ei].set(evl.astype(x.dtype), mode="drop")
        dx = min_image(xi[:, None, :] - x[None, :, :], boxj, periodic)
        rsq = jnp.sum(dx * dx, axis=-1)
        iidx = i0 + jnp.arange(bsz)
        inrange = (rsq < cutsq) & (iidx[:, None] != idx_all[None, :]) & rv[:, None]
        rsq_safe = jnp.where(inrange, rsq, 1.0)
        r2inv = 1.0 / rsq_safe
        r6inv = r2inv ** 3
        mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
        oh = tables.onehot.T
        l1 = mm(tables.lj1[ti], oh)
        l2 = mm(tables.lj2[ti], oh)
        flj = jnp.where(inrange & (si > 0), si * r6inv * (l1 * r6inv - l2) * r2inv, 0.0)
        r = jnp.sqrt(rsq_safe)
        grij = g_ewald * r
        expm2 = jnp.exp(-grij * grij)
        t = 1.0 / (1.0 + 0.3275911 * grij)
        erfc = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                    + t * (-1.453152027 + t * 1.061405429)))) * expm2
        pref = qqr2e * qi[:, None] * q[None, :] / r
        fcoul = pref * (erfc + EWALD_F * grij * expm2) - (1.0 - si) * pref
        fcoul = jnp.where(inrange, fcoul, 0.0)
        fpair = flj + fcoul * r2inv
        return w + 0.5 * jnp.sum(fpair * rsq), None

    m = exi.shape[1]
    w, _ = jax.lax.scan(
        wblock, jnp.zeros((), x.dtype),
        (xp.reshape(nb, block, 3), qp.reshape(nb, block), tp.reshape(nb, block),
         exip.reshape(nb, block, m), exvp.reshape(nb, block, m),
         rowvalid.reshape(nb, block), jnp.arange(nb) * block))
    return w


def bonded_virial_scalar(x, bonds, bond_coeffs, angles, angle_coeffs, *,
                         box, periodic):
    """W for harmonic bonds (angles are pure three-body angular terms whose
    scalar virial comes from the same f.r sum; computed from forces)."""
    w = jnp.zeros((), x.dtype)
    boxj = jnp.asarray(box, x.dtype)
    if bonds.shape[0]:
        bt, i, j = bonds[:, 0], bonds[:, 1], bonds[:, 2]
        k = bond_coeffs[bt, 0]
        r0 = bond_coeffs[bt, 1]
        dx = min_image(x[i] - x[j], boxj, periodic)
        r = jnp.sqrt(jnp.sum(dx * dx, axis=1))
        fmag = -2.0 * k * (r - r0)      # along r-hat
        w = w + jnp.sum(fmag * r)
    # harmonic-angle energy depends only on theta, which is invariant under
    # uniform dilation -> zero contribution to the ISOTROPIC virial
    return w


def kspace_virial_scalar(fk, x, q):
    """Isotropic Ewald k-space virial (standard formula):

    W = sum_k u_k |S_k|^2 (3 - 2(1 + k^2/4g^2)) ... trace of the tensor:
    tr = |S|^2 u_k [3 - (3 + k^2/(2g^2) - ... ] — for the isotropic scalar:
    W_kspace = sum_k u_k |S|^2 (1 - k^2/(2 g^2)) * ... derived from
    dE/dlnV at fixed fractional coordinates:
      E = sum_k (4pi/2V') |S|^2 e^{-k^2/4g^2}/k^2 * 2 (half-space)
      k ~ V^{-1/3}: d|k|^2/dlnV = -2/3 k^2
      dE/dlnV = sum_k u|S|^2 [ -1 + (2/3)(k^2/4g^2) + (2/3) ]
    so W = -3 dE/dlnV = sum_k u|S|^2 [1 - k^2/(2g^2)] (+ the |S|^2
    fractional-coordinate invariance).  Validated numerically in tests."""
    import jax

    from ..ops import ewald_factored as ewf
    sr, si = ewf.structure_factor_f(fk, x, q)
    ug = jnp.asarray(fk.ug, x.dtype)
    ux, uy, uz = fk.unitk
    kx = jnp.asarray(fk.kxy[:, 0], x.dtype) * ux
    ky = jnp.asarray(fk.kxy[:, 1], x.dtype) * uy
    kz = jnp.asarray(fk.kz, x.dtype) * uz
    ksq = (kx ** 2 + ky ** 2)[:, None] + (kz ** 2)[None, :]
    s2 = sr * sr + si * si
    g = fk.g_ewald
    return jnp.sum(ug * s2 * (1.0 - ksq / (2.0 * g * g)))


def pressure_scalar(engine, state):
    """Isotropic pressure in atmospheres (units real): P = (2KE + W)/(3V) * nktv2p.

    Ewald force path only (PPPM users: same physics, use Ewald diagnostics).
    """
    sys = engine.system
    u = sys.units()
    x, q, v = state.x, state.q, state.v
    w = pair_virial_scalar(
        x, q, engine.type_idx, engine.tables, engine.exclusions,
        box=engine.ksp_force.box, periodic=sys.periodic,
        cutoff=engine.md.cutoff, g_ewald=engine.ksp_force.g_ewald,
        qqr2e=u.qqr2e)
    w = w + bonded_virial_scalar(
        x, jnp.asarray(sys.bonds), jnp.asarray(sys.bond_coeffs),
        jnp.asarray(sys.angles), jnp.asarray(sys.angle_coeffs),
        box=engine.ksp_force.box, periodic=sys.periodic)
    if engine.fksp is not None:
        w = w + u.qqr2e * kspace_virial_scalar(engine.fksp, x, q)
        # self/background terms: E ~ 1/V^0 (self) and 1/V (background)
        g = engine.ksp_force.g_ewald
        qsum = jnp.sum(q)
        w = w + 3.0 * u.qqr2e * math.pi / (2 * g * g * engine.ksp_force.volume) * qsum * qsum
    ke2 = u.mvv2e * jnp.sum(jnp.asarray(sys.mass)[:, None] * v * v)
    vol = engine.ksp_force.box[0] * engine.ksp_force.box[1] * engine.ksp_force.box[2]
    nktv2p = 68568.415  # LAMMPS real units pressure conversion
    return (ke2 + w) / (3.0 * vol) * nktv2p
