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


_VOIGT = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))


def pair_virial_tensor(x, q, type_idx, tables, exclusions, *, box, periodic,
                       cutoff, g_ewald, qqr2e, elecheck=None, kernels=None,
                       block=512):
    """Per-pair virial tensor W_ab = sum_(i<j) f_ij,a r_ij,b (Voigt 6-vector
    xx yy zz xy xz yz) for LJ + real-space Coulomb + exclusion corrections,
    and — when ``elecheck``/``kernels`` are given — the CONP Gaussian
    correction force (the reference's ev_tally bookkeeping,
    fix_conp.cpp:1436)."""
    from ..ops.erfc import EWALD_F
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
    ecp = (jnp.pad(elecheck, (0, pad)) if elecheck is not None else None)
    is_ele = (elecheck != 0) if elecheck is not None else None

    cutsq = cutoff * cutoff
    boxj = jnp.asarray(box, x.dtype)
    idx_all = jnp.arange(n)

    def wblock(w, blk):
        xi, qi, ti, ei, evl, rv, ec_i, i0 = blk
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
        flj = jnp.where(inrange & (si > 0),
                        si * r6inv * (l1 * r6inv - l2) * r2inv, 0.0)
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
        if kernels is not None:
            # CONP Gaussian correction on ele<->elyte pairs
            xor = (ec_i[:, None] != 0) ^ is_ele[None, :]
            fk = kernels.force(rsq_safe, ti[:, None], type_idx[None, :])
            fpair = fpair + jnp.where(
                inrange & xor, qqr2e * qi[:, None] * q[None, :] * fk * r2inv,
                0.0)
        comps = [0.5 * jnp.sum(fpair * dx[:, :, a] * dx[:, :, b])
                 for (a, b) in _VOIGT]
        return w + jnp.stack(comps), None

    m = exi.shape[1]
    ec_blocks = (ecp.reshape(nb, block) if ecp is not None
                 else jnp.zeros((nb, block), jnp.int32))
    w, _ = jax.lax.scan(
        wblock, jnp.zeros(6, x.dtype),
        (xp.reshape(nb, block, 3), qp.reshape(nb, block), tp.reshape(nb, block),
         exip.reshape(nb, block, m), exvp.reshape(nb, block, m),
         rowvalid.reshape(nb, block), ec_blocks, jnp.arange(nb) * block))
    return w


def bonded_virial_tensor(x, bonds, bond_coeffs, angles, angle_coeffs, *,
                         box, periodic):
    """Voigt virial tensor for harmonic bonds + angles (f1.d1 + f3.d2 —
    the standard three-body decomposition LAMMPS tallies)."""
    w = jnp.zeros(6, x.dtype)
    boxj = jnp.asarray(box, x.dtype)
    if bonds.shape[0]:
        bt, i, j = bonds[:, 0], bonds[:, 1], bonds[:, 2]
        k = bond_coeffs[bt, 0]
        r0 = bond_coeffs[bt, 1]
        dx = min_image(x[i] - x[j], boxj, periodic)
        r = jnp.sqrt(jnp.sum(dx * dx, axis=1))
        fbr = -2.0 * k * (r - r0) / r      # f_ij = fbr * dx
        comps = [jnp.sum(fbr * dx[:, a] * dx[:, b]) for (a, b) in _VOIGT]
        w = w + jnp.stack(comps)
    if angles.shape[0]:
        at = angles[:, 0]
        i, j, kk = angles[:, 1], angles[:, 2], angles[:, 3]
        ka = angle_coeffs[at, 0]
        t0 = angle_coeffs[at, 1] * (math.pi / 180.0)
        d1 = min_image(x[i] - x[j], boxj, periodic)
        d2 = min_image(x[kk] - x[j], boxj, periodic)
        r1sq = jnp.sum(d1 * d1, axis=1)
        r2sq = jnp.sum(d2 * d2, axis=1)
        r1 = jnp.sqrt(r1sq)
        r2 = jnp.sqrt(r2sq)
        c = jnp.clip(jnp.sum(d1 * d2, axis=1) / (r1 * r2), -1.0, 1.0)
        s = jnp.maximum(jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0)), 0.001)
        a = -2.0 * ka * (jnp.arccos(c) - t0) / s
        a11 = a * c / r1sq
        a12 = -a / (r1 * r2)
        a22 = a * c / r2sq
        f1 = a11[:, None] * d1 + a12[:, None] * d2
        f3 = a22[:, None] * d2 + a12[:, None] * d1
        comps = [jnp.sum(f1[:, a_] * d1[:, b_] + f3[:, a_] * d2[:, b_])
                 for (a_, b_) in _VOIGT]
        w = w + jnp.stack(comps)
    return w


def kspace_virial_tensor(fk, x, q):
    """Ewald k-space Voigt virial tensor (standard formula):

    W_ab = sum_k u_k |S_k|^2 [delta_ab - 2 (1 + k^2/(4g^2)) k_a k_b / k^2]

    (trace reduces to the validated scalar 1 - k^2/(2g^2) form)."""
    from ..ops import ewald_factored as ewf
    sr, si = ewf.structure_factor_f(fk, x, q)
    ug = jnp.asarray(fk.ug, x.dtype)
    ux, uy, uz = fk.unitk
    kx = jnp.asarray(fk.kxy[:, 0], x.dtype) * ux
    ky = jnp.asarray(fk.kxy[:, 1], x.dtype) * uy
    kz = jnp.asarray(fk.kz, x.dtype) * uz
    kv = [kx[:, None] + 0 * kz[None, :], ky[:, None] + 0 * kz[None, :],
          0 * kx[:, None] + kz[None, :]]
    ksq = (kx ** 2 + ky ** 2)[:, None] + (kz ** 2)[None, :]
    ksq_safe = jnp.where(ug > 0, ksq, 1.0)
    s2 = ug * (sr * sr + si * si)
    g = fk.g_ewald
    vterm = -2.0 * (1.0 + 0.25 * ksq / (g * g)) / ksq_safe
    comps = []
    for (a, b) in _VOIGT:
        delta = 1.0 if a == b else 0.0
        comps.append(jnp.sum(s2 * (delta + vterm * kv[a] * kv[b])))
    return jnp.stack(comps)


def pppm_virial_tensor(grid, rho):
    """Mesh k-space Voigt virial (LAMMPS pppm.cpp vg[] bookkeeping):

    W_ab = sum_k E_k(k) [delta_ab - 2(1/k^2 + 1/(4g^2)) k_a k_b],
    E_k(k) = 0.5 G(k) |rho(k)|^2 / V  — the same per-k energy the mesh
    energy sums, so trace(W)/3 is consistent with the Ewald scalar."""
    cplx = jnp.complex64 if rho.dtype == jnp.float32 else jnp.complex128
    rhok = jnp.fft.fftn(rho.astype(cplx))
    gk = jnp.asarray(grid.greens, rho.dtype)
    ek = 0.5 * gk * jnp.abs(rhok) ** 2 / grid.volume      # per-k energy
    kx = jnp.asarray(grid.fkx, rho.dtype)[:, None, None]
    ky = jnp.asarray(grid.fky, rho.dtype)[None, :, None]
    kz = jnp.asarray(grid.fkz, rho.dtype)[None, None, :]
    ksq = kx ** 2 + ky ** 2 + kz ** 2
    ksq_safe = jnp.where(ksq > 0, ksq, 1.0)
    g = grid.g_ewald
    vterm = jnp.where(ksq > 0,
                      -2.0 * (1.0 / ksq_safe + 0.25 / (g * g)), 0.0)
    kv = (kx + 0 * ky + 0 * kz, ky + 0 * kx + 0 * kz, kz + 0 * kx + 0 * ky)
    comps = []
    for (a, b) in _VOIGT:
        delta = 1.0 if a == b else 0.0
        comps.append(jnp.sum(ek * (delta + vterm * kv[a] * kv[b])))
    return jnp.stack(comps)


def pressure_tensor(engine, state):
    """Voigt pressure tensor (xx yy zz xy xz yz) in atmospheres:

    P_ab = (sum_i m v_a v_b + W_ab) / V * nktv2p

    Covers pair + exclusion + CONP correction + bonded + k-space (Ewald OR
    mesh) virials; self/background terms are isotropic and added to the
    diagonal.  Slab systems: the z components include the real/k-space
    pieces only (the slab correction's formal virial has no NPT consumer,
    as in the reference)."""
    sys = engine.system
    u = sys.units()
    x, q, v = state.x, state.q, state.v
    kern = engine.conp.kernels if engine.conp is not None else None
    w = pair_virial_tensor(
        x, q, engine.type_idx, engine.tables, engine.exclusions,
        box=engine.ksp_force.box, periodic=sys.periodic,
        cutoff=engine.md.cutoff, g_ewald=engine.ksp_force.g_ewald,
        qqr2e=u.qqr2e, elecheck=engine.elecheck, kernels=kern)
    w = w + bonded_virial_tensor(
        x, jnp.asarray(sys.bonds), jnp.asarray(sys.bond_coeffs),
        jnp.asarray(sys.angles), jnp.asarray(sys.angle_coeffs),
        box=engine.ksp_force.box, periodic=sys.periodic)
    if engine.pppm_grid is not None:
        from ..ops import pppm as pppm_ops
        rho = pppm_ops.spread(engine.pppm_grid, x, q)
        w = w + u.qqr2e * pppm_virial_tensor(engine.pppm_grid, rho)
        g = engine.pppm_grid.g_ewald
        volume = engine.pppm_grid.volume
    else:
        w = w + u.qqr2e * kspace_virial_tensor(engine.fksp, x, q)
        g = engine.ksp_force.g_ewald
        volume = engine.ksp_force.volume
    # background term: E_bg ~ 1/V -> W_ab = delta_ab * E_bg (self term is
    # volume-independent -> no virial)
    qsum = jnp.sum(q)
    ebg = u.qqr2e * math.pi / (2 * g * g * volume) * qsum * qsum
    w = w.at[:3].add(ebg)
    ke6 = jnp.stack([jnp.sum(jnp.asarray(sys.mass) * v[:, a] * v[:, b])
                     * u.mvv2e for (a, b) in _VOIGT])
    vol = engine.ksp_force.box[0] * engine.ksp_force.box[1] * engine.ksp_force.box[2]
    nktv2p = 68568.415
    return (ke6 + w) / vol * nktv2p


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
