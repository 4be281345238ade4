"""Factorized Ewald: the MXU-native fast path.

The reference's lowmem mode factorizes trig tables as xy * z products
(km_ewald.cpp:360-363, kz_expand at 533-558) to save CPU memory.  Taken to
its logical TPU conclusion, the same factorization e^{ik.r} =
e^{i(kx x + ky y)} * e^{i kz z} turns EVERY k-space sum into dense complex
matmuls over (N, nxy) x (nxy, nz) tables:

    S(kxy, kz)   = P^T diag(q) Z               [structure factors]
    E            = sum ug |S|^2
    F_j          = 2 q_j sum ug k Im[P_j Z_j conj(S)]   (3 matmul chains)
    phi(points)  = sum 2 ug Re[S conj(Pe) conj(Ze)]     [b-vector readout]

with P (N, nxy), Z (N, nz) built from O(N*(kxmax+kymax+kzmax))
transcendentals.  Per-step cost drops from O(N*K) transcendentals (VPU) to
O(N*nxy*nz) MXU flops — a >100x speedup at slab-geometry K counts.

The (kxy, kz) grid covers exactly the same half-space set as
ops.ewald.setup_ewald (excluded combinations get ug=0), so results are
bitwise-equivalent physics; tests assert agreement to f64 roundoff.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from .ewald import EwaldKSpace


@dataclasses.dataclass(frozen=True)
class FactoredKSpace:
    """Static factorized tables; built from an EwaldKSpace's parameters."""
    g_ewald: float
    volume: float
    slabflag: bool
    box: tuple
    unitk: tuple             # (ux, uy, uz) with uz slab-extended
    kxy: np.ndarray          # (nxy, 2) int — (kx, ky) integer pairs
    kz: np.ndarray           # (nz,) int — -kzmax..kzmax
    ug: np.ndarray           # (nxy, nz) weights; 0 where excluded
    ug_tot: float

    @property
    def nxy(self) -> int:
        return len(self.kxy)

    @property
    def nz(self) -> int:
        return len(self.kz)


def factorize(ksp: EwaldKSpace) -> FactoredKSpace:
    """Build the (kxy, kz) factorization covering ksp's half-space set."""
    xprd, yprd, zprd = ksp.box
    zprd_slab = zprd * (ksp.slab_volfactor if ksp.slabflag else 1.0)
    unitk = (2 * math.pi / xprd, 2 * math.pi / yprd, 2 * math.pi / zprd_slab)
    kxm, kym, kzm = ksp.kxmax, ksp.kymax, ksp.kzmax
    gsqmx = max((unitk[0] * kxm) ** 2, (unitk[1] * kym) ** 2,
                (unitk[2] * kzm) ** 2) * 1.00001

    xy = []
    for kx in range(0, kxm + 1):
        for ky in range(-kym, kym + 1):
            if kx == 0 and ky < 0:
                continue
            xy.append((kx, ky))
    xy = np.array(xy, np.int64)
    kz = np.arange(-kzm, kzm + 1, dtype=np.int64)

    kxc = xy[:, 0] * unitk[0]
    kyc = xy[:, 1] * unitk[1]
    kzc = kz * unitk[2]
    sqk = (kxc ** 2 + kyc ** 2)[:, None] + (kzc ** 2)[None, :]
    # half-space rule: (kx>0) | (kx==0 & ky>0) | (kx==0 & ky==0 & kz>0)
    half = (xy[:, 0] > 0)[:, None] | ((xy[:, 0] == 0) & (xy[:, 1] > 0))[:, None] \
        | (((xy[:, 0] == 0) & (xy[:, 1] == 0))[:, None] & (kz > 0)[None, :])
    inc = half & (sqk <= gsqmx) & (sqk > 0)
    preu = 4.0 * math.pi / ksp.volume
    sqk_safe = np.where(inc, sqk, 1.0)
    ug = np.where(inc, preu * np.exp(-0.25 * sqk_safe / ksp.g_ewald ** 2) / sqk_safe, 0.0)
    # drop all-zero xy rows (e.g. xy pairs fully outside the sphere)
    keep = ug.any(axis=1)
    return FactoredKSpace(
        g_ewald=ksp.g_ewald, volume=ksp.volume, slabflag=ksp.slabflag,
        box=ksp.box, unitk=unitk, kxy=xy[keep], kz=kz,
        ug=ug[keep], ug_tot=float(2.0 * ug.sum()),
    )


# ---------------------------------------------------------------------------
# device-side
# ---------------------------------------------------------------------------

def axis_tables_kv(x, kxy, kz, unitk):
    """Array-level phase tables — kxy may be a device-local shard."""
    dtype = x.dtype
    ux, uy, uz = unitk
    kxy = jnp.asarray(kxy, dtype)
    phase_xy = x[:, 0:1] * (ux * kxy[:, 0])[None, :] + \
        x[:, 1:2] * (uy * kxy[:, 1])[None, :]
    pr, pi = jnp.cos(phase_xy), jnp.sin(phase_xy)
    phase_z = x[:, 2:3] * (uz * jnp.asarray(kz, dtype))[None, :]
    zr, zi = jnp.cos(phase_z), jnp.sin(phase_z)
    return (pr, pi), (zr, zi)


def axis_tables(fk: FactoredKSpace, x):
    """(Pr, Pi) (N, nxy) and (Zr, Zi) (N, nz) phase tables."""
    return axis_tables_kv(x, fk.kxy, fk.kz, fk.unitk)


def structure_factor_f(fk: FactoredKSpace, x, q):
    """S(kxy, kz): returns (Sr, Si) each (nxy, nz). 4 real matmuls."""
    return structure_factor_fkv(x, q, fk.kxy, fk.kz, fk.unitk)


def structure_factor_fkv(x, q, kxy, kz, unitk):
    (pr, pi), (zr, zi) = axis_tables_kv(x, kxy, kz, unitk)
    qzr = q[:, None] * zr
    qzi = q[:, None] * zi
    sr = pr.T @ qzr - pi.T @ qzi
    si = pr.T @ qzi + pi.T @ qzr
    return sr, si


def potential_on_points_f(fk: FactoredKSpace, xe, sr, si):
    """phi(xe) = sum 2 ug Re[S conj(Pe) conj(Ze)] — the b-vector readout."""
    return potential_on_points_fkv(xe, sr, si, fk.kxy, fk.kz, fk.unitk, fk.ug)


def potential_on_points_fkv(xe, sr, si, kxy, kz, unitk, ug):
    (per, pei), (zer, zei) = axis_tables_kv(xe, kxy, kz, unitk)
    ug = jnp.asarray(ug, xe.dtype)
    mr = 2.0 * ug * sr
    mi = 2.0 * ug * si
    # T(e, xy) = sum_z M(xy,z) conj(Ze)(z) -> (Ne, nxy)
    tr = zer @ mr.T + zei @ mi.T
    ti = -zei @ mr.T + zer @ mi.T
    # Re[conj(Pe) T] summed over xy
    return jnp.sum(per * tr + pei * ti, axis=1)


def energy_forces_f(fk: FactoredKSpace, x, q):
    """(energy, forces) without qqr2e prefactor — plain Ewald k-space."""
    return energy_forces_fkv(x, q, fk.kxy, fk.kz, fk.unitk, fk.ug)


def energy_forces_fkv(x, q, kxy, kz, unitk, ug):
    dtype = x.dtype
    (pr, pi), (zr, zi) = axis_tables_kv(x, kxy, kz, unitk)
    ug = jnp.asarray(ug, dtype)
    qzr = q[:, None] * zr
    qzi = q[:, None] * zi
    sr = pr.T @ qzr - pi.T @ qzi
    si = pr.T @ qzi + pi.T @ qzr
    e = jnp.sum(ug * (sr * sr + si * si))

    # W = ug conj(S); G_j(xy) = sum_z W Z_j ; Gz with extra kz weight
    wr = ug * sr
    wi = -ug * si
    gr = zr @ wr.T - zi @ wi.T          # (N, nxy)
    gi = zr @ wi.T + zi @ wr.T
    ux, uy, uz = unitk
    kzv = jnp.asarray(kz, dtype) * uz
    gzr = zr @ (wr * kzv).T - zi @ (wi * kzv).T
    gzi = zr @ (wi * kzv).T + zi @ (wr * kzv).T

    # Im[P G] per (j, xy)
    im_pg = pr * gi + pi * gr
    im_pgz = pr * gzi + pi * gzr
    kxv = jnp.asarray(kxy[:, 0], dtype) * ux
    kyv = jnp.asarray(kxy[:, 1], dtype) * uy
    fx = im_pg @ kxv
    fy = im_pg @ kyv
    fz = jnp.sum(im_pgz, axis=1)
    f = 2.0 * q[:, None] * jnp.stack([fx, fy, fz], axis=1)
    return e, f


def amatrix_kspace_f(fk: FactoredKSpace, xe, dtype=jnp.float64):
    """K-space A block via factorized tables (for mobile-electrode rebuilds).

    A_ij = sum_k 2 ug (c_i c_j + s_i s_j) = Re sum_k 2 ug e^{ik(ri-rj)};
    computed as real matmuls over the expanded (nxy*nz) axis is O(Ne^2 K) —
    instead contract per-z: A = sum_z [C_z C_z^T + ...] which is still big;
    for setup-time use ops.ewald.amatrix_kspace (direct) — this helper exists
    for parity testing of the factored tables."""
    (pr, pi), (zr, zi) = axis_tables(fk, xe)
    ug = jnp.asarray(fk.ug, dtype)
    # expand E_j(k) = P_j Z_j lazily per z-slab and accumulate
    def body(acc, idx):
        uz_col = ug[:, idx]                      # (nxy,)
        czr = zr[:, idx]                         # (Ne,)
        czi = zi[:, idx]
        er = pr * czr[:, None] - pi * czi[:, None]   # (Ne, nxy)
        ei = pr * czi[:, None] + pi * czr[:, None]
        acc = acc + (er * (2.0 * uz_col)) @ er.T + (ei * (2.0 * uz_col)) @ ei.T
        return acc, None

    acc0 = jnp.zeros((xe.shape[0], xe.shape[0]), dtype)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(fk.nz))
    return acc
