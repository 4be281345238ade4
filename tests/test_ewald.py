import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_user_conp2_tpu.ops import erfc as ec
from lammps_user_conp2_tpu.ops import ewald as ew
from lammps_user_conp2_tpu.ops.pairs import min_image

QQR2E = 332.06371


def total_coulomb_energy(x, q, box, g_ewald, accuracy=1e-8):
    """Full Ewald energy (kspace + real erfc + self + background) without
    qqr2e prefactor."""
    n = len(x)
    q2 = float((q ** 2).sum()) * QQR2E
    ksp = ew.setup_ewald(box=box, accuracy_abs=accuracy * QQR2E, g_ewald=g_ewald,
                         natoms=n, q2=q2)
    xj = jnp.asarray(x)
    qj = jnp.asarray(q)
    ek, _ = ew.ewald_energy_forces(xj, qj, ksp)
    # real space over min images (box big enough vs erfc range)
    dx = min_image(xj[:, None, :] - xj[None, :, :], jnp.asarray(box), (True,) * 3)
    rsq = jnp.sum(dx * dx, axis=-1)
    mask = ~jnp.eye(n, dtype=bool)
    r = jnp.sqrt(jnp.where(mask, rsq, 1.0))
    er = 0.5 * jnp.sum(jnp.where(mask, qj[:, None] * qj[None, :] *
                                 jnp.asarray(np.vectorize(math.erfc)(np.asarray(g_ewald * r))) / r, 0.0))
    eself = -g_ewald / math.sqrt(math.pi) * jnp.sum(qj * qj)
    qsum = jnp.sum(qj)
    ebg = -math.pi / (2 * g_ewald ** 2 * ksp.volume) * qsum * qsum
    return float(ek + er + eself + ebg)


def test_madelung_nacl():
    """Rocksalt Madelung constant: E = -M * q^2 / r_nn per ion."""
    a = 2.0  # lattice: nn distance 1.0
    x = []
    q = []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                x.append([i, j, k])
                q.append(1.0 if (i + j + k) % 2 == 0 else -1.0)
    x = np.array(x, float)
    q = np.array(q, float)
    box = (a, a, a)
    # g large enough that erfc(g*L/2) ~ 0, so minimum-image real space suffices
    e = total_coulomb_energy(x, q, box, g_ewald=4.5)
    madelung = -2 * e / len(x)  # E = -N * M * q^2/(2*r_nn), r_nn=1
    assert abs(madelung - 1.7475645946331822) < 1e-6


def test_energy_g_invariance():
    rng = np.random.default_rng(0)
    n = 20
    box = (7.0, 8.0, 9.0)
    x = rng.uniform(0, 7, (n, 3))
    q = rng.normal(size=n)
    q -= q.mean()
    e1 = total_coulomb_energy(x, q, box, g_ewald=1.1)
    e2 = total_coulomb_energy(x, q, box, g_ewald=1.4)
    assert abs(e1 - e2) < 1e-5 * max(1.0, abs(e1))


def test_kspace_forces_match_gradient():
    rng = np.random.default_rng(1)
    n = 8
    box = (6.0, 6.0, 6.0)
    x = jnp.asarray(rng.uniform(0, 6, (n, 3)))
    q = jnp.asarray(rng.normal(size=n))
    ksp = ew.setup_ewald(box=box, accuracy_abs=1e-6 * QQR2E, g_ewald=0.9,
                         natoms=n, q2=float((q**2).sum()) * QQR2E)

    def energy(xx):
        e, _ = ew.ewald_energy_forces(xx, q, ksp)
        return e

    _, f = ew.ewald_energy_forces(x, q, ksp)
    g = jax.grad(energy)(x)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), rtol=1e-9, atol=1e-10)


def test_structure_factor_matches_direct():
    rng = np.random.default_rng(2)
    n = 13
    box = (5.0, 6.0, 7.0)
    x = jnp.asarray(rng.uniform(0, 5, (n, 3)))
    q = jnp.asarray(rng.normal(size=n))
    ksp = ew.setup_ewald(box=box, accuracy_abs=1e-5 * QQR2E, g_ewald=1.0,
                         natoms=n, q2=float((q**2).sum()) * QQR2E)
    kv = jnp.asarray(ksp.kvecs)
    re, im = ew.structure_factor(x, q, kv, chunk=64)
    ph = np.asarray(x) @ np.asarray(kv).T
    np.testing.assert_allclose(np.asarray(re), (np.asarray(q)[:, None] * np.cos(ph)).sum(0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(im), (np.asarray(q)[:, None] * np.sin(ph)).sum(0), atol=1e-10)


def test_slab_correction_force_is_gradient():
    rng = np.random.default_rng(3)
    n = 6
    x = jnp.asarray(rng.uniform(0, 5, (n, 3)))
    q = jnp.asarray(rng.normal(size=n))
    vol = 5.0 * 5.0 * 15.0

    def energy(xx):
        e, _ = ew.slab_correction_energy_forces(xx, q, vol)
        return e

    _, f = ew.slab_correction_energy_forces(x, q, vol)
    g = jax.grad(energy)(x)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), atol=1e-12)
