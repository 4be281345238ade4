"""Factorized Ewald must agree with the direct chunked path to f64 roundoff
(same half-space k set, same weights — only the contraction order differs)."""

import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu.ops import ewald as ew
from lammps_user_conp2_tpu.ops import ewald_factored as ewf

QQR2E = 332.06371


def _setup(slab=False):
    rng = np.random.default_rng(7)
    n = 30
    box = (9.0, 11.0, 13.0)
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)) * np.array(box))
    q = rng.normal(size=n)
    q -= q.mean()
    q = jnp.asarray(q)
    q2 = float((q ** 2).sum()) * QQR2E
    ksp = ew.setup_ewald(box=box, accuracy_abs=1e-6 * QQR2E, g_ewald=0.9,
                         natoms=n, q2=q2, slabflag=slab,
                         slab_volfactor=3.0 if slab else 1.0)
    return x, q, ksp, ewf.factorize(ksp)


def test_factored_covers_same_kset():
    _, _, ksp, fk = _setup()
    assert int((np.asarray(fk.ug) > 0).sum()) == ksp.kcount
    np.testing.assert_allclose(sorted(fk.ug[fk.ug > 0]), sorted(ksp.ug),
                               rtol=1e-12)


def test_factored_energy_forces_match_direct():
    for slab in (False, True):
        x, q, ksp, fk = _setup(slab)
        e1, f1 = ew.ewald_energy_forces(x, q, ksp)
        e2, f2 = ewf.energy_forces_f(fk, x, q)
        np.testing.assert_allclose(float(e2), float(e1), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                                   atol=1e-11, rtol=1e-9)


def test_factored_potential_matches_direct():
    x, q, ksp, fk = _setup()
    kvecs = jnp.asarray(ksp.kvecs)
    ug = jnp.asarray(ksp.ug)
    sre, sim = ew.structure_factor(x, q, kvecs)
    phi1 = ew.kspace_potential_on_points(x[:7], kvecs, ug, sre, sim)
    sr, si = ewf.structure_factor_f(fk, x, q)
    phi2 = ewf.potential_on_points_f(fk, x[:7], sr, si)
    np.testing.assert_allclose(np.asarray(phi2), np.asarray(phi1),
                               atol=1e-11, rtol=1e-10)


def test_factored_amatrix_matches_direct():
    x, q, ksp, fk = _setup()
    xe = x[:6]
    a1 = ew.amatrix_kspace(xe, ksp)
    a2 = ewf.amatrix_kspace_f(fk, xe)
    # compare off-diagonals only (direct path overwrites the diagonal)
    m = ~np.eye(6, dtype=bool)
    np.testing.assert_allclose(np.asarray(a2)[m], np.asarray(a1)[m],
                               atol=1e-11, rtol=1e-9)


def test_chunked_paths_match_unchunked():
    """The kxy-chunked scan (engaged above KXY_CHUNK vectors; exercised here
    with a tiny forced chunk) is a pure reassociation of the same sums."""
    x, q, ksp, fk = _setup(slab=True)
    sr1, si1 = ewf.structure_factor_f(fk, x, q)
    sr2, si2 = ewf._structure_factor_chunked(x, q, fk.kxy, fk.kz, fk.unitk,
                                             chunk=7)
    np.testing.assert_allclose(np.asarray(sr2), np.asarray(sr1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(si2), np.asarray(si1), atol=1e-12)

    e1, f1 = ewf.energy_forces_f(fk, x, q)
    e2, f2 = ewf._energy_forces_chunked(x, q, fk.kxy, fk.kz, fk.unitk, fk.ug,
                                        chunk=7)
    np.testing.assert_allclose(float(e2), float(e1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               atol=1e-12, rtol=1e-10)


def test_host_amatrix_matches_device_paths():
    """amatrix_kspace_host (setup-time numpy assembly for production K) must
    reproduce ops.ewald.amatrix_kspace exactly: the z-plane-grouped path for
    plane-structured electrodes, and the K-chunked power-gather fallback for
    generic z — both with and without the slab correction."""
    rng = np.random.default_rng(3)
    for slab in (False, True):
        _, _, ksp, _ = _setup(slab)
        box = np.array(ksp.box)
        ne = 24
        # plane-structured: two z planes (the capacitor geometry)
        xe = rng.uniform(0, 1, (ne, 3)) * box
        xe[: ne // 2, 2] = 2.25
        xe[ne // 2:, 2] = 10.5
        a_ref = np.asarray(ew.amatrix_kspace(jnp.asarray(xe), ksp))
        a_pl = ewf.amatrix_kspace_host(xe, ksp)
        np.testing.assert_allclose(a_pl, a_ref, atol=1e-12, rtol=1e-11)
        # generic z -> chunked fallback (force with plane_max=2)
        xe2 = rng.uniform(0, 1, (ne, 3)) * box
        a_ref2 = np.asarray(ew.amatrix_kspace(jnp.asarray(xe2), ksp))
        a_ch = ewf.amatrix_kspace_host(xe2, ksp, plane_max=2, chunk=256)
        np.testing.assert_allclose(a_ch, a_ref2, atol=1e-12, rtol=1e-11)
