"""Virial oracle: P_virial = -dE/dV at fixed fractional coordinates (T=0).

Scales the box by (1 +- eps) at FIXED g_ewald and cutoff (both converged, so
the split/truncation contributes nothing to the derivative) and compares the
numerical volume derivative of the potential energy against the analytic
virial from models/pressure.py.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_user_conp2_tpu.models.pressure import (kspace_virial_scalar,
                                                   pair_virial_scalar)
from lammps_user_conp2_tpu.ops import ewald as ew
from lammps_user_conp2_tpu.ops import ewald_factored as ewf
from lammps_user_conp2_tpu.ops.pairs import dense_pair_forces, make_pair_tables

QQR2E = 332.06371
G = 0.9
CUT = 5.0


def _system(scale=1.0, n=40, seed=0):
    rng = np.random.default_rng(seed)
    box0 = np.array([11.0, 12.0, 13.0])
    frac = rng.uniform(0, 1, (n, 3))
    q = rng.normal(size=n)
    q -= q.mean()
    box = tuple(box0 * scale)
    x = jnp.asarray(frac * np.asarray(box))
    typ = jnp.asarray(np.ones(n, np.int64))
    eps = np.zeros((2, 2))
    sig = np.zeros((2, 2))
    eps[1, 1] = 0.12
    sig[1, 1] = 2.8
    tables = make_pair_tables(eps, sig, np.asarray(typ))
    exi = jnp.full((n, 1), n, jnp.int32)
    exv = jnp.zeros((n, 1))
    return x, jnp.asarray(q), typ, tables, (exi, exv), box


def _energy_and_virial(scale):
    x, q, typ, tables, excl, box = _system(scale)
    n = x.shape[0]
    ksp = ew.setup_ewald(box=box, accuracy_abs=1e-8 * QQR2E, g_ewald=G,
                         natoms=n, q2=float((q**2).sum()) * QQR2E)
    fk = ewf.factorize(ksp)
    kw = dict(box=box, periodic=(True,) * 3, cutoff=CUT, g_ewald=G,
              qqr2e=QQR2E)
    _, ev, ec = dense_pair_forces(x, q, typ, tables, excl, **kw)
    ek, _ = ewf.energy_forces_f(fk, x, q)
    e = float(ev + ec + QQR2E * ek)   # self term is V-independent at fixed g
    w = float(pair_virial_scalar(x, q, typ, tables, excl, **kw)
              + QQR2E * kspace_virial_scalar(fk, x, q))
    vol = box[0] * box[1] * box[2]
    return e, w, vol


def test_virial_matches_volume_derivative():
    eps = 2e-5
    e0, w0, v0 = _energy_and_virial(1.0)
    ep, _, vp = _energy_and_virial(1.0 + eps)
    em, _, vm = _energy_and_virial(1.0 - eps)
    p_num = -(ep - em) / (vp - vm)
    p_vir = w0 / (3.0 * v0)
    assert abs(p_num - p_vir) / max(1e-3, abs(p_vir)) < 5e-3, (p_num, p_vir)


def _system_aniso(scale3, n=40, seed=0):
    rng = np.random.default_rng(seed)
    box0 = np.array([11.0, 12.0, 13.0])
    frac = rng.uniform(0, 1, (n, 3))
    q = rng.normal(size=n)
    q -= q.mean()
    box = tuple(box0 * np.asarray(scale3))
    x = jnp.asarray(frac * np.asarray(box))
    typ = jnp.asarray(np.ones(n, np.int64))
    eps = np.zeros((2, 2)); sig = np.zeros((2, 2))
    eps[1, 1] = 0.12; sig[1, 1] = 2.8
    tables = make_pair_tables(eps, sig, np.asarray(typ))
    exi = jnp.full((n, 1), n, jnp.int32)
    exv = jnp.zeros((n, 1))
    return x, jnp.asarray(q), typ, tables, (exi, exv), box


def _energy_tensor(scale3):
    from lammps_user_conp2_tpu.models.pressure import (kspace_virial_tensor,
                                                       pair_virial_tensor)
    x, q, typ, tables, excl, box = _system_aniso(scale3)
    n = x.shape[0]
    ksp = ew.setup_ewald(box=box, accuracy_abs=1e-8 * QQR2E, g_ewald=G,
                         natoms=n, q2=float((q**2).sum()) * QQR2E)
    fk = ewf.factorize(ksp)
    kw = dict(box=box, periodic=(True,) * 3, cutoff=CUT, g_ewald=G,
              qqr2e=QQR2E)
    _, ev, ec = dense_pair_forces(x, q, typ, tables, excl, **kw)
    ek, _ = ewf.energy_forces_f(fk, x, q)
    e = float(ev + ec + QQR2E * ek)
    w6 = np.asarray(pair_virial_tensor(x, q, typ, tables, excl, **kw)
                    + QQR2E * kspace_virial_tensor(fk, x, q))
    return e, w6


@pytest.mark.slow
def test_virial_tensor_diagonal_matches_axis_derivatives():
    """W_aa = -dE/dln(L_a) at fixed fractional coordinates, per axis."""
    eps = 2e-5
    _, w6 = _energy_tensor((1.0, 1.0, 1.0))
    for ax in range(3):
        sp = [1.0, 1.0, 1.0]; sm = [1.0, 1.0, 1.0]
        sp[ax] = 1.0 + eps; sm[ax] = 1.0 - eps
        ep, _ = _energy_tensor(sp)
        em, _ = _energy_tensor(sm)
        w_num = -(ep - em) / (2 * eps)
        assert abs(w_num - w6[ax]) / max(1e-3, abs(w6[ax])) < 5e-3, \
            (ax, w_num, w6[ax])


def test_virial_tensor_trace_matches_scalar():
    x, q, typ, tables, excl, box = _system_aniso((1.0, 1.0, 1.0))
    n = x.shape[0]
    ksp = ew.setup_ewald(box=box, accuracy_abs=1e-8 * QQR2E, g_ewald=G,
                         natoms=n, q2=float((q**2).sum()) * QQR2E)
    fk = ewf.factorize(ksp)
    from lammps_user_conp2_tpu.models.pressure import (kspace_virial_tensor,
                                                       pair_virial_tensor)
    kw = dict(box=box, periodic=(True,) * 3, cutoff=CUT, g_ewald=G,
              qqr2e=QQR2E)
    w6 = np.asarray(pair_virial_tensor(x, q, typ, tables, excl, **kw))
    ws = float(pair_virial_scalar(x, q, typ, tables, excl, **kw))
    np.testing.assert_allclose(w6[:3].sum(), ws, rtol=1e-10)
    k6 = np.asarray(kspace_virial_tensor(fk, x, q))
    ks = float(kspace_virial_scalar(fk, x, q))
    np.testing.assert_allclose(k6[:3].sum(), ks, rtol=1e-10)


@pytest.mark.slow
def test_pppm_virial_tensor_matches_ewald():
    """The mesh virial (Hockney-Eastwood greens + LAMMPS vg bookkeeping)
    agrees with the exact Ewald tensor at convergence, component-wise."""
    from lammps_user_conp2_tpu.models.pressure import (kspace_virial_tensor,
                                                       pppm_virial_tensor)
    from lammps_user_conp2_tpu.ops import pppm as pppm_ops
    x, q, typ, tables, excl, box = _system_aniso((1.0, 1.0, 1.0))
    n = x.shape[0]
    ksp = ew.setup_ewald(box=box, accuracy_abs=1e-10 * QQR2E, g_ewald=G,
                         natoms=n, q2=float((q**2).sum()) * QQR2E)
    fk = ewf.factorize(ksp)
    grid = pppm_ops.setup_pppm(
        box=box, box_lo=(0.0, 0.0, 0.0), accuracy_abs=1e-10 * QQR2E,
        natoms=n, q2=float((q**2).sum()) * QQR2E, cutoff=CUT, g_ewald=G)
    rho = pppm_ops.spread(grid, x, q)
    w_mesh = np.asarray(pppm_virial_tensor(grid, rho))
    w_ew = np.asarray(kspace_virial_tensor(fk, x, q))
    scale = max(1.0, np.abs(w_ew).max())
    assert np.abs(w_mesh - w_ew).max() / scale < 2e-3, (w_mesh, w_ew)
