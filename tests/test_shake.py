"""Cluster-batched SHAKE/RATTLE correctness."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.shake import (build_constraints,
                                                rattle_velocities,
                                                shake_positions)
from lammps_user_conp2_tpu.utils.config import ShakeConfig


def _il_constraints():
    system, md, cfg = workloads.il_onelayer(0)
    cons = build_constraints(system, md.shake)
    return system, cons


def test_cluster_structure():
    system, cons = _il_constraints()
    # 320 BMI cations, 3 atoms + 3 constraints each (2 bonds + 1 angle 1-3)
    assert cons.nclusters == 320
    assert cons.atoms.shape[1] == 3
    assert cons.ncons == 960
    assert bool(cons.cmask.all())


def test_shake_satisfies_constraints_and_conserves_com():
    system, cons = _il_constraints()
    rng = np.random.default_rng(0)
    x_old = jnp.asarray(system.x0)
    # perturb positions (an unconstrained drift step)
    x_new = x_old + jnp.asarray(rng.normal(scale=0.05, size=x_old.shape))
    x, dv = shake_positions(cons, x_new, x_old, 2.0, box=system.box,
                            periodic=system.periodic, iters=30)
    ai = np.asarray(cons.atoms)
    xn = np.asarray(x)
    ci, cj = np.asarray(cons.ci), np.asarray(cons.cj)
    d2 = np.asarray(cons.dist2)
    box = np.asarray(system.box)
    for s in range(3):
        ri = xn[ai[np.arange(len(ai)), ci[:, s]]]
        rj = xn[ai[np.arange(len(ai)), cj[:, s]]]
        d = ri - rj
        for ax in range(3):       # minimum image (molecules straddle x/y)
            if system.periodic[ax]:
                d[:, ax] -= box[ax] * np.round(d[:, ax] / box[ax])
        err = np.abs((d ** 2).sum(1) - d2[:, s]) / d2[:, s]
        assert err.max() < 1e-6
    # COM of each cluster unchanged (constraint forces are internal)
    m = np.asarray(system.mass)
    for arr in (np.asarray(x_new), xn):
        pass
    com_before = (m[ai][:, :, None] * np.asarray(x_new)[ai]).sum(1)
    com_after = (m[ai][:, :, None] * xn[ai]).sum(1)
    np.testing.assert_allclose(com_after, com_before, atol=1e-8)
    # atoms outside clusters untouched
    mask = np.ones(system.natoms, bool)
    mask[ai.ravel()] = False
    np.testing.assert_array_equal(xn[mask], np.asarray(x_new)[mask])


def test_rattle_zeroes_bond_rates():
    system, cons = _il_constraints()
    rng = np.random.default_rng(1)
    x = jnp.asarray(system.x0)
    v = jnp.asarray(rng.normal(scale=0.01, size=(system.natoms, 3)))
    v2 = rattle_velocities(cons, x, v, box=system.box,
                           periodic=system.periodic, iters=30)
    ai = np.asarray(cons.atoms)
    ci, cj = np.asarray(cons.ci), np.asarray(cons.cj)
    xn, vn = np.asarray(x), np.asarray(v2)
    for s in range(3):
        i = ai[np.arange(len(ai)), ci[:, s]]
        j = ai[np.arange(len(ai)), cj[:, s]]
        rij = xn[i] - xn[j]
        for ax in range(3):
            if system.periodic[ax]:
                rij[:, ax] -= system.box[ax] * np.round(rij[:, ax] / system.box[ax])
        vij = vn[i] - vn[j]
        rate = np.abs((rij * vij).sum(1))
        assert rate.max() < 1e-6


def test_pallas_shake_matches_xla_interpret():
    """The fused VMEM SHAKE/RATTLE kernels are bit-compatible (to f32
    roundoff) with the XLA cluster-batched path (interpret mode on CPU)."""
    from lammps_user_conp2_tpu.ops.pallas import shake_kernel as sk
    system, cons = _il_constraints()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(system.x0)
    xn = x0 + jnp.asarray(rng.normal(0, 0.05, x0.shape))
    v = jnp.asarray(rng.normal(0, 0.01, x0.shape))
    box, per = system.box, system.periodic

    x_ref, dv_ref = shake_positions(cons, xn, x0, 1.0, box=box, periodic=per)
    x_pal, dv_pal = sk.shake_positions_pallas(
        cons, xn, x0, 1.0, box=box, periodic=per, interpret=True)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               atol=1e-12)

    v_ref = rattle_velocities(cons, x_ref, v, box=box, periodic=per)
    v_pal = sk.rattle_velocities_pallas(
        cons, x_ref, v, box=box, periodic=per, interpret=True)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               atol=1e-14)
