"""Shard-count invariance: the 8-device sharded step must reproduce the
single-device step (the TPU analogue of the reference's 1/2/4-rank MPI
invariance tests, tests/zmirror/input:13-15)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from jax.sharding import Mesh

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.conp import setup_conp
from lammps_user_conp2_tpu.models.md import build_engine
from lammps_user_conp2_tpu.parallel.sharded import build_sharded_engine


@pytest.fixture(scope="module")
def engines():
    system, md, cfg = workloads.dilute(0)
    solver = setup_conp(system, md, cfg)
    eng = build_engine(system, md, solver)
    mesh = Mesh(np.array(jax.devices()[:8]), ("s",))
    sheng = build_sharded_engine(eng, mesh)
    return eng, sheng


def test_sharded_step_matches_single_device(engines):
    eng, sheng = engines
    st = eng.init_state()
    s1 = jax.jit(eng.step)(st)
    s8 = sheng.step(st)
    np.testing.assert_allclose(np.asarray(s8.q), np.asarray(s1.q),
                               atol=1e-12, rtol=0)
    np.testing.assert_allclose(np.asarray(s8.x), np.asarray(s1.x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s8.f), np.asarray(s1.f),
                               atol=1e-8, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(s8.v), np.asarray(s1.v), atol=1e-12)
    assert abs(float(s8.scalar_out) - float(s1.scalar_out)) < 1e-12


def test_sharded_multi_step_trajectory(engines):
    eng, sheng = engines
    st = eng.init_state()
    s1 = st
    for _ in range(5):
        s1 = jax.jit(eng.step)(s1)
    s8, th = sheng.run(st, 5, thermo_every=5)
    np.testing.assert_allclose(np.asarray(s8.q), np.asarray(s1.q), atol=1e-10)
    np.testing.assert_allclose(np.asarray(s8.x), np.asarray(s1.x), atol=1e-10)
    assert int(np.asarray(th["step"])[-1]) == 5
    assert np.isfinite(float(np.asarray(th["temp"])[-1]))


def test_sharded_pppm_mode():
    """PPPM-mode solve under shard_map (mesh replicated, A^-1 rows sharded)."""
    import dataclasses
    from lammps_user_conp2_tpu.utils.config import KSpaceStyle
    system, md, cfg = workloads.dilute(0)
    cfgp = dataclasses.replace(cfg, kspace=KSpaceStyle.PPPM)
    mdp = dataclasses.replace(md, kspace_style=KSpaceStyle.PPPM)
    solver = setup_conp(system, mdp, cfgp)
    eng = build_engine(system, mdp, solver)
    mesh = Mesh(np.array(jax.devices()[:8]), ("s",))
    sheng = build_sharded_engine(eng, mesh)
    st = eng.init_state()
    s1 = jax.jit(eng.step)(st)
    s8 = sheng.step(st)
    np.testing.assert_allclose(np.asarray(s8.q), np.asarray(s1.q), atol=1e-11)
    np.testing.assert_allclose(np.asarray(s8.f), np.asarray(s1.f),
                               atol=1e-7, rtol=1e-9)
