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


# --- the solver x kspace x pair-path shard-invariance matrix ----------------
# (VERDICT round 1: the matfree crash shipped because only INV+dense was
# covered).  CG_MATFREE x PPPM is the production 100k configuration: mesh b
# + exact factored-Ewald A operator (the pppm_conp.cpp:91-101 split).

_MATRIX = [
    ("inv", "ewald"), ("cg", "ewald"), ("cg_matfree", "ewald"),
    ("inv", "pppm"), ("cg", "pppm"), ("cg_matfree", "pppm"),
]


@pytest.mark.parametrize("solver_name,kspace_name", _MATRIX)
def test_sharded_solver_matrix(solver_name, kspace_name):
    """8-dev == 1-dev for every solver x kspace x {dense, cell} combination."""
    import dataclasses
    from lammps_user_conp2_tpu.utils.config import KSpaceStyle, Solver
    solver_e = Solver(solver_name)
    kspace_e = KSpaceStyle(kspace_name)
    system, md, cfg = workloads.dilute(0)
    cfgx = dataclasses.replace(cfg, solver=solver_e, kspace=kspace_e)
    mdx = dataclasses.replace(md, kspace_style=kspace_e)
    conp = setup_conp(system, mdx, cfgx)
    mesh = Mesh(np.array(jax.devices()[:8]), ("s",))
    for pair_path in ("dense", "cell", "nlist"):
        mdp = dataclasses.replace(mdx, pair_path=pair_path,
                                  use_pallas_pair=False)
        eng = build_engine(system, mdp, conp)
        if pair_path == "cell":
            assert eng.cell_grid is not None
        if pair_path == "nlist":
            assert eng.ncfg is not None
        sheng = build_sharded_engine(eng, mesh)
        st = eng.init_state()
        s1 = jax.jit(eng.step)(st)
        s8 = sheng.step(st)
        np.testing.assert_allclose(np.asarray(s8.q), np.asarray(s1.q),
                                   atol=1e-10,
                                   err_msg=f"{solver_name}/{kspace_name}/{pair_path}")
        np.testing.assert_allclose(np.asarray(s8.f), np.asarray(s1.f),
                                   atol=1e-7, rtol=1e-9,
                                   err_msg=f"{solver_name}/{kspace_name}/{pair_path}")
        assert np.isfinite(float(s8.energy))


def test_sharded_cond_shake_feedback():
    """COND + ffield + PPPM + SHAKE + feedback efield sharded == single —
    the mode the reference's own MPI test pins to 2 ranks
    (/root/reference/tests/cond/input:14)."""
    system, md, cfg = workloads.cond(4)
    conp = setup_conp(system, md, cfg)
    eng = build_engine(system, md, conp)
    mesh = Mesh(np.array(jax.devices()[:8]), ("s",))
    sheng = build_sharded_engine(eng, mesh)
    st = eng.init_state()
    s1 = jax.jit(eng.step)(st)
    s8 = sheng.step(st)
    np.testing.assert_allclose(np.asarray(s8.q), np.asarray(s1.q), atol=1e-11)
    np.testing.assert_allclose(np.asarray(s8.f), np.asarray(s1.f),
                               atol=1e-7, rtol=1e-9)
    assert abs(float(s8.scalar_out) - float(s1.scalar_out)) < 1e-12
    np.testing.assert_allclose(np.asarray(s8.v), np.asarray(s1.v), atol=1e-12)


def test_sharded_conq_zmirror():
    """CONQ + zmirror + doubled cell sharded == single (the reference's
    zmirror deck is its rank-invariance test, tests/zmirror/input:13-15)."""
    system, md, cfg = workloads.zmirror(3)
    conp = setup_conp(system, md, cfg)
    eng = build_engine(system, md, conp)
    mesh = Mesh(np.array(jax.devices()[:8]), ("s",))
    sheng = build_sharded_engine(eng, mesh)
    st = eng.init_state()
    s1 = jax.jit(eng.step)(st)
    s8 = sheng.step(st)
    np.testing.assert_allclose(np.asarray(s8.q), np.asarray(s1.q), atol=1e-11)
    np.testing.assert_allclose(np.asarray(s8.x), np.asarray(s1.x), atol=1e-12)
    assert abs(float(s8.scalar_out) - float(s1.scalar_out)) < 1e-12


def test_sharded_trajectory_with_reneighbor():
    """Mid-size sharded trajectory crossing a reneighbor event: 5289 atoms
    (N % 8 = 1), multi-cell grid, 20 steps with a small Verlet skin and
    nonzero initial velocities so needs_rebuild fires INSIDE the sharded
    scan; 8-dev must track 1-dev through the rebuild."""
    import dataclasses
    from lammps_user_conp2_tpu.utils.config import Solver
    system, md, cfg = workloads.synthetic(n_elyte=5001, nele_side=12,
                                          lz=80.0, lxy=56.0)
    assert system.natoms % 8 != 0
    cfgx = dataclasses.replace(cfg, solver=Solver.CG_MATFREE)
    mdx = dataclasses.replace(md, pair_path="nlist", neighbor_skin=0.2,
                              use_pallas_pair=False)
    conp = setup_conp(system, mdx, cfgx)
    eng = build_engine(system, mdx, conp)
    assert eng.ncfg is not None
    assert eng.ncfg.grid.total > 8, eng.ncfg.grid.ncells   # multi-cell grid
    # deterministic velocities large enough to trip the skin/2 check mid-run
    rng = np.random.RandomState(0)
    v0 = 0.01 * rng.standard_normal((system.natoms, 3))
    v0[~system.mobile_mask] = 0.0
    mesh = Mesh(np.array(jax.devices()[:8]), ("s",))
    sheng = build_sharded_engine(eng, mesh)
    st = eng.init_state(v0=v0)
    x_ref0 = np.asarray(st.nbr.x_ref)
    s1 = st
    for _ in range(20):
        s1 = jax.jit(eng.step)(s1)
    s8 = sheng.run(st, 20)
    # the reneighbor event actually happened
    assert not np.array_equal(np.asarray(s1.nbr.x_ref), x_ref0)
    assert not np.array_equal(np.asarray(s8.nbr.x_ref), x_ref0)
    np.testing.assert_allclose(np.asarray(s8.q), np.asarray(s1.q), atol=1e-9)
    np.testing.assert_allclose(np.asarray(s8.x), np.asarray(s1.x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(s8.f), np.asarray(s1.f),
                               atol=1e-6, rtol=1e-8)
    assert np.isfinite(float(s8.energy))


@pytest.mark.parametrize("d", [2, 4])
def test_sharded_invariance_shard_counts(d):
    """d-device == 1-device for the production CG_MATFREE x PPPM x nlist
    combo on an odd-padding system (5289 atoms, N % d != 0 for every d, so
    _pad_to/npad_rows/tail-block clamping all engage).  d=8 is covered by
    the rest of the file; the reference explicitly tests 1/2/4 ranks
    (/root/reference/tests/zmirror/input:13-15)."""
    import dataclasses
    from lammps_user_conp2_tpu.utils.config import KSpaceStyle, Solver
    system, md, cfg = workloads.synthetic(n_elyte=5001, nele_side=12,
                                          lz=80.0, lxy=56.0)
    assert system.natoms % d != 0
    cfgx = dataclasses.replace(cfg, solver=Solver.CG_MATFREE,
                               kspace=KSpaceStyle.PPPM)
    mdx = dataclasses.replace(md, pair_path="nlist",
                              kspace_style=KSpaceStyle.PPPM,
                              use_pallas_pair=False)
    conp = setup_conp(system, mdx, cfgx)
    eng = build_engine(system, mdx, conp)
    mesh = Mesh(np.array(jax.devices()[:d]), ("s",))
    sheng = build_sharded_engine(eng, mesh)
    st = eng.init_state()
    s1 = jax.jit(eng.step)(st)
    sd = sheng.step(st)
    np.testing.assert_allclose(np.asarray(sd.q), np.asarray(s1.q),
                               atol=1e-9, err_msg=f"d={d}")
    np.testing.assert_allclose(np.asarray(sd.f), np.asarray(s1.f),
                               atol=1e-6, rtol=1e-8, err_msg=f"d={d}")
    assert np.isfinite(float(sd.energy))


def test_sharded_tiled_mesh_block_fast_paths():
    """The sharded engine on a TILED PPPM mesh with the block list and the
    persistent per-device tile assignment — the round-3 fast paths,
    distributed (VERDICT r3 #4).  8.5k atoms force the tiled mesh
    (_use_dense False), pair_path='block' keeps the block fields through
    the sharded sweep, float32 engages the z-binned spread/gather branch
    (kernels auto-disable off-TPU; the XLA twins run here), and two run()
    steps traverse the persistent-assignment refresh."""
    import dataclasses
    from lammps_user_conp2_tpu.ops import pppm as pppm_ops
    from lammps_user_conp2_tpu.utils.config import KSpaceStyle, Solver
    system, md, cfg = workloads.synthetic(n_elyte=8192, nele_side=12,
                                          lz=100.0, lxy=96.0)
    cfgx = dataclasses.replace(cfg, solver=Solver.INV,
                               kspace=KSpaceStyle.PPPM)
    mdx = dataclasses.replace(md, pair_path="block",
                              kspace_style=KSpaceStyle.PPPM)
    conp = setup_conp(system, mdx, cfgx, solve_dtype=jnp.float32)
    eng = build_engine(system, mdx, conp, dtype=jnp.float32)
    assert not pppm_ops._use_dense(eng.pppm_grid, system.natoms)
    assert eng.ncfg is not None and eng.ncfg.block
    mesh = Mesh(np.array(jax.devices()[:8]), ("s",))
    sheng = build_sharded_engine(eng, mesh)
    assert sheng.tasg_fn is not None, "persistent sharded binning inactive"
    st = eng.init_state()
    s1 = jax.jit(eng.step)(jax.jit(eng.step)(st))
    s8 = sheng.run(st, 2)
    assert s8.tasg is not None
    assert tuple(s8.tasg.table.shape) == sheng.tasg_table_shape
    sc = np.abs(np.asarray(s1.f)).max()
    np.testing.assert_allclose(np.asarray(s8.q), np.asarray(s1.q),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(s8.f), np.asarray(s1.f),
                               atol=3e-5 * sc)
    assert np.isfinite(float(s8.energy))


def test_sharded_matfree_synthetic_largeish():
    """CG_MATFREE sharded on a bigger synthetic capacitor (the production-
    scale configuration: matfree solve + cell pair path under shard_map)."""
    import dataclasses
    from lammps_user_conp2_tpu.utils.config import Solver
    system, md, cfg = workloads.synthetic(n_elyte=512, nele_side=8, lz=60.0,
                                          lxy=24.0)
    cfgx = dataclasses.replace(cfg, solver=Solver.CG_MATFREE)
    mesh = Mesh(np.array(jax.devices()[:8]), ("s",))
    for pair_path in ("cell", "nlist", "block"):
        # "block": both engines sweep the block-compacted list (the sharded
        # engine slices the block axis per device, block_pair_rows) — this
        # also pins block-vs-nlist physics agreement through a full step
        mdx = dataclasses.replace(md, pair_path=pair_path,
                                  use_pallas_pair=False)
        conp = setup_conp(system, mdx, cfgx)
        eng = build_engine(system, mdx, conp)
        sheng = build_sharded_engine(eng, mesh)
        st = eng.init_state()
        s1 = jax.jit(eng.step)(st)
        s8 = sheng.step(st)
        np.testing.assert_allclose(np.asarray(s8.q), np.asarray(s1.q),
                                   atol=1e-9, err_msg=pair_path)
        np.testing.assert_allclose(np.asarray(s8.f), np.asarray(s1.f),
                                   atol=1e-6, rtol=1e-8, err_msg=pair_path)
