"""Engine-level persistent mesh-tile binning (Engine.mesh_persist).

The production 100k configuration amortizes the tile-binning sort over the
Verlet reneighbor interval (MDState.tasg).  These tests force the tiled
PPPM path on a small synthetic capacitor (DENSE_XY_LIMIT monkeypatched
down) and assert the persistent-assignment trajectory is IDENTICAL to the
per-step-binning trajectory through reneighbor events — the binning is a
performance detail, never physics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.conp import setup_conp
from lammps_user_conp2_tpu.models.md import build_engine
from lammps_user_conp2_tpu.ops import pppm as pppm_ops
from lammps_user_conp2_tpu.utils.config import KSpaceStyle, Solver


@pytest.fixture(scope="module")
def tiled_engines():
    """Two engines for the same synthetic deck on a forced-tiled mesh:
    one with the persistent assignment, one with per-step binning."""
    old = pppm_ops._use_dense
    pppm_ops._use_dense = lambda grid, n: False   # force the tiled path
    try:
        system, md, cfg = workloads.synthetic(n_elyte=320, nele_side=6,
                                              lz=40.0, lxy=16.0)
        cfg = dataclasses.replace(cfg, solver=Solver.CG_MATFREE,
                                  kspace=KSpaceStyle.PPPM)
        # small skin -> reneighbor (and assignment-rebuild) events fire
        # within the short test trajectories
        md = dataclasses.replace(md, pair_path="nlist",
                                 kspace_style=KSpaceStyle.PPPM,
                                 neighbor_skin=0.3)
        conp = setup_conp(system, md, cfg)
        eng_p = build_engine(system, md, conp)
        assert eng_p.mesh_persist, (
            "the skin/margin gate should admit this configuration")
        eng_n = dataclasses.replace(eng_p, mesh_persist=False,
                                    _run_cache={})
        yield eng_p, eng_n
    finally:
        pppm_ops._use_dense = old


@pytest.mark.slow
def test_persistent_trajectory_matches_per_step_binning(tiled_engines):
    eng_p, eng_n = tiled_engines
    st_p = eng_p.init_state()
    st_n = eng_n.init_state()
    assert st_p.tasg is not None and st_n.tasg is None
    np.testing.assert_array_equal(np.asarray(st_p.q), np.asarray(st_n.q))
    # enough steps for atoms to drift across tile boundaries and for at
    # least one reneighbor event (skin trigger) inside the scan
    st_p, _ = eng_p.run(st_p, 40, thermo_every=0)
    st_n, _ = eng_n.run(st_n, 40, thermo_every=0)
    assert np.isfinite(float(st_p.energy))
    np.testing.assert_allclose(np.asarray(st_p.x), np.asarray(st_n.x),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(st_p.q), np.asarray(st_n.q),
                               rtol=0, atol=0)
    np.testing.assert_allclose(float(st_p.energy), float(st_n.energy),
                               rtol=0, atol=0)


@pytest.mark.slow
def test_tile_overflow_recovery_grows_capacity():
    """An undersized mesh tile capacity NaN-poisons the step (fail-loud,
    TileSlots.overflow); Engine.run retries with a grown tile_cap — no
    sticky mesh flag reaches the state, so the retry is blind but bounded —
    and completes with physics identical to a correctly-sized engine.
    Companion to tests/test_neighbors.py::test_overflow_recovery_grows_
    capacity (LAMMPS neighbor-page reallocation, SURVEY.md 2.3-1)."""
    old = pppm_ops._use_dense
    pppm_ops._use_dense = lambda grid, n: False
    try:
        system, md, cfg = workloads.synthetic(n_elyte=320, nele_side=6,
                                              lz=40.0, lxy=16.0)
        cfg = dataclasses.replace(cfg, solver=Solver.CG_MATFREE,
                                  kspace=KSpaceStyle.PPPM)
        md = dataclasses.replace(md, pair_path="nlist",
                                 kspace_style=KSpaceStyle.PPPM)
        conp_ok = setup_conp(system, md, cfg)
        eng_ok = build_engine(system, md, conp_ok)
        conp_bad = setup_conp(system, md, cfg)
        eng_bad = build_engine(system, md, conp_bad)
        occ = pppm_ops.tile_occupancy(
            dataclasses.replace(eng_bad.pppm_grid, tile_cap=None),
            system.x0)
        bad = dataclasses.replace(eng_bad.pppm_grid,
                                  tile_cap=max(1, occ // 2))
        object.__setattr__(eng_bad, "pppm_grid", bad)
        object.__setattr__(conp_bad, "pppm_grid", bad)
        st_bad = eng_bad.init_state()
        assert not np.isfinite(float(st_bad.energy))
        f_bad, _ = eng_bad.run(st_bad, 3)
        f_ok, _ = eng_ok.run(eng_ok.init_state(), 3)
        assert eng_bad.pppm_grid.tile_cap > bad.tile_cap
        assert np.isfinite(float(f_bad.energy))
        np.testing.assert_allclose(np.asarray(f_bad.x), np.asarray(f_ok.x),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(f_bad.q), np.asarray(f_ok.q),
                                   atol=1e-10)
    finally:
        pppm_ops._use_dense = old


@pytest.mark.slow
def test_persistent_assignment_actually_rebuilds(tiled_engines):
    """The carried assignment changes at a reneighbor event (the lax.cond
    rebuild branch is exercised, not just the identity path).  Force the
    trigger deterministically: shift every atom by > skin/2 in x — physics
    is identical up to the (periodic) translation, but needs_rebuild fires
    on the next step."""
    eng_p, _ = tiled_engines
    st = eng_p.init_state()
    tbl0 = np.asarray(st.tasg.table)
    # shift the ELECTROLYTE up by several mesh cells: well past skin/2
    # (the trigger fires, and the rebuild runs BEFORE the refresh so a
    # large shift is safe) and far enough that at least one ion lattice
    # layer (4 A apart) crosses a z-bin boundary, so the rebuilt table
    # must differ.  Electrodes stay put — the z-plane fast path correctly
    # fail-louds if they move off their setup planes.
    sz = 4.05
    assert sz > 0.5 * eng_p.ncfg.skin
    ely = ~jnp.asarray(eng_p.system.elecheck != 0)
    x2 = st.x.at[:, 2].add(jnp.where(ely, sz, 0.0))
    st2 = st._replace(x=x2)
    st3 = jax.block_until_ready(eng_p.step(st2))
    assert not np.array_equal(np.asarray(st3.tasg.table), tbl0), (
        "assignment not rebuilt on a reneighbor event")
    assert np.isfinite(float(st3.energy))
