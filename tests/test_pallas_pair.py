"""Pallas pair kernel must match the XLA dense path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.md import build_engine
from lammps_user_conp2_tpu.models.system import exclusion_lists
from lammps_user_conp2_tpu.ops.pairs import dense_pair_forces, make_pair_tables
from lammps_user_conp2_tpu.ops.pallas.pair_kernel import pair_forces_pallas


def test_pallas_pair_matches_dense():
    system, md, cfg = workloads.dilute(0)
    u = system.units()
    x = jnp.asarray(system.x0)
    q = jnp.asarray(system.q0) + 0.01  # nonzero electrode charges too
    ti = jnp.asarray(system.type)
    tables = make_pair_tables(system.lj_eps, system.lj_sigma, system.type)
    excl = tuple(jnp.asarray(a) for a in exclusion_lists(system))
    kw = dict(box=system.box, periodic=system.periodic, cutoff=md.cutoff,
              g_ewald=0.7723634128, qqr2e=u.qqr2e)
    f1, ev1, ec1 = dense_pair_forces(x, q, ti, tables, excl, **kw)
    f2, ev2, ec2 = pair_forces_pallas(x, q, ti, tables, excl, tr=128, tc=128,
                                      interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(float(ev2), float(ev1), rtol=1e-12)
    np.testing.assert_allclose(float(ec2), float(ec1), rtol=1e-12)


def test_pallas_pair_morton_matches_dense():
    """Morton-ordered tiles with 3-D AABB culling reproduce the dense sweep
    on a box many cutoffs wide in every axis (the large-N production
    geometry), and the culled tile-pair count actually shrinks."""
    from lammps_user_conp2_tpu.ops.pallas.pair_kernel import pair_tile_count

    system, md, cfg = workloads.synthetic(n_elyte=1500, nele_side=8,
                                          lz=40.0, lxy=30.0)
    u = system.units()
    rng = np.random.default_rng(7)
    x = jnp.asarray(system.x0 + 0.05 * rng.standard_normal(system.x0.shape))
    q = jnp.asarray(system.q0)
    ti = jnp.asarray(system.type)
    tables = make_pair_tables(system.lj_eps, system.lj_sigma, system.type)
    excl = tuple(jnp.asarray(a) for a in exclusion_lists(system))
    kw = dict(box=system.box, periodic=system.periodic, cutoff=md.cutoff,
              g_ewald=0.35, qqr2e=u.qqr2e)
    f1, ev1, ec1 = dense_pair_forces(x, q, ti, tables, excl, **kw)
    cnt = pair_tile_count(x, box=system.box, periodic=system.periodic,
                          cutoff=md.cutoff, tr=128, order="morton")
    f2, ev2, ec2 = pair_forces_pallas(
        x, q, ti, tables, excl, tr=128, tc=128, order="morton",
        pair_cap=cnt + 8, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(float(ev2), float(ev1), rtol=1e-12)
    np.testing.assert_allclose(float(ec2), float(ec1), rtol=1e-12)
    # a cap below the live count must NaN-poison, never silently truncate
    f3, ev3, _ = pair_forces_pallas(
        x, q, ti, tables, excl, tr=128, tc=128, order="morton",
        pair_cap=max(cnt // 2, 1), interpret=True, **kw)
    assert not np.isfinite(float(ev3))
    # k-d brick ordering (the production large-N ordering) — same physics
    f4, ev4, ec4 = pair_forces_pallas(
        x, q, ti, tables, excl, tr=128, tc=128, order="kd128",
        interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(f4), np.asarray(f1),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(float(ev4), float(ev1), rtol=1e-12)
    np.testing.assert_allclose(float(ec4), float(ec1), rtol=1e-12)


def test_kd_tile_count_culls_production_geometry():
    """At the 100k production geometry (box many cutoffs wide in every
    axis) the k-d brick ordering must cull laterally: fewer pair SLOTS at
    tr=128 than z-slab ordering at either tile size.  (In small or dense
    boxes z-slabs legitimately win — the engine picks by geometry.)
    Count-only — no kernel execution needed."""
    from lammps_user_conp2_tpu.ops.pallas.pair_kernel import pair_tile_count

    system, md, _ = workloads.synthetic(n_elyte=98304, nele_side=23,
                                        lz=240.0, lxy=120.0)
    rng = np.random.default_rng(3)
    x = system.x0 + 0.15 * rng.standard_normal(system.x0.shape)
    kw = dict(box=system.box, periodic=system.periodic, cutoff=md.cutoff)
    ckd = pair_tile_count(x, tr=128, order="kd128", **kw)
    chil = pair_tile_count(x, tr=128, order="hilbert", **kw)
    cz128 = pair_tile_count(x, tr=128, order="z", **kw)
    cz256 = pair_tile_count(x, tr=256, order="z", **kw)
    ni = (system.natoms + 127) // 128
    ni += 1 - ni % 2
    full = ni * ((ni + 1) // 2)
    assert ckd < 0.05 * full, (ckd, full)
    assert ckd < chil < cz128, (ckd, chil, cz128)
    assert ckd * 128 * 128 < 0.6 * cz256 * 256 * 256, (ckd, cz256)


def test_ele_rows_kernels_match_xla_interpret():
    """Fused electrode-row kernels (b real block + Gaussian correction)
    reproduce the XLA paths exactly (interpret mode, f64)."""
    import numpy as np
    from lammps_user_conp2_tpu import workloads
    from lammps_user_conp2_tpu.models.conp import setup_conp
    from lammps_user_conp2_tpu.models.md import build_engine
    from lammps_user_conp2_tpu.ops.erfc import erfcr_sqrt
    from lammps_user_conp2_tpu.ops.pairs import (conp_correction_forces,
                                                 min_image)
    from lammps_user_conp2_tpu.ops.pallas.ele_rows_kernel import (
        b_realspace_pallas, conp_correction_pallas)

    system, md, cfg = workloads.dilute(0)
    conp = setup_conp(system, md, cfg)
    eng = build_engine(system, md, conp)
    st = eng.init_state()
    x, q = st.x, st.q
    u = system.units()
    kern = conp.kernels
    te = np.asarray(conp.type_idx)[conp.ele_idx]
    nt1 = kern.eta_ij.shape[0]
    ohc = (jnp.asarray(conp.type_idx)[:, None]
           == jnp.arange(nt1)[None, :]).astype(x.dtype)
    eidx = jnp.asarray(conp.ele_idx)

    f_ref, e_ref = conp_correction_forces(
        x, q, eng.elecheck, kern.force, kern.potential, eng.type_idx,
        box=eng.ksp_force.box, periodic=system.periodic, cutoff=md.cutoff,
        qqr2e=u.qqr2e, ele_idx=eidx)
    f_p, e_p = conp_correction_pallas(
        x, q, eidx, jnp.asarray(conp.elyte_mask, x.dtype),
        jnp.asarray(kern.eta_ij[te], x.dtype),
        jnp.asarray(kern.fo_ij[te], x.dtype), ohc,
        box=eng.ksp_force.box, periodic=system.periodic, cutoff=md.cutoff,
        qqr2e=u.qqr2e, interpret=True)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref), atol=1e-13)
    assert abs(float(e_p - e_ref)) < 1e-12

    dt = x.dtype
    xe = x[eidx]
    elyte = jnp.asarray(conp.elyte_mask)
    q_elyte = jnp.where(elyte, q, 0.0)
    g = conp.ksp.g_ewald
    dx = min_image(xe[:, None, :] - x[None, :, :], jnp.asarray(conp.box, dt),
                   conp.periodic)
    rsq = jnp.sum(dx * dx, axis=-1)
    mask = elyte[None, :] & (rsq < conp.cut_coulsq)
    rsq_s = jnp.where(mask, rsq, 1.0)
    dudq = erfcr_sqrt(g * g * rsq_s) * g + kern.potential(
        rsq_s, jnp.asarray(te)[:, None], jnp.asarray(conp.type_idx)[None, :])
    br_ref = -jnp.sum(jnp.where(mask, dudq, 0.0) * q_elyte[None, :], axis=1)
    br_p = b_realspace_pallas(
        x, q_elyte, eidx, jnp.asarray(conp.elyte_mask, dt),
        jnp.asarray(kern.eta_ij[te], dt), jnp.asarray(kern.fo_ij[te], dt),
        ohc, box=conp.box, periodic=conp.periodic,
        cut_coulsq=conp.cut_coulsq, g_ewald=g, interpret=True)
    np.testing.assert_allclose(np.asarray(br_p), np.asarray(br_ref),
                               atol=1e-13)


def test_pallas_pair_fused_conp_correction():
    """conp_fuse folds the Gaussian correction into the pair sweep: the
    result must equal dense pair + dense conp_correction_forces exactly."""
    import jax.numpy as jnp
    from lammps_user_conp2_tpu.models.conp import setup_conp
    from lammps_user_conp2_tpu.ops.pairs import conp_correction_forces

    system, md, cfg = workloads.dilute(0)
    conp = setup_conp(system, md, cfg)
    eng = build_engine(system, md, conp)
    st = eng.init_state()
    x, q = st.x, st.q
    u = system.units()
    kern = conp.kernels
    kw = dict(box=system.box, periodic=system.periodic, cutoff=md.cutoff,
              g_ewald=conp.ksp.g_ewald, qqr2e=u.qqr2e)

    f1, ev1, ec1 = dense_pair_forces(x, q, eng.type_idx, eng.tables,
                                     eng.exclusions, **kw)
    fc1, e1 = conp_correction_forces(
        x, q, eng.elecheck, kern.force, kern.potential, eng.type_idx,
        box=system.box, periodic=system.periodic, cutoff=md.cutoff,
        qqr2e=u.qqr2e, ele_idx=jnp.asarray(conp.ele_idx))

    fuse = ((eng.elecheck != 0).astype(x.dtype),
            jnp.asarray(conp.elyte_mask, x.dtype),
            jnp.asarray(kern.eta_ij, x.dtype),
            jnp.asarray(kern.fo_ij, x.dtype))
    f2, ev2, ec2, e2 = pair_forces_pallas(
        x, q, eng.type_idx, eng.tables, eng.exclusions, tr=128, tc=128,
        conp_fuse=fuse, interpret=True, **kw)

    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1 + fc1),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(float(ev2), float(ev1), rtol=1e-12)
    np.testing.assert_allclose(float(ec2), float(ec1), rtol=1e-12)
    np.testing.assert_allclose(float(e2), float(e1), rtol=1e-10, atol=1e-12)
