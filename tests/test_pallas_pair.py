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
