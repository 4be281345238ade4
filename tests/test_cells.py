"""Cell-list pair path must match the dense all-pairs path when the box is
large enough that minimum-image == 27-cell search."""

import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu.ops import cells
from lammps_user_conp2_tpu.ops.pairs import dense_pair_forces, make_pair_tables


def _random_system(n=600, box=(40.0, 36.0, 52.0), seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)) * np.array(box))
    q = rng.normal(size=n)
    q -= q.mean()
    q = jnp.asarray(q)
    typ = jnp.asarray(1 + rng.integers(0, 3, n))
    eps = np.zeros((4, 4))
    sig = np.zeros((4, 4))
    for i in range(1, 4):
        for j in range(1, 4):
            eps[i, j] = 0.05 * (i + j)
            sig[i, j] = 2.5 + 0.2 * (i + j)
    tables = make_pair_tables(eps, sig, np.asarray(typ))
    # a few exclusions
    exi = np.full((n, 2), n, np.int32)
    exv = np.zeros((n, 2))
    for k in range(0, 40, 2):
        exi[k, 0] = k + 1
        exi[k + 1, 0] = k
    excl = (jnp.asarray(exi), jnp.asarray(exv))
    return x, q, typ, tables, excl, box


def test_cell_list_matches_dense():
    x, q, typ, tables, excl, box = _random_system()
    kw = dict(g_ewald=0.35, qqr2e=332.06371)
    periodic = (True, True, True)
    cutoff = 8.0
    f1, ev1, ec1 = dense_pair_forces(x, q, typ, tables, excl, box=box,
                                     periodic=periodic, cutoff=cutoff, **kw)
    grid = cells.build_cell_grid(box, (0, 0, 0), cutoff, x.shape[0],
                                 periodic=periodic)
    f2, ev2, ec2, overflow = cells.cell_pair_forces(
        grid, x, q, typ, tables, excl, **kw)
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(ev2), float(ev1), rtol=1e-11)
    np.testing.assert_allclose(float(ec2), float(ec1), rtol=1e-11)


def test_cell_list_nonperiodic_z():
    x, q, typ, tables, excl, box = _random_system(seed=3)
    kw = dict(g_ewald=0.35, qqr2e=332.06371)
    periodic = (True, True, False)
    cutoff = 8.0
    f1, ev1, ec1 = dense_pair_forces(x, q, typ, tables, excl, box=box,
                                     periodic=periodic, cutoff=cutoff, **kw)
    grid = cells.build_cell_grid(box, (0, 0, 0), cutoff, x.shape[0],
                                 periodic=periodic)
    f2, ev2, ec2, overflow = cells.cell_pair_forces(
        grid, x, q, typ, tables, excl, **kw)
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-9, atol=1e-9)


def test_overflow_detection():
    x, q, typ, tables, excl, box = _random_system(n=300)
    grid = cells.build_cell_grid(box, (0, 0, 0), 8.0, 300,
                                 periodic=(True,) * 3, cap=1)
    *_, overflow = cells.cell_pair_forces(
        grid, x, q, typ, tables, excl, g_ewald=0.35, qqr2e=332.06371)
    assert bool(overflow)
