"""Mode-lattice equivalence oracles (the reference's physics-level test
strategy, SURVEY.md section 4): the same physical cell solved as
slab / ffield / doubled-cell(noslab+zneutr) must produce the same electrode
charges at identical configurations."""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.conp import setup_conp


def _solve(n):
    system, md, cfg = workloads.dilute(n)
    s = setup_conp(system, md, cfg)
    q, scal = s.solve(jnp.asarray(system.x0), jnp.asarray(system.q0), 0)
    return system, np.asarray(q), float(scal)


@pytest.fixture(scope="module")
def slab_charges():
    system, q, _ = _solve(0)
    return float(q[system.ele_left_mask].sum())


def test_ffield_matches_slab(slab_charges):
    system, q, _ = _solve(2)
    qleft = float(q[system.ele_left_mask].sum())
    assert abs(qleft - slab_charges) < 1e-5


def test_doubled_sym_matches_slab(slab_charges):
    system, q, _ = _solve(3)
    pos = system.x0[:, 2] > 0
    for half in (pos, ~pos):
        ql = float(q[system.ele_left_mask & half].sum())
        qr = float(q[system.ele_right_mask & half].sum())
        assert abs(ql - slab_charges) < 1e-5
        assert abs(ql + qr) < 1e-9     # zneutr: each half neutral


def test_doubled_anti_neg_half_matches_slab(slab_charges):
    system, q, _ = _solve(4)
    neg = system.x0[:, 2] < 0        # the unmodified original cell
    ql = float(q[system.ele_left_mask & neg].sum())
    qr = float(q[system.ele_right_mask & neg].sum())
    assert abs(ql - slab_charges) < 1e-5
    assert abs(ql + qr) < 1e-9
