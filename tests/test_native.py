"""Native C++ data loader must agree exactly with the Python parser on every
reference data file; dump frames written natively must round-trip."""

import os

import numpy as np
import pytest

from lammps_user_conp2_tpu.utils import data_io, dump, native
from lammps_user_conp2_tpu.workloads import REF_TESTS

FILES = [f"{REF_TESTS}/{d}/data" for d in
         ("dilute", "il_onelayer", "il_twolayer", "cond", "cond2", "zmirror")]


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
@pytest.mark.parametrize("path", FILES)
def test_native_parser_matches_python(path):
    if not os.path.exists(path):
        pytest.skip("reference tests not mounted")
    a = data_io.parse_data_file(path, use_native=True)
    b = data_io.parse_data_file_py(path)
    np.testing.assert_array_equal(a.tag, b.tag)
    np.testing.assert_array_equal(a.mol, b.mol)
    np.testing.assert_array_equal(a.type, b.type)
    np.testing.assert_array_equal(a.q, b.q)
    np.testing.assert_array_equal(a.x, b.x)
    np.testing.assert_array_equal(a.v, b.v)
    np.testing.assert_array_equal(a.mass_by_type, b.mass_by_type)
    np.testing.assert_array_equal(a.bonds, b.bonds)
    np.testing.assert_array_equal(a.angles, b.angles)
    np.testing.assert_array_equal(a.box_lo, b.box_lo)
    np.testing.assert_array_equal(a.box_hi, b.box_hi)
    np.testing.assert_array_equal(a.bond_coeffs, b.bond_coeffs)
    np.testing.assert_array_equal(a.angle_coeffs, b.angle_coeffs)


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_native_dump_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 17
    tag = np.arange(1, n + 1)
    x = rng.uniform(0, 10, (n, 3))
    q = rng.normal(size=n)
    path = str(tmp_path / "t.traj")
    assert native.write_dump_frame_native(path, "w", 5, (0, 0, 0), (10, 10, 10),
                                          tag, x, q)
    assert native.write_dump_frame_native(path, "a", 10, (0, 0, 0), (10, 10, 10),
                                          tag, x * 2, q)
    frames = dump.read_dump(path)
    assert [f[0] for f in frames] == [5, 10]
    np.testing.assert_allclose(
        np.stack([frames[0][2]["xu"], frames[0][2]["yu"], frames[0][2]["zu"]],
                 axis=1), x, rtol=1e-7)
    np.testing.assert_allclose(frames[0][2]["q"], q, rtol=1e-7)


_PAIRIJ_DATA = """test PairIJ
4 atoms
2 atom types
0.0 10.0 xlo xhi
0.0 10.0 ylo yhi
0.0 10.0 zlo zhi

Masses

1 1.0
2 2.0

PairIJ Coeffs

1 1 0.1 3.0
1 2 0.2 3.5
2 2 0.3 4.0

Atoms

1 1 1 0.5 1.0 1.0 1.0
2 1 1 -0.5 2.0 2.0 2.0
3 2 2 0.5 3.0 3.0 3.0
4 2 2 -0.5 4.0 4.0 4.0
"""


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_native_pair_ij_coeffs(tmp_path):
    """PairIJ Coeffs must parse natively (a data file using it would
    otherwise silently get all-zero LJ tables; round-1 advisor finding).
    Also covers bond/angle-type-free files (guarded fills)."""
    from lammps_user_conp2_tpu.utils import data_io
    path = str(tmp_path / "pij.data")
    with open(path, "w") as f:
        f.write(_PAIRIJ_DATA)
    d_nat = data_io.parse_data_file(path)
    d_py = data_io.parse_data_file(path, use_native=False)
    assert d_nat.pair_coeffs_ij is not None
    np.testing.assert_allclose(d_nat.pair_coeffs_ij, d_py.pair_coeffs_ij)
    np.testing.assert_allclose(d_nat.pair_coeffs_ij[1, 2], [0.2, 3.5])
    np.testing.assert_allclose(d_nat.pair_coeffs_ij[2, 1], [0.2, 3.5])
