import math

import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu.ops import erfc as ec


def test_erfc_as_matches_math_erfc():
    xs = np.linspace(0.01, 5.0, 200)
    ours = np.asarray(ec.erfc_as(jnp.asarray(xs)))
    ref = np.array([math.erfc(x) for x in xs])
    # A&S 7.1.26 absolute accuracy ~1.5e-7
    assert np.max(np.abs(ours - ref)) < 2e-7


def test_erfcr_sqrt_value_and_clamp():
    a, r = 0.9, 2.3
    v = float(ec.erfcr_sqrt(jnp.asarray(a * a * r * r)))
    assert abs(v - math.erfc(a * r) / (a * r)) < 1e-7
    # clamped beyond ERFC_MAX
    assert float(ec.erfcr_sqrt(jnp.asarray(ec.ERFC_MAX ** 2 * 1.01))) == 0.0
    # safe at 0 (masked callers)
    assert np.isfinite(float(ec.erfcr_sqrt(jnp.asarray(0.0))))


def test_ferfcr_sqrt_is_force_kernel():
    # -d/dr [erfc(ar)/r] = erfc(ar)/r^2 + (2a/sqrt(pi)) exp(-a^2r^2)/r
    #                    = ferfcr_sqrt(a^2r^2) * a / r  ... check numerically
    a, r = 1.3, 1.7
    h = 1e-6
    f_num = -(math.erfc(a * (r + h)) / (r + h) - math.erfc(a * (r - h)) / (r - h)) / (2 * h)
    f_ours = float(ec.ferfcr_sqrt(jnp.asarray(a * a * r * r))) * a / r
    assert abs(f_num - f_ours) < 1e-5
