"""Vectorized erfc kernels matching the reference's polynomial approximants.

The reference uses the Abramowitz & Stegun 7.1.26 polynomial with the
constants EWALD_P/A1..A5 (reference: fix_conp.cpp:53-60) and clamps the
argument at ERFC_MAX=5.8 (erfc(5.8) ~ 2^-52).  We reproduce the exact same
polynomial so A-matrix/b-vector entries agree with the reference to double
roundoff, and the same clamp so the effective real-space cutoff matches
(reference: fix_conp.cpp:1237-1238).

All functions are pure jnp and safe at r=0 (masked callers multiply by a
pair mask; we guard the division).
"""

from __future__ import annotations

import jax.numpy as jnp

EWALD_F = 1.12837917        # 2/sqrt(pi)
EWALD_P = 0.3275911
A1 = 0.254829592
A2 = -0.284496736
A3 = 1.421413741
A4 = -1.453152027
A5 = 1.061405429
ERFC_MAX = 5.8


def erfc_as(x):
    """A&S 7.1.26 erfc(x) for x >= 0 (no clamp)."""
    t = 1.0 / (1.0 + EWALD_P * x)
    return t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * jnp.exp(-x * x)


def erfcr_sqrt(a2_r2):
    """erfc(sqrt(a2_r2)) / sqrt(a2_r2), clamped to 0 beyond ERFC_MAX^2.

    Mirrors FixConp::erfcr_sqrt (reference: fix_conp.cpp:1446-1454).
    For a pair term this is erfc(a*r)/(a*r); multiply by `a` to get
    erfc(a*r)/r.
    """
    a2_r2 = jnp.asarray(a2_r2)
    safe = jnp.maximum(a2_r2, 1e-30)
    a_r = jnp.sqrt(safe)
    expm2 = jnp.exp(-safe)
    t = 1.0 / (1.0 + EWALD_P * a_r)
    val = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2 / a_r
    return jnp.where(a2_r2 < ERFC_MAX * ERFC_MAX, val, 0.0)


def ferfcr_sqrt(a2_r2):
    """erfc(sqrt)/sqrt + (2/sqrt(pi))*exp(-a2_r2), clamped; the force kernel.

    Mirrors FixConp::ferfcr_sqrt (reference: fix_conp.cpp:1456-1465).
    This is d/dr[-erfc(ar)/r] * r^2 / (a... ) in the factored form the
    reference uses: pair force magnitudes are built as ferfcr*a.
    """
    a2_r2 = jnp.asarray(a2_r2)
    safe = jnp.maximum(a2_r2, 1e-30)
    a_r = jnp.sqrt(safe)
    expm2 = jnp.exp(-safe)
    t = 1.0 / (1.0 + EWALD_P * a_r)
    erfcr = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2 / a_r
    return jnp.where(a2_r2 < ERFC_MAX * ERFC_MAX, erfcr + EWALD_F * expm2, 0.0)
