"""Shared per-step z-ordering for the slab-masked Pallas kernels.

The pair kernel and both electrode-row kernels (ops/pallas/pair_kernel.py,
ops/pallas/ele_rows_kernel.py) gate tile pairs on exact per-tile z bounds,
which requires the column atoms in (wrapped) z order.  All three run at the
same positions within a step, so the (N,) argsort is computed ONCE — by the
charge solve, which hands it to the force path through the kcache alongside
the factored-Ewald tables — instead of once per kernel.

The bound tests carry a +1e-3 Angstrom margin (Z_MARGIN): the sort keys and
the kernels' minimum-image distances are computed by different float
expressions, and a pair sitting within a few ulps of the cutoff must never
be dropped by a bound that rounded the other way.  1e-3 A is physically
nothing (neighbor skins are ~1 A) and costs at most one extra tile pair.
"""

from __future__ import annotations

import jax.numpy as jnp

Z_MARGIN = 1e-3


def wrap_z(z, lz, zperiodic):
    if zperiodic:
        return z - lz * jnp.floor(z * (1.0 / lz))
    return z


def z_perm(x, box, periodic):
    """(perm, z_sorted) over the n real atoms; any permutation is CORRECT
    (the masks only lose tightness if the keys are stale), but the tile
    bounds are only tight when the keys are sorted."""
    zs = wrap_z(x[:, 2], float(box[2]), bool(periodic[2]))
    perm = jnp.argsort(zs)
    return perm, zs[perm]
