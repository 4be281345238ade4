"""SHAKE / RATTLE holonomic constraints (LAMMPS fix shake semantics).

The il decks constrain the 3-site BMI cation (bond types 1,2 + the 180-degree
angle, tests/il_onelayer/input: ``fix bmishake bmi shake 0.0001 10 0 t 1 2 3
b 1 2 a 1``), making each cation a rigid linear rotor.  We implement classic
SHAKE (post-drift position correction, velocities adjusted by dx/dt) plus
RATTLE velocity projection after the force kick.

Constraints are flat arrays (ncons, 2) of atom pairs with target distances;
angle constraints become 1-3 distances via the law of cosines (LAMMPS
shake3angle equivalent).  The iteration is Jacobi (all constraints updated in
parallel with scatter-add), which is jit/TPU friendly and converges for the
2/3-constraint clusters LAMMPS supports; a fixed iteration count in
lax.fori_loop keeps shapes static.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pairs import min_image


@dataclasses.dataclass(frozen=True)
class ShakeConstraints:
    """Static constraint table."""
    ai: jnp.ndarray       # (C,) int
    aj: jnp.ndarray       # (C,)
    dist2: jnp.ndarray    # (C,) target squared distances
    invmi: jnp.ndarray    # (C,)
    invmj: jnp.ndarray    # (C,)
    n_in_group: np.ndarray  # host (N,) int — constraints counted per atom (dof bookkeeping)

    @property
    def ncons(self) -> int:
        return len(np.asarray(self.ai))


def build_constraints(system, shake_cfg) -> ShakeConstraints | None:
    """From topology + ShakeConfig (bond types, angle types, group mask)."""
    if shake_cfg is None:
        return None
    gmask = system.groups[shake_cfg.group]
    pairs = []
    d0 = []
    bond_r0 = {int(t): system.bond_coeffs[t, 1] for t in range(len(system.bond_coeffs))}
    bonded = {}
    for (t, i, j) in system.bonds:
        if int(t) in shake_cfg.btypes and gmask[i] and gmask[j]:
            pairs.append((int(i), int(j)))
            d0.append(bond_r0[int(t)])
        bonded[(int(i), int(j))] = bond_r0[int(t)]
        bonded[(int(j), int(i))] = bond_r0[int(t)]
    for (t, i, j, k) in system.angles:
        if int(t) in shake_cfg.atypes and gmask[i] and gmask[j] and gmask[k]:
            # law of cosines 1-3 distance from the two constrained bonds
            r1 = bonded[(int(i), int(j))]
            r2 = bonded[(int(j), int(k))]
            th = system.angle_coeffs[int(t), 1] * math.pi / 180.0
            d13 = math.sqrt(r1 * r1 + r2 * r2 - 2 * r1 * r2 * math.cos(th))
            pairs.append((int(i), int(k)))
            d0.append(d13)
    if not pairs:
        return None
    pairs = np.array(pairs, np.int64)
    d0 = np.array(d0)
    ncount = np.zeros(system.natoms, np.int64)
    # LAMMPS counts each constraint once against the cluster; for group dof
    # we attribute 1 dof per constraint (all cluster atoms in one group here)
    for (i, j) in pairs:
        ncount[i] += 1
    inv_m = 1.0 / system.mass
    return ShakeConstraints(
        ai=jnp.asarray(pairs[:, 0]),
        aj=jnp.asarray(pairs[:, 1]),
        dist2=jnp.asarray(d0 * d0),
        invmi=jnp.asarray(inv_m[pairs[:, 0]]),
        invmj=jnp.asarray(inv_m[pairs[:, 1]]),
        n_in_group=ncount,
    )


def shake_positions(cons: ShakeConstraints, x_new, x_old, dt, *, box, periodic,
                    iters: int = 50, omega: float = 1.0):
    """Iteratively correct x_new so constraints hold; returns (x, dv).

    dv = (x_corrected - x_new)/dt is added to velocities (classic SHAKE).
    Reference geometry r_old comes from pre-drift positions x_old.
    """
    boxj = jnp.asarray(box, x_new.dtype)
    r_old = min_image(x_old[cons.ai] - x_old[cons.aj], boxj, periodic)  # (C,3)
    invm_sum = cons.invmi + cons.invmj

    def body(_, x):
        r_new = min_image(x[cons.ai] - x[cons.aj], boxj, periodic)
        diff = jnp.sum(r_new * r_new, axis=1) - cons.dist2
        denom = 2.0 * invm_sum * jnp.sum(r_new * r_old, axis=1)
        lam = omega * diff / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        dxi = -(lam * cons.invmi)[:, None] * r_old
        dxj = (lam * cons.invmj)[:, None] * r_old
        x = x.at[cons.ai].add(dxi)
        x = x.at[cons.aj].add(dxj)
        return x

    x = jax.lax.fori_loop(0, iters, body, x_new)
    dv = (x - x_new) / dt
    return x, dv


def rattle_velocities(cons: ShakeConstraints, x, v, *, box, periodic,
                      iters: int = 50, omega: float = 1.0):
    """Project velocities onto the constraint manifold (sum v_ij . r_ij = 0)."""
    boxj = jnp.asarray(box, x.dtype)
    r = min_image(x[cons.ai] - x[cons.aj], boxj, periodic)
    invm_sum = cons.invmi + cons.invmj
    denom = invm_sum * jnp.sum(r * r, axis=1)

    def body(_, v):
        vij = v[cons.ai] - v[cons.aj]
        mu = omega * jnp.sum(vij * r, axis=1) / denom
        v = v.at[cons.ai].add(-(mu * cons.invmi)[:, None] * r)
        v = v.at[cons.aj].add((mu * cons.invmj)[:, None] * r)
        return v

    return jax.lax.fori_loop(0, iters, body, v)
