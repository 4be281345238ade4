#!/usr/bin/env python
"""Per-phase step-time breakdown on the real TPU (chained loops per
CLAUDE.md).  Usage: python tools/step_breakdown.py [workload] [trial]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.conp import setup_conp
from lammps_user_conp2_tpu.models.md import build_engine


def chain_ms(fn, x0, iters=500, trials=3):
    """Per-iteration ms of a chained loop.  iters large: the axon tunnel
    carries ~35 ms of fixed per-call overhead (35/iters ms/iter bias)."""
    run = jax.jit(lambda s: jax.lax.fori_loop(0, iters, lambda i, t: fn(t), s))
    s = jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = jax.block_until_ready(run(s))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "il_twolayer"
    trial = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    system, md, cfg = getattr(workloads, name)(trial)
    conp = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    eng = build_engine(system, md, conp, dtype=jnp.float32)
    st = eng.init_state()
    x, q = st.x, st.q
    eps = jnp.asarray(1e-30, x.dtype)
    u = system.units()
    box = eng.ksp_force.box
    per = system.periodic

    # total step
    full = chain_ms(lambda s: eng.step(s), st)
    print(f"full step            : {full:7.3f} ms")

    # charge solve
    def f_solve(xx):
        qn, sc, rho = conp.solve_full(xx, q, 0)
        return xx + eps * qn[:, None]
    print(f"solve_full           : {chain_ms(f_solve, x):7.3f} ms")

    # pair forces (the engine's actual path)
    def f_pair(xx):
        if eng.use_pallas:
            from lammps_user_conp2_tpu.ops.pallas.pair_kernel import \
                pair_forces_pallas
            f, ev, ec = pair_forces_pallas(
                xx, q, eng.type_idx, eng.tables, eng.exclusions,
                box=box, periodic=per, cutoff=md.cutoff,
                g_ewald=eng.ksp_force.g_ewald, qqr2e=u.qqr2e)
        else:
            from lammps_user_conp2_tpu.ops.pairs import dense_pair_forces
            f, ev, ec = dense_pair_forces(
                xx, q, eng.type_idx, eng.tables, eng.exclusions,
                box=box, periodic=per, cutoff=md.cutoff,
                g_ewald=eng.ksp_force.g_ewald, qqr2e=u.qqr2e)
        return xx + eps * f
    print(f"pair forces          : {chain_ms(f_pair, x):7.3f} ms"
          f"  (pallas={eng.use_pallas})")

    # k-space forces
    if eng.fksp is not None:
        from lammps_user_conp2_tpu.ops import ewald_factored as ewf
        def f_ksp(xx):
            e, f = ewf.energy_forces_f(eng.fksp, xx, q)
            return xx + eps * f
        print(f"kspace forces        : {chain_ms(f_ksp, x):7.3f} ms")
    elif eng.pppm_grid is not None:
        from lammps_user_conp2_tpu.ops import pppm as pppm_ops
        def f_ksp(xx):
            rho = pppm_ops.spread(eng.pppm_grid, xx, q)
            ek, ef = pppm_ops.pppm_energy_efield(eng.pppm_grid, rho)
            fk = q[:, None] * pppm_ops.gather3(eng.pppm_grid, ef, xx)
            return xx + eps * fk
        print(f"pppm forces          : {chain_ms(f_ksp, x):7.3f} ms")

    # conp correction (the engine's actual branch)
    from lammps_user_conp2_tpu.models.conp import PALLAS_ROWS_MIN_PAIRS
    import numpy as np
    kern = conp.kernels
    def f_corr(xx):
        if (xx.dtype == jnp.float32 and
                conp.ne * xx.shape[0] >= PALLAS_ROWS_MIN_PAIRS):
            from lammps_user_conp2_tpu.ops.pallas.ele_rows_kernel import \
                conp_correction_pallas
            te = np.asarray(conp.type_idx)[conp.ele_idx]
            fc, ec = conp_correction_pallas(
                xx, q, jnp.asarray(conp.ele_idx),
                jnp.asarray(conp.elyte_mask, xx.dtype),
                jnp.asarray(kern.eta_ij[te], xx.dtype),
                jnp.asarray(kern.fo_ij[te], xx.dtype),
                eng.tables.onehot, box=box, periodic=per,
                cutoff=md.cutoff, qqr2e=u.qqr2e)
        else:
            from lammps_user_conp2_tpu.ops.pairs import conp_correction_forces
            fc, ec = conp_correction_forces(
                xx, q, eng.elecheck, kern.force, kern.potential,
                eng.type_idx, box=box, periodic=per, cutoff=md.cutoff,
                qqr2e=u.qqr2e, ele_idx=jnp.asarray(conp.ele_idx))
        return xx + eps * fc
    print(f"conp correction      : {chain_ms(f_corr, x):7.3f} ms")

    # bonded
    from lammps_user_conp2_tpu.ops import bonded as B
    bonds = jnp.asarray(system.bonds)
    bco = jnp.asarray(system.bond_coeffs)
    angs = jnp.asarray(system.angles)
    aco = jnp.asarray(system.angle_coeffs)
    def f_bond(xx):
        f, e = B.bonded_forces(xx, bonds, bco, angs, aco, box=box, periodic=per)
        return xx + eps * f
    print(f"bonded               : {chain_ms(f_bond, x):7.3f} ms")

    # SHAKE + RATTLE
    if eng.cons is not None:
        from lammps_user_conp2_tpu.models.shake import (shake_positions,
                                                        rattle_velocities)
        v = st.v
        def f_shake(xx):
            xn, dv = shake_positions(eng.cons, xx + 0.001, xx,
                                     eng.integrator.dt, box=box, periodic=per)
            vn = rattle_velocities(eng.cons, xn, v + dv, box=box, periodic=per)
            return xx + eps * (xn + 1e-30 * vn)
        print(f"shake+rattle         : {chain_ms(f_shake, x):7.3f} ms")

    # full compute_forces (everything force-side at once)
    def f_forces(xx):
        f, pe = eng.compute_forces(xx, q, jnp.asarray(0.0, xx.dtype))
        return xx + eps * f
    print(f"compute_forces total : {chain_ms(f_forces, x):7.3f} ms")


if __name__ == "__main__":
    main()
