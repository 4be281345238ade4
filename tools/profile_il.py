#!/usr/bin/env python
"""Per-phase timing of the il_twolayer step on the real TPU.

Every phase is measured as a CHAINED fori_loop (output feeds the next
iteration's input) — repeated identical calls are memoized somewhere in the
axon relay and read ~0 ms (CLAUDE.md).  Three trials, report the min.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.conp import setup_conp
from lammps_user_conp2_tpu.models.md import build_engine


from timing import chain_ms as _chain_ms

CHAIN_ITERS = int(os.environ.get('PROFILE_ITERS', '1000'))


def chain_ms(fn, x0, iters=None, trials=3):
    iters = CHAIN_ITERS if iters is None else iters
    return _chain_ms(fn, x0, iters=iters, trials=trials)


def main():
    system, md, cfg = workloads.il_twolayer(0)
    conp = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    eng = build_engine(system, md, conp, dtype=jnp.float32)
    st = eng.init_state()
    print("backend:", jax.devices()[0])
    n = system.natoms
    print("natoms", n, "ne", conp.ne, "pallas", eng.use_pallas,
          "pppm", eng.pppm_grid is not None, "fksp", eng.fksp is not None)

    # full step
    ms = chain_ms(eng.step, st)
    print(f"full step           : {ms:8.3f} ms  ({1e3/ms:.1f} steps/s)")

    x, q = st.x, st.q
    eps = jnp.asarray(1e-30, x.dtype)

    # charge solve chained via q
    f_solve = lambda qq: conp.solve(x, qq, 1)[0]
    print(f"charge solve        : {chain_ms(f_solve, q):8.3f} ms")

    # b-vector only (chain via q write)
    def f_b(qq):
        b = conp.b_vector(x, qq)
        return qq.at[jnp.asarray(conp.ele_idx)].set(b.astype(qq.dtype) * eps + qq[jnp.asarray(conp.ele_idx)])
    print(f"  b-vector          : {chain_ms(f_b, q):8.3f} ms")

    # full force path chained via x
    def f_forces(xx):
        f, pe = eng.compute_forces(xx, q, jnp.zeros((), x.dtype))
        return xx + eps * f
    print(f"forces (all)        : {chain_ms(f_forces, x):8.3f} ms")

    # pair sweep only
    u = system.units()
    if eng.use_pallas:
        from lammps_user_conp2_tpu.ops.pallas.pair_kernel import pair_forces_pallas
        def f_pair(xx):
            f, ev, ec = pair_forces_pallas(
                xx, q, eng.type_idx, eng.tables, eng.exclusions,
                box=eng.ksp_force.box, periodic=system.periodic,
                cutoff=md.cutoff, g_ewald=eng.ksp_force.g_ewald, qqr2e=u.qqr2e)
            return xx + eps * f
    else:
        from lammps_user_conp2_tpu.ops.pairs import dense_pair_forces
        def f_pair(xx):
            f, ev, ec = dense_pair_forces(
                xx, q, eng.type_idx, eng.tables, eng.exclusions,
                box=eng.ksp_force.box, periodic=system.periodic,
                cutoff=md.cutoff, g_ewald=eng.ksp_force.g_ewald, qqr2e=u.qqr2e)
            return xx + eps * f
    print(f"  pair sweep        : {chain_ms(f_pair, x):8.3f} ms")

    # k-space forces
    if eng.fksp is not None:
        from lammps_user_conp2_tpu.ops import ewald_factored as ewf
        def f_ksp(xx):
            e, f = ewf.energy_forces_f(eng.fksp, xx, q)
            return xx + eps * f
        print(f"  kspace forces     : {chain_ms(f_ksp, x):8.3f} ms")

    # conp correction
    from lammps_user_conp2_tpu.ops.pairs import conp_correction_forces
    def f_corr(xx):
        fc, ec = conp_correction_forces(
            xx, q, eng.elecheck, conp.kernels.force, conp.kernels.potential,
            eng.type_idx, box=eng.ksp_force.box, periodic=system.periodic,
            cutoff=md.cutoff, qqr2e=u.qqr2e, ele_idx=jnp.asarray(conp.ele_idx))
        return xx + eps * fc
    print(f"  conp correction   : {chain_ms(f_corr, x):8.3f} ms")

    # SHAKE + integrator shell: step minus (solve + forces) is the rest
    # bonded
    from lammps_user_conp2_tpu.ops.bonded import angle_forces, bond_forces
    def f_bond(xx):
        fb, eb = bond_forces(xx, jnp.asarray(system.bonds),
                             jnp.asarray(system.bond_coeffs),
                             box=eng.ksp_force.box, periodic=system.periodic)
        fa, ea = angle_forces(xx, jnp.asarray(system.angles),
                              jnp.asarray(system.angle_coeffs),
                              box=eng.ksp_force.box, periodic=system.periodic)
        return xx + eps * (fb + fa)
    print(f"  bonded            : {chain_ms(f_bond, x):8.3f} ms")

    if eng.cons is not None:
        from lammps_user_conp2_tpu.models.shake import shake_positions
        def f_shake(xx):
            xs, dv = shake_positions(eng.cons, xx, x, eng.integrator.dt,
                                     box=eng.ksp_force.box,
                                     periodic=system.periodic)
            return xx + eps * xs
        print(f"  shake             : {chain_ms(f_shake, x):8.3f} ms")


if __name__ == "__main__":
    main()
