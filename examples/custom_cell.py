"""Minimal example: build a custom constant-potential cell from scratch
(no LAMMPS data file) and run it.

    python examples/custom_cell.py            # CPU f64
"""

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.conp import setup_conp
from lammps_user_conp2_tpu.models.md import build_engine
from lammps_user_conp2_tpu.models.diagnostics import potential_atom
import jax.numpy as jnp


def main():
    # the synthetic workload builds a parallel-plate capacitor; swap in your
    # own LammpsData / build_system(...) call for real systems
    system, md, cfg = workloads.synthetic(n_elyte=128, nele_side=6)
    solver = setup_conp(system, md, cfg)
    print(f"{system.natoms} atoms, {solver.ne} electrode atoms, "
          f"g_ewald={solver.ksp.g_ewald:.4f}, <e,e>={solver.ee_diag:.4g}")

    engine = build_engine(system, md, solver)
    state = engine.init_state()
    state, thermo = engine.run(state, 50, thermo_every=10)
    for k in range(len(np.asarray(thermo["step"]))):
        print(f"step {int(thermo['step'][k]):4d}  T={float(thermo['temp'][k]):8.2f}  "
              f"qleft={float(thermo['qleft'][k]):+.6f}  f_e={float(thermo['f_e'][k]):+.6f}")

    # electrode potentials should sit at -+dV/2
    pot = potential_atom(
        state.x, state.q, group_mask=np.ones(system.natoms, bool),
        elecheck=jnp.asarray(system.elecheck), box=system.box,
        periodic=system.periodic, cutoff=md.cutoff,
        g_ewald=solver.ksp.g_ewald, evscale=solver.evscale,
        volume=solver.ksp.volume, eta=cfg.eta, slabflag=solver.ksp.slabflag,
        kvecs=jnp.asarray(solver.ksp.kvecs), ug=jnp.asarray(solver.ksp.ug))
    pl = float(np.asarray(pot)[system.ele_left_mask].mean())
    pr = float(np.asarray(pot)[system.ele_right_mask].mean())
    print(f"electrode potentials: left {pl:+.4f} V, right {pr:+.4f} V "
          f"(applied dV = {cfg.target} V)")


if __name__ == "__main__":
    main()
