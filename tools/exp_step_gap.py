#!/usr/bin/env python
"""Localize the 100k step-time gap: the r4 per-phase sums (~24 ms) fall
short of the measured 37 ms step.  Chains compound sections of the real
step to find the unmeasured cost.

Usage: python tools/exp_step_gap.py [n_elyte]
"""
import dataclasses
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
from lammps_user_conp2_tpu.utils.config import KSpaceStyle, Solver
from timing import chain_ms


def main():
    n_elyte = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=23, lz=240.0, lxy=120.0)
    cfg = dataclasses.replace(cfg, solver=Solver.INV, kspace=KSpaceStyle.PPPM)
    md = dataclasses.replace(md, pair_path="auto",
                             kspace_style=KSpaceStyle.PPPM)
    conp = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    eng = build_engine(system, md, conp, dtype=jnp.float32)
    st = eng.init_state()
    jax.block_until_ready(st.x)
    eps_q = jnp.asarray(1e-30, jnp.float32)

    print(f"natoms={system.natoms} mesh_persist={eng.mesh_persist}",
          flush=True)

    full = chain_ms(lambda s: eng.step(s), st)
    print(f"full step                  : {full:7.2f} ms", flush=True)

    # solve_full + compute_forces with the kcache reuse — the step's whole
    # physics, no integrator/rebuild-cond/thermostat
    def phys(s):
        q2, sc, kc = conp.solve_full(s.x, s.q, s.step + 1, s.nbr, eng.ncfg,
                                     scalar_prev=s.scalar_out, tasg=s.tasg)
        f, pe = eng.compute_forces(s.x, q2, sc, kc, s.nbr, s.tasg)
        return s._replace(q=q2, f=f, energy=pe, scalar_out=sc)
    print(f"solve+forces (kcache)      : {chain_ms(phys, st):7.2f} ms",
          flush=True)

    # forces alone with a PRECOMPUTED kcache (true force-path cost)
    kc0 = jax.jit(lambda s: conp.solve_full(
        s.x, s.q, 0, s.nbr, eng.ncfg, tasg=s.tasg)[2])(st)

    def forces_only(s):
        f, pe = eng.compute_forces(s.x, s.q, s.scalar_out, kc0, s.nbr,
                                   s.tasg)
        # x MUST feed back or XLA hoists the whole body out of the loop
        return s._replace(x=s.x + jnp.asarray(1e-30, s.x.dtype) * f,
                          f=f, energy=pe)
    print(f"compute_forces (kcache)    : {chain_ms(forces_only, st):7.2f} ms",
          flush=True)

    # integrator shell: step with physics stubbed out (no solve, no forces)
    def shell(s):
        itg = eng.integrator
        v, xi, vxi = itg.thermostat_half(s.v, s.nhc_xi, s.nhc_vxi, s.step)
        v = itg.kick(v, s.f)
        x = itg.drift(s.x, v)
        from lammps_user_conp2_tpu.ops.neighbors import needs_rebuild
        dummy = needs_rebuild(eng.ncfg, s.nbr, x)
        v = itg.kick(v, s.f)
        v, xi, vxi = itg.thermostat_half(v, xi, vxi, s.step)
        return s._replace(x=x, v=v, nhc_xi=xi, nhc_vxi=vxi,
                          energy=s.energy + jnp.where(dummy, 0.0, 0.0))
    print(f"integrator shell           : {chain_ms(shell, st):7.2f} ms",
          flush=True)

    # integrator shell + the REBUILD COND exactly as Engine.step wires it
    def shell_cond(s):
        itg = eng.integrator
        v, xi, vxi = itg.thermostat_half(s.v, s.nhc_xi, s.nhc_vxi, s.step)
        v = itg.kick(v, s.f)
        x = itg.drift(s.x, v)
        from lammps_user_conp2_tpu.ops import pppm as pppm_ops
        from lammps_user_conp2_tpu.ops.neighbors import (build_neighbor_list,
                                                         needs_rebuild)
        nbr, tasg = s.nbr, s.tasg

        def rebuild(xx):
            nb = build_neighbor_list(eng.ncfg, xx, eng.tables, eng.type_idx)
            if eng.mesh_persist:
                return nb, pppm_ops.tile_assign(eng.pppm_grid, xx)
            return nb, tasg

        nbr, tasg = jax.lax.cond(
            needs_rebuild(eng.ncfg, nbr, x), rebuild,
            lambda xx: (nbr, tasg), x)
        nbr = nbr._replace(overflow=nbr.overflow | s.nbr.overflow)
        v = itg.kick(v, s.f)
        v, xi, vxi = itg.thermostat_half(v, xi, vxi, s.step)
        return s._replace(x=x, v=v, nhc_xi=xi, nhc_vxi=vxi, nbr=nbr,
                          tasg=tasg)
    print(f"shell + rebuild cond       : {chain_ms(shell_cond, st):7.2f} ms",
          flush=True)
    # CAVEAT: under constant f the drift grows quadratically and real
    # rebuilds fire mid-chain — the line above mixes cond overhead with
    # genuine rebuild executions.  The never-true predicate below isolates
    # the cond's FIXED cost (the branch exists but never runs).
    def shell_cond_false(s):
        itg = eng.integrator
        v, xi, vxi = itg.thermostat_half(s.v, s.nhc_xi, s.nhc_vxi, s.step)
        v = itg.kick(v, s.f)
        x = itg.drift(s.x, v)
        from lammps_user_conp2_tpu.ops import pppm as pppm_ops
        from lammps_user_conp2_tpu.ops.neighbors import (build_neighbor_list,
                                                         needs_rebuild)
        nbr, tasg = s.nbr, s.tasg

        def rebuild(xx):
            nb = build_neighbor_list(eng.ncfg, xx, eng.tables, eng.type_idx)
            if eng.mesh_persist:
                return nb, pppm_ops.tile_assign(eng.pppm_grid, xx)
            return nb, tasg

        pred = needs_rebuild(eng.ncfg, nbr, x) & (s.step < -1)
        nbr, tasg = jax.lax.cond(pred, rebuild, lambda xx: (nbr, tasg), x)
        nbr = nbr._replace(overflow=nbr.overflow | s.nbr.overflow)
        v = itg.kick(v, s.f)
        v, xi, vxi = itg.thermostat_half(v, xi, vxi, s.step)
        return s._replace(x=x, v=v, nhc_xi=xi, nhc_vxi=vxi, nbr=nbr,
                          tasg=tasg)
    print(f"shell + cond (never fires) : {chain_ms(shell_cond_false, st):7.2f} ms",
          flush=True)

    # solve_full alone (b + matvec + finish, includes elyte spread + slots)
    def solve_only(s):
        q2, sc, kc = conp.solve_full(s.x, s.q, s.step + 1, s.nbr, eng.ncfg,
                                     scalar_prev=s.scalar_out, tasg=s.tasg)
        return s._replace(q=q2, scalar_out=sc)
    print(f"solve_full (w/ spread)     : {chain_ms(solve_only, st):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
