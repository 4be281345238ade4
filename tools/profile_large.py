#!/usr/bin/env python
"""Per-phase breakdown of the production 100k-atom configuration
(PPPM + CG_MATFREE + Verlet lists) on the real TPU.

Every phase is timed as a CHAINED loop (state feeding back) per CLAUDE.md:
repeated identical device calls are memoized on the tunnel and every call
carries ~35 ms fixed overhead, so only chains report real per-iteration
cost.  Set CONP2_TPU_COMPILE_CACHE=.jax_cache to amortize the ~10 min
first compile.

Usage: python tools/profile_large.py [natoms_elyte] [nele_side] [--cpu]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.conp import (cg_solve, make_matfree_operator,
                                               setup_conp)
from lammps_user_conp2_tpu.models.md import build_engine
from lammps_user_conp2_tpu.utils.config import KSpaceStyle, Solver


def chain_ms(fn, x0, iters=100, trials=3):
    run = jax.jit(lambda s: jax.lax.fori_loop(0, iters, lambda i, t: fn(t), s))
    s = jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = jax.block_until_ready(run(s))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    n_elyte = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    nele_side = int(sys.argv[2]) if len(sys.argv) > 2 else 23
    lz = float(sys.argv[3]) if len(sys.argv) > 3 else 240.0
    lxy = float(sys.argv[4]) if len(sys.argv) > 4 else 120.0
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=nele_side, lz=lz, lxy=lxy)
    cfg = dataclasses.replace(cfg, solver=Solver.CG_MATFREE,
                              kspace=KSpaceStyle.PPPM)
    md = dataclasses.replace(md, pair_path="nlist",
                             kspace_style=KSpaceStyle.PPPM)
    t0 = time.time()
    conp = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    eng = build_engine(system, md, conp, dtype=jnp.float32)
    st = eng.init_state()
    jax.block_until_ready(st.x)
    print(f"setup: {time.time() - t0:.1f} s  natoms={system.natoms} "
          f"ne={conp.ne} K={eng.ncfg.k_max} grid={conp.pppm_grid.shape} "
          f"cells={eng.ncfg.grid.ncells}x cap={eng.ncfg.grid.cap}")
    x, q, nbr = st.x, st.q, st.nbr
    eps = jnp.asarray(1e-30, x.dtype)
    u = system.units()
    res = {}

    def rec(name, val):
        res[name] = val
        unit = "" if name == "cg_iterations" else " ms"
        print(f"{name:22s}: {val:8.3f}{unit}", flush=True)

    rec("full_step", chain_ms(lambda s: eng.step(s), st, iters=20))

    # --- pair path
    from lammps_user_conp2_tpu.ops.neighbors import (build_neighbor_list,
                                                     nlist_pair_forces)

    def f_pair(xx):
        f, ev, ec, ov = nlist_pair_forces(
            eng.ncfg, nbr, xx, q, eng.type_idx, eng.tables, eng.exclusions,
            g_ewald=eng.ksp_force.g_ewald, qqr2e=u.qqr2e)
        return xx + eps * f
    rec("pair_nlist", chain_ms(f_pair, x, iters=50))

    def f_rebuild(xx):
        nl = build_neighbor_list(eng.ncfg, xx, eng.tables, eng.type_idx)
        # depend on idx + lj so the build isn't dead-code-eliminated
        return xx + eps * (jnp.sum(nl.idx.astype(xx.dtype))
                           + jnp.sum(nl.lj[0]))
    rec("nbr_rebuild", chain_ms(f_rebuild, x, iters=20))

    # --- PPPM phases
    from lammps_user_conp2_tpu.ops import pppm as pppm_ops
    grid = eng.pppm_grid

    def f_spread(xx):
        rho = pppm_ops.spread(grid, xx, q)
        return xx + eps * jnp.sum(rho) * jnp.ones_like(xx)
    rec("pppm_spread", chain_ms(f_spread, x, iters=50))

    # eager large-N dispatches are unreliable on the axon tunnel — jit prep
    rho0 = jax.jit(lambda xx, qq: pppm_ops.spread(grid, xx, qq))(x, q)

    def f_fft(rr):
        ek, ef = pppm_ops.pppm_energy_efield(grid, rr)
        return rr + eps * ek
    rec("pppm_fft_efield", chain_ms(f_fft, rho0, iters=50))

    ef0 = jax.jit(lambda rr: pppm_ops.pppm_energy_efield(grid, rr)[1])(rho0)

    def f_gather(xx):
        g3 = pppm_ops.gather3(grid, ef0, xx)
        return xx + eps * g3
    rec("pppm_gather3", chain_ms(f_gather, x, iters=50))

    def f_poisson_u(rr):
        um = pppm_ops.poisson_u(grid, rr)
        return rr + eps * jnp.sum(um)
    rec("pppm_poisson_u", chain_ms(f_poisson_u, rho0, iters=50))

    # --- charge solve phases
    def f_solve(xx):
        qn, sc, rho = conp.solve_full(xx, q, 0, nbr, eng.ncfg)
        return xx + eps * qn[:, None]
    rec("solve_full", chain_ms(f_solve, x, iters=20))

    from lammps_user_conp2_tpu.ops.neighbors import (
        b_realspace_from_list, conp_correction_from_list)

    def f_breal(xx):
        b = b_realspace_from_list(
            eng.ncfg, nbr, xx, q, jnp.asarray(conp.ele_idx), conp.elyte_mask,
            jnp.asarray(conp.type_idx), conp.kernels.potential,
            g_ewald=eng.ksp_force.g_ewald, cut_coulsq=conp.cut_coulsq)
        return xx + eps * jnp.sum(b)
    rec("b_realspace_list", chain_ms(f_breal, x, iters=50))

    def f_corr(xx):
        fc, ec = conp_correction_from_list(
            eng.ncfg, nbr, xx, q, jnp.asarray(conp.ele_idx), conp.elyte_mask,
            jnp.asarray(conp.type_idx), conp.kernels.force,
            conp.kernels.potential, cutoff=md.cutoff, qqr2e=u.qqr2e)
        return xx + eps * fc
    rec("conp_correction_list", chain_ms(f_corr, x, iters=50))

    # one matfree A.p application (CG inner loop body)
    xe = x[conp.ele_idx]
    apply_a = make_matfree_operator(
        conp.fksp, xe, conp.ctx.real_block, conp.ctx.diag_extra,
        slabflag=conp.ksp.slabflag, volume=conp.ksp.volume)

    def f_apply(pp):
        return pp + eps * apply_a(pp)
    p0 = jnp.asarray(np.random.RandomState(0).standard_normal(conp.ne),
                     jnp.float32)
    rec("matfree_apply", chain_ms(f_apply, p0, iters=200))

    rec("cg_iterations", conp.cg_iterations(x, q, nbr, eng.ncfg))

    # spread of electrolyte only (the b-vector's mesh phase)
    q_elyte = jnp.where(jnp.asarray(conp.elyte_mask), q, 0.0)

    def f_spread_e(xx):
        rho = pppm_ops.spread(grid, xx, q_elyte)
        return xx + eps * jnp.sum(rho) * jnp.ones_like(xx)
    rec("pppm_spread_elyte", chain_ms(f_spread_e, x, iters=50))



if __name__ == "__main__":
    main()
