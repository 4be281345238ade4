#!/usr/bin/env python
"""Per-phase breakdown of the 100k-atom production step on the real TPU.

Configuration matches tools/bench_large.py: PPPM (tiled spread/gather),
CG_MATFREE electrode solve, Verlet neighbor lists.  Chained >=50-iteration
loops per CLAUDE.md (the axon tunnel carries ~35 ms fixed per call).

Usage: python tools/step_breakdown_large.py [natoms_elyte] [nele_side]
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
from lammps_user_conp2_tpu.models.conp import setup_conp
from lammps_user_conp2_tpu.models.md import build_engine
from lammps_user_conp2_tpu.ops import pppm as pppm_ops
from lammps_user_conp2_tpu.ops.neighbors import (build_neighbor_list,
                                                 nlist_pair_forces)
from lammps_user_conp2_tpu.utils.config import KSpaceStyle, Solver


from timing import chain_ms


def main():
    # flag-style operands first (pair path / solver), positionals after
    pair = "block"
    for a in ("nlist", "block"):
        if a in sys.argv:
            pair = a
            sys.argv.remove(a)
    solver = Solver.CG_MATFREE
    if "inv" in sys.argv:
        solver = Solver.INV
        sys.argv.remove("inv")
    n_elyte = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    nele_side = int(sys.argv[2]) if len(sys.argv) > 2 else 23
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=nele_side, lz=240.0, lxy=120.0)
    cfg = dataclasses.replace(cfg, solver=solver, kspace=KSpaceStyle.PPPM)
    md = dataclasses.replace(md, pair_path=pair,
                             kspace_style=KSpaceStyle.PPPM)
    conp = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    eng = build_engine(system, md, conp, dtype=jnp.float32)
    st = eng.init_state()
    jax.block_until_ready(st.x)
    x, q, nbr = st.x, st.q, st.nbr
    grid = eng.pppm_grid
    u = system.units()
    eps = jnp.asarray(1e-30, x.dtype)
    print(f"natoms={system.natoms} grid=({grid.nx},{grid.ny},{grid.nz}) "
          f"k_max={eng.ncfg.k_max}")

    full = chain_ms(lambda s: eng.step(s), st)
    print(f"full step              : {full:7.2f} ms", flush=True)

    from lammps_user_conp2_tpu.ops.neighbors import block_pair_forces
    sweep = block_pair_forces if eng.ncfg.block else nlist_pair_forces

    def f_pair(xx):
        f, ev, ec, ov = sweep(
            eng.ncfg, nbr, xx, q, eng.type_idx, eng.tables,
            eng.exclusions, g_ewald=eng.ksp_force.g_ewald, qqr2e=u.qqr2e)
        return xx + eps * f
    print(f"pair sweep ({pair:5s})    : {chain_ms(f_pair, x):7.2f} ms",
          flush=True)

    def f_rebuild(xx):
        nb = build_neighbor_list(eng.ncfg, xx, eng.tables, eng.type_idx)
        # block lists carry no LJ planes since r4 — chain on whichever
        # field the built list actually has
        dep = nb.lj if nb.lj is not None else nb.idx.astype(xx.dtype)
        return xx + eps * jnp.sum(dep)
    reb = chain_ms(f_rebuild, x, iters=20)
    print(f"nlist rebuild          : {reb:7.2f} ms  (amortized over "
          f"~20-step skin interval: {reb / 20:.2f} ms/step)", flush=True)

    def f_slots(xx):
        s = pppm_ops.tile_slots(grid, xx, q)
        return xx + eps * (jnp.sum(s.qs) + jnp.sum(s.dxs))
    print(f"tile_slots build       : {chain_ms(f_slots, x):7.2f} ms",
          flush=True)

    def f_assign(xx):
        a = pppm_ops.tile_assign(grid, xx)
        return xx + eps * jnp.sum(a.table).astype(xx.dtype)
    print(f"tile_assign (sort)     : {chain_ms(f_assign, x):7.2f} ms  "
          f"(amortized over the reneighbor interval; mesh_persist="
          f"{eng.mesh_persist})", flush=True)

    asg0 = jax.jit(lambda xx: pppm_ops.tile_assign(grid, xx))(x)
    def f_refresh(xx):
        s = pppm_ops.refresh_tile_slots(grid, asg0, xx, q)
        return xx + eps * (jnp.sum(s.qs) + jnp.sum(s.dxs))
    print(f"refresh_tile_slots     : {chain_ms(f_refresh, x):7.2f} ms  "
          f"(the per-step binning cost under mesh_persist)", flush=True)

    slots0 = jax.jit(lambda xx: pppm_ops.tile_slots(grid, xx, q))(x)
    def f_spread(xx):
        rho = pppm_ops.spread(grid, xx, q, slots=slots0)
        return xx + eps * rho[0, 0, 0]
    print(f"pppm spread (slots)    : {chain_ms(f_spread, x):7.2f} ms",
          flush=True)

    # ---- the FINAL production-path phases (fused spread, zbin Poisson +
    # gather, z-plane b readout, solver matvec) — the phases the r03
    # breakdown never measured ("unmeasured = unoptimized")
    def f_spread_rhok(xx):
        rk = pppm_ops.spread_rhok(grid, xx, q, slots=slots0)
        return xx + eps * jnp.real(rk[0, 0, 0])
    print(f"spread_rhok (fused)    : {chain_ms(f_spread_rhok, x):7.2f} ms",
          flush=True)

    rhok0 = jax.jit(lambda a: pppm_ops.spread_rhok(grid, a, q,
                                                   slots=slots0))(x)
    def f_zbin_u(r):
        ek, uzb = pppm_ops.pppm_energy_u_zbin(grid, r, x.shape[0])
        return r + eps * (ek + uzb[0, 0, 0, 0])
    print(f"energy_u_zbin (poisson): {chain_ms(f_zbin_u, rhok0):7.2f} ms",
          flush=True)

    _, uz0 = jax.jit(lambda r: pppm_ops.pppm_energy_u_zbin(
        grid, r, x.shape[0]))(rhok0)
    def f_gz(xx):
        e3 = pppm_ops.gather3_ad_zbin(grid, uz0, xx, slots=slots0)
        return xx + eps * e3
    print(f"gather3_ad_zbin        : {chain_ms(f_gz, x):7.2f} ms",
          flush=True)

    if conp.ele_zplanes is not None:
        eix_d = jnp.asarray(conp.ele_idx)
        def f_bread(xx):
            up = pppm_ops.u_on_zplanes(grid, rhok0, conp.ele_zplanes)
            bb = pppm_ops.gather_zplanes(grid, up, xx[eix_d],
                                         conp.ele_zpinv)
            return xx + eps * jnp.sum(bb)
        print(f"b zplane readout       : {chain_ms(f_bread, x):7.2f} ms",
              flush=True)

    if hasattr(conp.ctx, "ainv") and conp.ctx.ainv is not None \
            and conp.ctx.ainv.shape[0] > 1:
        b0 = jnp.ones((conp.ctx.ainv.shape[0],), jnp.float32)
        def f_mv(bb):
            el = jnp.matmul(conp.ctx.ainv, bb,
                            precision=jax.lax.Precision.HIGHEST)
            return bb + eps * el
        print(f"INV matvec             : {chain_ms(f_mv, b0):7.2f} ms",
              flush=True)

    from lammps_user_conp2_tpu.ops.neighbors import (
        b_realspace_from_list, conp_correction_from_list)
    eix_d = jnp.asarray(conp.ele_idx)
    def f_brows(xx):
        br = b_realspace_from_list(
            eng.ncfg, nbr, xx, q, eix_d, conp.elyte_mask,
            jnp.asarray(conp.type_idx), conp.kernels.potential,
            g_ewald=eng.ksp_force.g_ewald, cut_coulsq=conp.cut_coulsq)
        return xx + eps * jnp.sum(br)
    print(f"b real rows (list)     : {chain_ms(f_brows, x):7.2f} ms",
          flush=True)

    def f_corr(xx):
        fc, ec = conp_correction_from_list(
            eng.ncfg, nbr, xx, q, eix_d, conp.elyte_mask, eng.type_idx,
            conp.kernels.force, conp.kernels.potential,
            cutoff=eng.md.cutoff, qqr2e=u.qqr2e)
        return xx + eps * (fc + ec)
    print(f"conp correction (list) : {chain_ms(f_corr, x):7.2f} ms",
          flush=True)

    def f_refresh0(xx):
        s = pppm_ops.refresh_tile_slots(grid, st.tasg, xx, q) \
            if st.tasg is not None else pppm_ops.tile_slots(grid, xx, q)
        return xx + eps * (jnp.sum(s.qs) + jnp.sum(s.dxs))
    print(f"slot refresh (step)    : {chain_ms(f_refresh0, x):7.2f} ms",
          flush=True)

    eix = jnp.asarray(conp.ele_idx)
    xe, qe = jax.jit(lambda a, b: (a[eix], b[eix]))(x, q)
    def f_spread_ele(xx):
        rho = pppm_ops.spread(grid, xx, qe)
        return xx + eps * rho[0, 0, 0]
    print(f"pppm spread (ele only) : {chain_ms(f_spread_ele, xe):7.2f} ms",
          flush=True)

    rho0 = jax.jit(lambda a, b: pppm_ops.spread(grid, a, b))(x, q)
    def f_pu(r):
        uu = pppm_ops.poisson_u(grid, r)
        return r + eps * uu
    print(f"poisson_u (2 FFTs)     : {chain_ms(f_pu, rho0):7.2f} ms",
          flush=True)

    def f_fft(r):
        ek, uu = pppm_ops.pppm_energy_u(grid, r)
        return r + eps * uu * ek
    print(f"pppm energy+u (2 FFTs) : {chain_ms(f_fft, rho0):7.2f} ms",
          flush=True)

    u0 = jax.jit(lambda r: pppm_ops.poisson_u(grid, r))(rho0)
    def f_gather(xx):
        fk = q[:, None] * pppm_ops.gather3_ad(grid, u0, xx, slots=slots0)
        return xx + eps * fk
    print(f"gather3_ad (slots)     : {chain_ms(f_gather, x):7.2f} ms",
          flush=True)

    def f_solve(xx):
        qn, sc, rho = conp.solve_full(xx, q, 0, nbr, eng.ncfg)
        return xx + eps * qn[:, None]
    print(f"charge solve (CG)      : {chain_ms(f_solve, x):7.2f} ms",
          flush=True)

    def f_b(xx):
        b, kc = conp.b_vector_full(xx, q, nbr, eng.ncfg)
        return xx + eps * jnp.sum(b)
    print(f"b vector (spread+u+g)  : {chain_ms(f_b, x):7.2f} ms",
          flush=True)

    def f_forces(xx):
        f, pe = eng.compute_forces(xx, q, jnp.asarray(0.0, xx.dtype),
                                   None, nbr)
        return xx + eps * f
    print(f"compute_forces total   : {chain_ms(f_forces, x):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
