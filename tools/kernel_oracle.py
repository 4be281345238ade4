#!/usr/bin/env python
"""TPU-lowering oracle: every Mosaic kernel vs its XLA twin ON THE REAL
DEVICE at production-like shapes.

The CI suite runs all Pallas kernels in interpret mode on CPU — that has
twice let bugs through that only exist in real Mosaic lowering (round 3:
"Only 2D gather is supported" on a kernel that passed interpret mode; bf16
one-pass dots unless Precision.HIGHEST).  This oracle runs each kernel
pair compiled for the actual backend and asserts agreement, so an
interpret-vs-Mosaic divergence cannot ship silently.  bench.py runs it and
records "kernel_oracle": "ok" in the gating JSON.  Reference anchor: the
reference's decks always exercise the real compiled binary, never a
simulator (/root/reference/tests/il_onelayer/input:92-107).

Checks (all float32):
  spread_rhok   fused slot-rows->z-binned-mesh kernel vs XLA patch+merge
  spread_tiled  per-tile patch-build kernel vs XLA scan
  gather_zbin   fused z-binned ad gather kernel vs XLA tile scan
  block_pair    masked (NB, B, U) VMEM chain vs XLA block sweep
  tile_pair     kd-brick tile-pair kernel vs O(N^2) dense reference
  ele_rows      fused CONP correction rows vs XLA dense rows
  b_rows        fused b-vector electrode rows vs the Verlet-list rows
  shake/rattle  fused constraint-cluster kernel vs XLA vmapped solver

Exit 0 and final line "kernel_oracle ok" iff every check passes.
Usage: python tools/kernel_oracle.py [--interpret] (CPU debug mode)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.conp import setup_conp
from lammps_user_conp2_tpu.models.md import build_engine
from lammps_user_conp2_tpu.ops import pppm as pppm_ops
from lammps_user_conp2_tpu.utils.config import KSpaceStyle, Solver

FAILED = []


@jax.jit
def _cmp(a, b):
    """Device-side comparison scalars: complex64 arrays cannot be
    transferred to host through the axon relay (bare UNIMPLEMENTED — and
    the failed transfer poisons the backend for subsequent calls), so the
    reduction must happen on device and only real f32 scalars come back."""
    d = jnp.max(jnp.abs(a - b)).astype(jnp.float32)
    s = jnp.max(jnp.abs(b)).astype(jnp.float32)
    fin = jnp.all(jnp.isfinite(jnp.abs(a)))
    return d, s, fin


def check(name, got_fn, ref_fn, tol):
    """Each side is a thunk: a kernel that fails to LOWER on the real
    device is itself a finding, recorded as a FAIL instead of aborting
    the remaining checks."""
    try:
        got, ref = got_fn(), ref_fn()
        gl, rl = jax.tree.leaves(got), jax.tree.leaves(ref)
        # zip() would silently truncate if a kernel dropped an output
        # (ADVICE r4) — unequal leaf counts are themselves a failure
        assert len(gl) == len(rl), f"leaf count {len(gl)} != {len(rl)}"
        r, fin = 0.0, True
        for g, rf in zip(gl, rl):
            d, s, f = _cmp(g, rf)
            r = max(r, float(d) / max(float(s), 1e-30))
            fin = fin and bool(f)
        ok = r <= tol and fin
        print(f"  {name:12s}: rel={r:.2e} tol={tol:.0e} "
              f"{'ok' if ok else 'FAIL'}", flush=True)
    except Exception as e:  # noqa: BLE001 — keep probing the other kernels
        print(f"  {name:12s}: ERROR {repr(e)[:160]}", flush=True)
        ok = False
    if not ok:
        FAILED.append(name)


def main():
    t0 = time.time()
    kw = dict(interpret=True) if INTERPRET else dict()
    if os.environ.get("ORACLE_SKIP_BASE") == "1":
        # production-only invocation (bench.py two-pass budgeting):
        # the imports the production section needs from the base
        pass
    else:
        # ~25k-atom capacitor at the bench_large density; PPPM tiled active
        # lxy=81 -> a (96, 96, 384) mesh with 16-point xy tiles: lane-aligned,
        # so the fused Mosaic mesh kernel actually lowers (asserted below)
        system, md, cfg = workloads.synthetic(
            n_elyte=24576, nele_side=12, lz=120.0, lxy=81.0)
        cfg = dataclasses.replace(cfg, solver=Solver.INV, kspace=KSpaceStyle.PPPM)
        md = dataclasses.replace(md, pair_path="block",
                                 kspace_style=KSpaceStyle.PPPM)
        # NO setup_conp: the A-matrix assembly + inverse (~2-3 min at
        # this size) is never used by kernel comparisons — build only the
        # pieces the checks consume (kernels tables, masks, cut)
        import types
        from lammps_user_conp2_tpu.models.electrodes import make_kernels
        from lammps_user_conp2_tpu.ops.erfc import ERFC_MAX
        eng = build_engine(system, md, None, dtype=jnp.float32)
        conp = types.SimpleNamespace(
            kernels=make_kernels(cfg, system),
            ele_idx=np.nonzero(system.ele_mask)[0],
            elyte_mask=~system.ele_mask,
            type_idx=np.asarray(eng.type_idx),
            cut_coulsq=min(md.cutoff ** 2,
                           (ERFC_MAX / eng.ksp_force.g_ewald) ** 2))
        grid = eng.pppm_grid
        u = system.units()
        # NO init_state: it compiles the full first solve+force program
        # (~100+ s) that the kernel comparisons never use.  Deterministic
        # nonzero charges everywhere (incl. electrodes) exercise the full
        # index paths of both kernel sides identically.
        from lammps_user_conp2_tpu.ops.neighbors import build_neighbor_list
        x = jnp.asarray(system.x0, jnp.float32)
        q = (jnp.asarray(system.q0, jnp.float32)
             + 0.01 * jnp.cos(jnp.arange(system.natoms) * 0.61))
        nbr = jax.jit(lambda xx: build_neighbor_list(
            eng.ncfg, xx, eng.tables, eng.type_idx))(x)
        jax.block_until_ready(x)
        print(f"system natoms={system.natoms} grid={grid.shape} "
              f"backend={jax.default_backend()} ({time.time()-t0:.0f}s setup)",
              flush=True)

        # ---- PPPM spread: fused mesh kernel vs XLA patch+merge path
        slots = jax.jit(lambda xx, qq: pppm_ops.tile_slots(grid, xx, qq))(x, q)
        f_pal = jax.jit(lambda xx, qq: pppm_ops._spread_rhok_tiled(
            grid, xx, qq, use_pallas=True, **kw))
        f_xla = jax.jit(lambda xx, qq: pppm_ops._spread_rhok_tiled(
            grid, xx, qq, use_pallas=False))
        from lammps_user_conp2_tpu.ops.pallas.pppm_spread import (
            spread_mesh_pallas_supported)
        geom = pppm_ops._tile_geometry(grid, system.natoms)
        assert spread_mesh_pallas_supported(tly=geom.tly, nty=geom.nty), \
            "oracle system must exercise the fused mesh kernel"
        check("spread_rhok", lambda: f_pal(x, q), lambda: f_xla(x, q), 2e-5)

        f_pal2 = jax.jit(lambda xx, qq: pppm_ops.spread_tiled(
            grid, xx, qq, use_pallas=True, **kw))
        f_xla2 = jax.jit(lambda xx, qq: pppm_ops.spread_tiled(
            grid, xx, qq, use_pallas=False))
        check("spread_tiled", lambda: f_pal2(x, q), lambda: f_xla2(x, q), 2e-5)

        # ---- PPPM z-binned ad gather: fused kernel vs XLA tile scan
        rhok = f_xla = None
        rhok = jax.jit(lambda xx, qq: pppm_ops._spread_rhok_tiled(
            grid, xx, qq, use_pallas=False))(x, q)
        _, uz = jax.jit(lambda rk: pppm_ops.pppm_energy_u_zbin(
            grid, rk, x.shape[0]))(rhok)
        g_pal = jax.jit(lambda uu, xx: pppm_ops.gather3_ad_zbin(
            grid, uu, xx, slots=slots, use_pallas=True, **kw))
        g_xla = jax.jit(lambda uu, xx: pppm_ops.gather3_ad_zbin(
            grid, uu, xx, slots=slots, use_pallas=False))
        check("gather_zbin", lambda: g_pal(uz, x), lambda: g_xla(uz, x), 2e-5)

        # ---- block pair sweep: Mosaic VMEM chain vs XLA block sweep
        from lammps_user_conp2_tpu.ops.neighbors import (
            b_realspace_from_list, block_pair_forces)
        bp = jax.jit(lambda xx: block_pair_forces(
            eng.ncfg, nbr, xx, q, eng.type_idx, eng.tables, eng.exclusions,
            g_ewald=eng.ksp_force.g_ewald, qqr2e=u.qqr2e, use_pallas=True,
            **kw)[:3])
        bx = jax.jit(lambda xx: block_pair_forces(
            eng.ncfg, nbr, xx, q, eng.type_idx, eng.tables, eng.exclusions,
            g_ewald=eng.ksp_force.g_ewald, qqr2e=u.qqr2e, use_pallas=False)[:3])
        check("block_pair", lambda: bp(x), lambda: bx(x), 2e-5)

        # fused CONP correction variant: Mosaic gated chain vs the XLA twin
        kernf = conp.kernels
        fuse_b = ((eng.elecheck != 0).astype(jnp.float32),
                  jnp.asarray(conp.elyte_mask, jnp.float32),
                  kernf.eta_ij, kernf.fo_ij, eng.type_idx)
        bpf = jax.jit(lambda xx: block_pair_forces(
            eng.ncfg, nbr, xx, q, eng.type_idx, eng.tables, eng.exclusions,
            g_ewald=eng.ksp_force.g_ewald, qqr2e=u.qqr2e, use_pallas=True,
            conp_fuse=fuse_b, **kw)[:4])
        bxf = jax.jit(lambda xx: block_pair_forces(
            eng.ncfg, nbr, xx, q, eng.type_idx, eng.tables, eng.exclusions,
            g_ewald=eng.ksp_force.g_ewald, qqr2e=u.qqr2e, use_pallas=False,
            conp_fuse=fuse_b)[:4])
        check("block_fused", lambda: bpf(x), lambda: bxf(x), 2e-5)

        # ---- tile-pair kernel vs O(N^2) dense reference (smaller system)
        from lammps_user_conp2_tpu.ops.pairs import dense_pair_forces
        from lammps_user_conp2_tpu.ops.pallas.pair_kernel import (
            pair_forces_pallas, pair_tile_count)
        sys2, md2, _ = workloads.synthetic(n_elyte=6144, nele_side=8,
                                           lz=60.0, lxy=53.0)
        eng2 = build_engine(sys2, md2, None, dtype=jnp.float32)
        x2 = jnp.asarray(sys2.x0, jnp.float32)
        q2 = jnp.asarray(sys2.q0, jnp.float32)
        pkw = dict(box=eng2.ksp_force.box, periodic=sys2.periodic,
                   cutoff=md2.cutoff, g_ewald=eng2.ksp_force.g_ewald,
                   qqr2e=u.qqr2e)
        cnt = pair_tile_count(sys2.x0.astype(np.float32), box=sys2.box,
                              periodic=sys2.periodic, cutoff=md2.cutoff,
                              tr=128, order="kd128")
        tp = jax.jit(lambda xx: pair_forces_pallas(
            xx, q2, eng2.type_idx, eng2.tables, eng2.exclusions,
            order="kd128", tr=128, tc=128, pair_cap=cnt + 8, **pkw, **kw))
        td = jax.jit(lambda xx: dense_pair_forces(
            xx, q2, eng2.type_idx, eng2.tables, eng2.exclusions, **pkw))
        check("tile_pair", lambda: tp(x2), lambda: td(x2), 2e-5)

        # ---- CONP electrode-row kernels vs XLA twins
        from lammps_user_conp2_tpu.ops.pairs import conp_correction_forces
        from lammps_user_conp2_tpu.ops.pallas.ele_rows_kernel import (
            b_realspace_pallas, conp_correction_pallas)
        kern = conp.kernels
        eix = jnp.asarray(conp.ele_idx)
        te = np.asarray(conp.type_idx)[conp.ele_idx]
        cp = jax.jit(lambda xx: conp_correction_pallas(
            xx, q, eix, jnp.asarray(conp.elyte_mask, jnp.float32),
            jnp.asarray(kern.eta_ij[te], jnp.float32),
            jnp.asarray(kern.fo_ij[te], jnp.float32), eng.tables.onehot,
            box=eng.ksp_force.box, periodic=system.periodic, cutoff=md.cutoff,
            qqr2e=u.qqr2e, **kw))
        cx = jax.jit(lambda xx: conp_correction_forces(
            xx, q, eng.elecheck, kern.force, kern.potential, eng.type_idx,
            box=eng.ksp_force.box, periodic=system.periodic, cutoff=md.cutoff,
            qqr2e=u.qqr2e, ele_idx=eix))
        check("ele_rows", lambda: cp(x), lambda: cx(x), 2e-5)

        q_elyte = jnp.where(eng.elecheck != 0, 0.0, q)
        nt1 = kern.eta_ij.shape[0]
        ohc = (jnp.asarray(conp.type_idx)[:, None]
               == jnp.arange(nt1)[None, :]).astype(jnp.float32)
        g = eng.ksp_force.g_ewald
        bpal = jax.jit(lambda xx: b_realspace_pallas(
            xx, q_elyte, eix, jnp.asarray(conp.elyte_mask, jnp.float32),
            jnp.asarray(kern.eta_ij[te], jnp.float32),
            jnp.asarray(kern.fo_ij[te], jnp.float32), ohc,
            box=eng.ksp_force.box, periodic=system.periodic,
            cut_coulsq=conp.cut_coulsq, g_ewald=g, **kw))
        blst = jax.jit(lambda xx: b_realspace_from_list(
            eng.ncfg, nbr, xx, q_elyte, eix, conp.elyte_mask,
            jnp.asarray(conp.type_idx), kern.potential, g_ewald=g,
            cut_coulsq=conp.cut_coulsq))
        check("b_rows", lambda: bpal(x), lambda: blst(x), 2e-5)

        # ---- SHAKE/RATTLE fused kernel vs XLA vmapped solver (il BMI rings)
        from lammps_user_conp2_tpu.models import shake as shake_mod
        sys3, md3, cfg3 = workloads.il_onelayer(0)
        # no conp/init_state: SHAKE only needs the constraint clusters,
        # positions, and velocities — skip the unused solve compile
        eng3 = build_engine(sys3, md3, None, dtype=jnp.float32)
        assert eng3.cons is not None, "il deck lost its SHAKE constraints"
        dt3 = eng3.integrator.dt
        xo = jnp.asarray(sys3.x0, jnp.float32)
        v3 = jnp.asarray(sys3.v0, jnp.float32)
        xn = xo + dt3 * (v3 + 0.02 * jnp.sin(jnp.arange(xo.size)
                                             .reshape(xo.shape) * 0.37))
        box3, per3 = eng3.ksp_force.box, sys3.periodic
        sp = jax.jit(lambda a, b: shake_mod.shake_positions(
            eng3.cons, a, b, dt3, box=box3, periodic=per3))
        rp = jax.jit(lambda a, v: shake_mod.rattle_velocities(
            eng3.cons, a, v, box=box3, periodic=per3))
        orig_gate = shake_mod._use_pallas
        try:
            got_s = sp(xn, xo)
            got_r = rp(xo, v3)
            shake_mod._use_pallas = lambda dtype: False
            sx = jax.jit(lambda a, b: shake_mod.shake_positions(
                eng3.cons, a, b, dt3, box=box3, periodic=per3))
            rx = jax.jit(lambda a, v: shake_mod.rattle_velocities(
                eng3.cons, a, v, box=box3, periodic=per3))
            check("shake", lambda: got_s, lambda: sx(xn, xo), 5e-5)
            check("rattle", lambda: got_r, lambda: rx(xo, v3), 5e-5)
        finally:
            shake_mod._use_pallas = orig_gate

    # ---- PRODUCTION geometry (VERDICT r4 task 5): the 25k pass above
    # caught a shape-dependent lowering bug in round 4 ("block shape
    # divisible by 8") — a lowering failure specific to the bench_large
    # shapes ((144, 144, 729) grid, 98k atoms) could still pass it, so the
    # four mesh/block kernels re-run at the real bench geometry.  Mosaic
    # use is asserted, not assumed: use_pallas=True errors rather than
    # falling back, and the mesh-spread geometry gate is asserted.
    if os.environ.get("ORACLE_SKIP_PRODUCTION") != "1":
        from lammps_user_conp2_tpu.ops.neighbors import block_pair_forces
        from lammps_user_conp2_tpu.ops.pallas.pppm_spread import (
            spread_mesh_pallas_supported)
        print("production geometry pass:", flush=True)
        sysP, mdP, _ = workloads.synthetic(
            n_elyte=98304, nele_side=23, lz=240.0, lxy=120.0)
        u = sysP.units()   # same 'real' units as the base system
        mdP = dataclasses.replace(mdP, pair_path="block",
                                  kspace_style=KSpaceStyle.PPPM)
        engP = build_engine(sysP, mdP, None, dtype=jnp.float32)
        gridP = engP.pppm_grid
        xP = jnp.asarray(sysP.x0, jnp.float32)
        qP = jnp.asarray(sysP.q0, jnp.float32)
        # charges: the synthetic electrodes start at q=0 which would zero
        # the electrode contributions — give every atom a deterministic
        # nonzero charge so the kernels' full index paths are exercised
        qP = qP + 0.01 * jnp.cos(jnp.arange(sysP.natoms) * 0.61)
        from lammps_user_conp2_tpu.ops.neighbors import build_neighbor_list
        nbrP = jax.jit(lambda xx: build_neighbor_list(
            engP.ncfg, xx, engP.tables, engP.type_idx))(xP)
        geomP = pppm_ops._tile_geometry(gridP, sysP.natoms)
        assert spread_mesh_pallas_supported(tly=geomP.tly, nty=geomP.nty), \
            "production geometry must exercise the fused mesh kernel"
        print(f"  natoms={sysP.natoms} grid={gridP.shape}", flush=True)
        slotsP = jax.jit(lambda xx, qq: pppm_ops.tile_slots(
            gridP, xx, qq))(xP, qP)
        check("P:spread_rhok",
              lambda: jax.jit(lambda xx, qq: pppm_ops._spread_rhok_tiled(
                  gridP, xx, qq, use_pallas=True, **kw))(xP, qP),
              lambda: jax.jit(lambda xx, qq: pppm_ops._spread_rhok_tiled(
                  gridP, xx, qq, use_pallas=False))(xP, qP), 2e-5)
        check("P:spread_tiled",
              lambda: jax.jit(lambda xx, qq: pppm_ops.spread_tiled(
                  gridP, xx, qq, use_pallas=True, **kw))(xP, qP),
              lambda: jax.jit(lambda xx, qq: pppm_ops.spread_tiled(
                  gridP, xx, qq, use_pallas=False))(xP, qP), 2e-5)
        rhokP = jax.jit(lambda xx, qq: pppm_ops._spread_rhok_tiled(
            gridP, xx, qq, use_pallas=False))(xP, qP)
        _, uzP = jax.jit(lambda rk: pppm_ops.pppm_energy_u_zbin(
            gridP, rk, xP.shape[0]))(rhokP)
        check("P:gather_zbin",
              lambda: jax.jit(lambda uu, xx: pppm_ops.gather3_ad_zbin(
                  gridP, uu, xx, slots=slotsP, use_pallas=True, **kw))(uzP, xP),
              lambda: jax.jit(lambda uu, xx: pppm_ops.gather3_ad_zbin(
                  gridP, uu, xx, slots=slotsP, use_pallas=False))(uzP, xP),
              2e-5)
        check("P:block_pair",
              lambda: jax.jit(lambda xx: block_pair_forces(
                  engP.ncfg, nbrP, xx, qP, engP.type_idx, engP.tables,
                  engP.exclusions, g_ewald=engP.ksp_force.g_ewald,
                  qqr2e=u.qqr2e, use_pallas=True, **kw)[:3])(xP),
              lambda: jax.jit(lambda xx: block_pair_forces(
                  engP.ncfg, nbrP, xx, qP, engP.type_idx, engP.tables,
                  engP.exclusions, g_ewald=engP.ksp_force.g_ewald,
                  qqr2e=u.qqr2e, use_pallas=False)[:3])(xP), 2e-5)

    print(f"wall {time.time()-t0:.0f}s", flush=True)
    if FAILED:
        print(f"kernel_oracle FAIL: {','.join(FAILED)}")
        sys.exit(1)
    print("kernel_oracle ok")


if __name__ == "__main__":
    main()
