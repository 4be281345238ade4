"""Multi-chip sharded MD step via shard_map over a 1-D device mesh.

Parallelization strategy — the TPU re-expression of the reference's MPI
decomposition (SURVEY.md section 2.3/2.4):

  * dynamic state (x, v, q) is REPLICATED — at CONP scales the state is tiny
    (MBs) while the per-step work is large (N*K transcendentals, N^2 pairs);
  * the k axis is SHARDED: each chip owns K/D k-vectors and computes partial
    structure factors, partial k-space forces, and partial electrode
    potentials -> one psum((N,3)) + psum((Ne,)) over ICI.  This replaces
    ``MPI_Allreduce(sfacrl/sfacim)`` (km_ewald.cpp:782-786) with the dual
    (shard k, not atoms) — cheaper because the reduction payload is the
    force array, not the K-long structure factor;
  * pair-interaction ROWS are sharded: each chip computes forces on N/D
    atoms against all atoms -> all_gather((N/D,3)) == LAMMPS's spatial
    decomposition without ghosts;
  * A^-1 ROWS are sharded: each chip stores (Ne/D, Ne) and computes its rows
    of A^-1 b -> all_gather — exactly the split-Ewald distribution
    (km_ewald_split.cpp:616-667, fix_conp.cpp:1132-1141) minus the
    round-robin broadcasts.

No hand-rolled barriers anywhere: XLA orders the collectives.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.md import Engine
from ..models.system import MDState
from ..ops import ewald as ewald_ops
from ..ops.erfc import erfcr_sqrt
from ..ops.pairs import conp_correction_rowblock, min_image, pair_rowblock
from ..utils.config import Mode, PairMode


def _pad_to(arr, mult, axis=0):
    n = arr.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(np.asarray(arr), widths)


@dataclasses.dataclass(frozen=True)
class ShardedEngine:
    """Holds the sharded constants and the shard_map'd step."""
    engine: Engine
    mesh: Mesh
    axis: str
    step_fn: object          # jitted (state, shards) -> state
    shards: tuple            # device-sharded constant pytree

    def step(self, state: MDState) -> MDState:
        return self.step_fn(state, *self.shards)

    def run(self, state: MDState, nsteps: int, *, thermo_every: int = 0):
        """Scan nsteps; with thermo_every > 0 also returns the thermo rows
        (same schema as Engine.thermo) subsampled every thermo_every steps."""
        shards = self.shards
        eng = self.engine

        @jax.jit
        def go(st):
            def body(s, _):
                s = self.step_fn(s, *shards)
                out = eng.thermo(s) if thermo_every else 0
                return s, out
            return jax.lax.scan(body, st, None, length=nsteps)

        final, th = go(state)
        if thermo_every:
            th = jax.tree.map(lambda a: a[thermo_every - 1::thermo_every], th)
            return final, th
        return final


def build_sharded_engine(engine: Engine, mesh: Mesh, *, axis: str = "s") -> ShardedEngine:
    d = mesh.shape[axis]
    sys = engine.system
    n = sys.natoms
    u = sys.units()
    conp = engine.conp
    dtype = np.float64 if engine.dtype == jnp.float64 else np.float32

    # ---- shardable constants, padded to D multiples -------------------
    # factored Ewald: shard the kxy axis (pad rows get ug=0 -> no contribution)
    fk = engine.fksp
    if fk is not None:
        kvecs = _pad_to(fk.kxy.astype(np.int64), d)                # (nxy', 2)
        ug = _pad_to(fk.ug.astype(dtype), d)                       # (nxy', nz)
    else:
        kvecs = np.zeros((d, 2), np.int64)
        ug = np.zeros((d, 1), dtype)
    exi0, exv0 = engine.exclusions
    exi = _pad_to(np.asarray(exi0), d).copy()                      # (N', m), pad rows
    exi[n:] = n
    exv = _pad_to(np.asarray(exv0, dtype), d)
    xpadmask = np.zeros(exi.shape[0], bool)
    xpadmask[:n] = True                                            # valid-row mask (N',)

    ele_idx = conp.ele_idx if conp is not None else np.zeros(0, np.int64)
    ne = len(ele_idx)
    if conp is not None:
        ainv = _pad_to(np.asarray(conp.ctx.ainv, dtype), d)        # (Ne', Ne)
        ele_idx_p = _pad_to(ele_idx, d)                            # (Ne',)
        ele_valid = np.zeros(len(ele_idx_p), bool)
        ele_valid[:ne] = True
    else:
        ainv = np.zeros((d, 1), dtype)
        ele_idx_p = np.zeros(d, np.int64)
        ele_valid = np.zeros(d, bool)

    sh = NamedSharding(mesh, P(axis))
    sh2 = NamedSharding(mesh, P(axis, None))
    shards = (
        jax.device_put(jnp.asarray(kvecs), sh2),
        jax.device_put(jnp.asarray(ug), sh2),
        jax.device_put(jnp.asarray(exi), sh2),
        jax.device_put(jnp.asarray(exv), sh2),
        jax.device_put(jnp.asarray(xpadmask), sh),
        jax.device_put(jnp.asarray(ainv), sh2),
        jax.device_put(jnp.asarray(ele_idx_p), sh),
        jax.device_put(jnp.asarray(ele_valid), sh),
    )

    ksp = engine.ksp_force
    box = ksp.box
    periodic = sys.periodic
    itg = engine.integrator
    type_idx = engine.type_idx
    elecheck = engine.elecheck
    md = engine.md
    qqr2e = u.qqr2e

    nrow = exi.shape[0] // d           # atom rows per device
    nele_row = ainv.shape[0] // d      # electrode rows per device

    # ------------------------------------------------------------------
    npad_rows = exi.shape[0] - n       # row padding so N' = d * nrow

    def sharded_forces(x, q, scalar_out, kv_l, ug_l, exi_l, exv_l, rvalid_l, i0, e0):
        """Per-device partial force computation; returns replicated (f, pe)."""
        # pair rows (my atoms vs all); slice from padded arrays so the last
        # device's block never clamps onto wrong atoms (pad rows are masked)
        xp = jnp.pad(x, ((0, npad_rows), (0, 0)))
        qp = jnp.pad(q, (0, npad_rows))
        tp = jnp.pad(type_idx, (0, npad_rows))
        xi = jax.lax.dynamic_slice_in_dim(xp, i0, nrow)
        qi = jax.lax.dynamic_slice_in_dim(qp, i0, nrow)
        ti = jax.lax.dynamic_slice_in_dim(tp, i0, nrow)
        f_rows, ev, ec = pair_rowblock(
            xi, qi, ti, exi_l, exv_l, rvalid_l, i0, x, q, type_idx, engine.tables,
            box=box, periodic=periodic, cutoff=md.cutoff,
            g_ewald=ksp.g_ewald, qqr2e=qqr2e)
        f = jax.lax.all_gather(f_rows, axis, axis=0, tiled=True)[:n]
        ev = jax.lax.psum(ev, axis)
        ec = jax.lax.psum(ec, axis)

        if engine.pppm_grid is not None:
            # mesh k-space replicated (grid FFTs; XLA may shard internally)
            from ..ops import pppm as pppm_ops
            grid_p = engine.pppm_grid
            is_ele_m = elecheck != 0
            rho = pppm_ops.spread(grid_p, x, q)
            ek = qqr2e * pppm_ops.pppm_energy(grid_p, rho)
            f = f + qqr2e * pppm_ops.pppm_forces(grid_p, rho, x, q)
        else:
            # factored k-space over my kxy-row shard (ops/ewald_factored.py)
            from ..ops import ewald_factored as ewf
            ek_l, fk_force_l = ewf.energy_forces_fkv(
                x, q, kv_l, jnp.asarray(fk.kz), fk.unitk, ug_l)
            ek = qqr2e * jax.lax.psum(ek_l, axis)
            f = f + qqr2e * jax.lax.psum(fk_force_l, axis)

        g = ksp.g_ewald
        ek = ek - qqr2e * g / math.sqrt(math.pi) * jnp.sum(q * q)
        qsum = jnp.sum(q)
        ek = ek - qqr2e * math.pi / (2 * g * g * ksp.volume) * qsum * qsum
        pe = ev + ec + ek

        # bonded: replicated (tiny)
        from ..ops.bonded import angle_forces, bond_forces
        fb, eb = bond_forces(x, jnp.asarray(sys.bonds), jnp.asarray(sys.bond_coeffs),
                             box=box, periodic=periodic)
        fa, ea = angle_forces(x, jnp.asarray(sys.angles), jnp.asarray(sys.angle_coeffs),
                              box=box, periodic=periodic)
        f = f + fb + fa
        pe = pe + eb + ea

        if ksp.slabflag:
            es, fs = ewald_ops.slab_correction_energy_forces(x, q, ksp.volume)
            f = f + qqr2e * fs
            pe = pe + qqr2e * es

        if conp is not None:
            kern = conp.kernels
            ei = jax.lax.dynamic_slice_in_dim(jnp.pad(elecheck, (0, npad_rows)),
                                              i0, nrow)
            fc_rows, ecorr_l = conp_correction_rowblock(
                xi, qi, ti, ei, rvalid_l, x, q, elecheck != 0,
                kern.force, kern.potential, type_idx,
                box=box, periodic=periodic, cutoff=md.cutoff, qqr2e=qqr2e)
            f = f + jax.lax.all_gather(fc_rows, axis, axis=0, tiled=True)[:n]
            pe = pe + jax.lax.psum(ecorr_l, axis)
            qsq_ele = jnp.sum(jnp.where(elecheck != 0,
                                        jnp.asarray(kern.self_diag, x.dtype) * q * q, 0.0))
            fac = 0.5 if conp.cfg.pairmode is PairMode.ETA else 1.0
            pe = pe + qqr2e * fac * qsq_ele

        if md.efield is not None:
            e = jnp.asarray(md.efield, x.dtype)
            f = f + u.qe2f * q[:, None] * e[None, :]
        if md.efield_feedback:
            f = f.at[:, 2].add(u.qe2f * q * (-scalar_out / box[2]))
        return f, pe

    # ------------------------------------------------------------------
    def sharded_solve(x, q, step, kv_l, ug_l, ainv_l, eidx_l, evalid_l, e0):
        """Row/k-sharded charge solve; returns replicated (q_new, scalar)."""
        cfg = conp.cfg
        ctx = conp.ctx
        elyte = jnp.asarray(conp.elyte_mask)
        q_elyte = jnp.where(elyte, q, 0.0)
        xe_all = x[jnp.asarray(ele_idx)]

        # k-space: my kxy-shard's structure factor and electrode projection
        from ..ops import ewald_factored as ewf
        sr_l, si_l = ewf.structure_factor_fkv(
            x, q_elyte, kv_l, jnp.asarray(fk.kz), fk.unitk)
        b = -ewf.potential_on_points_fkv(
            xe_all, sr_l, si_l, kv_l, jnp.asarray(fk.kz), fk.unitk, ug_l)
        b = jax.lax.psum(b, axis)

        # real-space: my electrode rows vs all atoms
        xe_l = x[eidx_l]
        g = ksp.g_ewald
        dx = min_image(xe_l[:, None, :] - x[None, :, :], jnp.asarray(box, x.dtype),
                       periodic)
        rsq = jnp.sum(dx * dx, axis=-1)
        mask = elyte[None, :] & (rsq < conp.cut_coulsq) & evalid_l[:, None]
        rsq_safe = jnp.where(mask, rsq, 1.0)
        te_l = type_idx[eidx_l]
        dudq = erfcr_sqrt(g * g * rsq_safe) * g + conp.kernels.potential(
            rsq_safe, te_l[:, None], type_idx[None, :])
        br_l = -jnp.sum(jnp.where(mask, dudq, 0.0) * q_elyte[None, :], axis=1)
        br = jax.lax.all_gather(br_l, axis, axis=0, tiled=True)[:ne]
        b = b + br

        if ksp.slabflag:
            slabcorr = (4.0 * math.pi / ksp.volume) * jnp.sum(q_elyte * x[:, 2])
            b = b - xe_all[:, 2] * slabcorr

        # A^-1 rows matvec (HIGHEST: TPU bf16 default corrupts charges)
        eleallq_l = jnp.matmul(ainv_l, b, precision=jax.lax.Precision.HIGHEST)
        eleallq = jax.lax.all_gather(eleallq_l, axis, axis=0, tiled=True)[:ne]

        target = cfg.target(step) if callable(cfg.target) else jnp.asarray(
            cfg.target, b.dtype)
        left = (ctx.elecheck_ele == 1)
        if cfg.mode is Mode.CONP:
            potdiff = target
            scalar = potdiff * ctx.totsetq + jnp.sum(jnp.where(left, eleallq, 0.0))
        elif cfg.mode is Mode.CONQ:
            netcharge_right = -jnp.sum(jnp.where(left, eleallq, 0.0))
            scalar = -(target - netcharge_right) / ctx.totsetq
            if conp.one_electrode:
                scalar = scalar + 2.0 * target / ctx.totsetq
            potdiff = scalar
        else:
            dipole = -jnp.sum(jnp.where(elyte, q, 0.0) * x[:, 2])
            potdiff = ctx.vmult * (
                target - dipole / box[2] - jnp.sum(ctx.setzvec * eleallq))
            scalar = potdiff

        q_ele = eleallq + potdiff * ctx.elesetq + ctx.eleinitq
        q_new = q.at[jnp.asarray(ele_idx)].set(q_ele.astype(q.dtype))
        return q_new, scalar

    # ------------------------------------------------------------------
    def sharded_solve_pppm(x, q, step, ainv_l, eidx_l, evalid_l):
        """PPPM-mode solve: replicated mesh b-vector + row-sharded matvec."""
        cfg = conp.cfg
        ctx = conp.ctx
        b, _ = conp.b_vector_full(x, q)
        eleallq_l = jnp.matmul(ainv_l, b, precision=jax.lax.Precision.HIGHEST)
        eleallq = jax.lax.all_gather(eleallq_l, axis, axis=0, tiled=True)[:ne]
        target = cfg.target(step) if callable(cfg.target) else jnp.asarray(
            cfg.target, b.dtype)
        left = (ctx.elecheck_ele == 1)
        elyte = jnp.asarray(conp.elyte_mask)
        if cfg.mode is Mode.CONP:
            potdiff = target
            scalar = potdiff * ctx.totsetq + jnp.sum(jnp.where(left, eleallq, 0.0))
        elif cfg.mode is Mode.CONQ:
            netcharge_right = -jnp.sum(jnp.where(left, eleallq, 0.0))
            scalar = -(target - netcharge_right) / ctx.totsetq
            if conp.one_electrode:
                scalar = scalar + 2.0 * target / ctx.totsetq
            potdiff = scalar
        else:
            dipole = -jnp.sum(jnp.where(elyte, q, 0.0) * x[:, 2])
            potdiff = ctx.vmult * (
                target - dipole / box[2] - jnp.sum(ctx.setzvec * eleallq))
            scalar = potdiff
        q_ele = eleallq + potdiff * ctx.elesetq + ctx.eleinitq
        q_new = q.at[jnp.asarray(ele_idx)].set(q_ele.astype(q.dtype))
        return q_new, scalar

    def step_inner(state, kv_l, ug_l, exi_l, exv_l, rvalid_l, ainv_l, eidx_l, evalid_l):
        i0 = jax.lax.axis_index(axis) * nrow
        e0 = jax.lax.axis_index(axis) * nele_row
        x, v, q = state.x, state.v, state.q
        v, xi, vxi = itg.thermostat_half(v, state.nhc_xi, state.nhc_vxi, state.step)
        v = itg.kick(v, state.f)
        x_old = x
        x = itg.drift(x_old, v)
        if engine.cons is not None:
            from ..models.shake import rattle_velocities, shake_positions
            x, dv = shake_positions(engine.cons, x, x_old, itg.dt,
                                    box=box, periodic=periodic)
            v = v + dv
        if engine.zmirror is not None:
            x = engine.zmirror.apply(x, state.step + 1)

        scalar = state.scalar_out
        if conp is not None:
            nevery = conp.cfg.nevery
            from ..utils.config import Solver as _Solver
            if conp.cfg.solver is _Solver.CG:
                # CG iterates are replicated (A kept whole per device)
                solve = lambda: conp.solve_full(x, q, state.step + 1)[:2]
            elif conp.pppm_grid is not None:
                # PPPM b-vector: mesh solve replicated (XLA shards FFTs
                # internally when beneficial); A^-1 matvec stays row-sharded
                solve = lambda: sharded_solve_pppm(x, q, state.step + 1,
                                                   ainv_l, eidx_l, evalid_l)
            else:
                solve = lambda: sharded_solve(x, q, state.step + 1, kv_l, ug_l,
                                              ainv_l, eidx_l, evalid_l, e0)
            if nevery == 1:
                q, scalar = solve()
            else:
                q, scalar = jax.lax.cond((state.step + 1) % nevery == 0,
                                         solve, lambda: (q, scalar))

        f, pe = sharded_forces(x, q, scalar, kv_l, ug_l, exi_l, exv_l, rvalid_l, i0, e0)
        v = itg.kick(v, f)
        if engine.cons is not None:
            from ..models.shake import rattle_velocities
            v = rattle_velocities(engine.cons, x, v, box=box, periodic=periodic)
        v, xi, vxi = itg.thermostat_half(v, xi, vxi, state.step)
        return MDState(x=x, v=v, q=q, f=f, step=state.step + 1,
                       nhc_xi=xi, nhc_vxi=vxi, scalar_out=scalar, energy=pe)

    shard_step = jax.shard_map(
        step_inner, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(axis, None), P(axis, None),
                  P(axis), P(axis, None), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    step_fn = jax.jit(shard_step)

    return ShardedEngine(engine=engine, mesh=mesh, axis=axis,
                         step_fn=step_fn, shards=shards)
