#!/usr/bin/env python
"""Prototype: block (cluster) pair sweep vs the per-atom Verlet sweep.

i-blocks of B cell-sorted atoms share one j-union list of width U
(tools/exp_block_union.py: B=8 fits U=128, B=16 fits U=192 at the 100k
config).  TPU gather cost is ~2.2 ns/descriptor regardless of locality
(tools/exp_gather_chunk.py), so descriptors drop 5.56M -> 1.2-1.6M; the
elementwise sweep grows N*K -> N*U slots.  This measures the net and
checks force agreement against nlist_pair_forces.

Block unions are built host-side here (numpy) just for the measurement;
the production rebuild would build them on device.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.system import exclusion_lists
from lammps_user_conp2_tpu.ops.neighbors import (EWALD_F, EWALD_P, A1, A2, A3,
                                                 A4, A5, build_neighbor_list,
                                                 make_neighbor_config,
                                                 min_image,
                                                 nlist_pair_forces)
from lammps_user_conp2_tpu.ops.pairs import make_pair_tables

ITERS = int(os.environ.get("ITERS", "50"))


def chain_ms(fn, x0, trials=3):
    eps = jnp.asarray(1e-30, jnp.float32)
    run = jax.jit(lambda s: jax.lax.fori_loop(
        0, ITERS, lambda i, t: t + eps * fn(t), s))
    s = jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = jax.block_until_ready(run(s))
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    return best


def build_block_union(idx_np, n, perm, B, U):
    """Host reference: per-block sorted-unique union of the block atoms'
    neighbor lists, padded with n."""
    npad = ((n + B - 1) // B) * B
    rows = np.full((npad,), n, np.int64)
    rows[:n] = perm
    nb = npad // B
    un = np.full((nb, U), n, np.int32)
    over = 0
    idx_pad = np.vstack([idx_np, np.full((1, idx_np.shape[1]), n,
                                         idx_np.dtype)])
    for b in range(nb):
        ats = rows[b * B:(b + 1) * B]
        u = np.unique(idx_pad[ats])
        u = u[u < n]
        if len(u) > U:
            over += 1
            u = u[:U]
        un[b, :len(u)] = u
    return un, rows.reshape(nb, B).astype(np.int32), over


def main():
    n_elyte = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=23, lz=240.0, lxy=120.0)
    u_ = system.units()
    rng = np.random.default_rng(3)
    x = jnp.asarray(system.x0 + 0.15 * rng.standard_normal(system.x0.shape),
                    jnp.float32)
    q = jnp.asarray(system.q0, jnp.float32)
    ti = jnp.asarray(system.type)
    tables = make_pair_tables(system.lj_eps, system.lj_sigma, system.type,
                              jnp.float32)
    excl = tuple(jnp.asarray(a) for a in exclusion_lists(system))
    g_ewald = 0.35
    qqr2e = u_.qqr2e
    n = system.natoms
    print("backend:", jax.devices()[0], "natoms:", n)

    ncfg = make_neighbor_config(system.box, tuple(system.box_lo), md.cutoff,
                                n, periodic=system.periodic,
                                x0=np.asarray(x))
    nbr = jax.jit(lambda xx: build_neighbor_list(ncfg, xx, tables, ti))(x)
    jax.block_until_ready(nbr.idx)
    print(f"K={ncfg.k_max}")

    def f_nlist(xx):
        f, ev, ec, ov = nlist_pair_forces(ncfg, nbr, xx, q, ti, tables, excl,
                                          g_ewald=g_ewald, qqr2e=qqr2e)
        return f
    ms = chain_ms(lambda xx: xx + 1e-30 * f_nlist(xx), x)
    print(f"nlist sweep         : {ms:8.3f} ms")
    fr, evr, ecr, _ = jax.jit(lambda xx: nlist_pair_forces(
        ncfg, nbr, xx, q, ti, tables, excl, g_ewald=g_ewald,
        qqr2e=qqr2e))(x)

    # cell-sorted atom order
    grd = ncfg.grid
    xs_ = np.asarray(x)
    ids = []
    for ax, nc in enumerate(grd.ncells):
        uu = (xs_[:, ax] - grd.box_lo[ax]) / grd.box[ax]
        if grd.periodic[ax]:
            uu = uu - np.floor(uu)
        ids.append(np.clip((uu * nc).astype(np.int64), 0, nc - 1))
    cid = (ids[0] * grd.ncells[1] + ids[1]) * grd.ncells[2] + ids[2]
    perm = np.argsort(cid, kind="stable")
    idx_np = np.asarray(nbr.idx)

    cutsq = ncfg.cutoff ** 2
    boxj = jnp.asarray(grd.box, jnp.float32)
    nt = int(np.asarray(ti).max()) + 1
    c_at = jnp.stack([tables.lj1[ti], tables.lj2[ti],
                      tables.lj3[ti], tables.lj4[ti]]).astype(jnp.float32)

    for B, U in ((8, 128), (16, 192), (16, 208), (32, 320)):
        un, rows, over = build_block_union(idx_np, n, perm, B, U)
        print(f"B={B} U={U}: {un.size/1e6:.2f}M desc, {over} over")
        if over:
            continue
        un_j = jnp.asarray(un)          # (NB, U)
        rows_j = jnp.asarray(rows)      # (NB, B)
        tp = jnp.pad(ti, (0, 1)).astype(jnp.int32)
        tu = tp[un_j]                   # (NB, U) union types (static per list)
        # per-(i,union) LJ coefficients, built once at rebuild time:
        # (4, NB, B, U) via the same masked type-FMA as the nlist build
        c_rows = c_at[:, rows.reshape(-1), :].reshape(4, un.shape[0], B, nt)
        lj_bu = jnp.zeros((4, un.shape[0], B, U), jnp.float32)
        for t in range(nt):
            mt = (tu == t).astype(jnp.float32)[:, None, :]
            lj_bu = lj_bu + mt[None] * c_rows[:, :, :, t][:, :, :, None]
        l1, l2, l3, l4 = lj_bu
        qj_rows = jnp.pad(q, (0, 1))

        def f_block(xx, un_j=un_j, rows_j=rows_j, l1=l1, l2=l2, l3=l3, l4=l4):
            sent = jnp.asarray([[1e6, 1e6, 1e6, 0.0]], jnp.float32)
            xqp = jnp.concatenate(
                [jnp.concatenate([xx, q[:, None]], axis=1), sent], axis=0)
            xqu = xqp[un_j]                     # (NB, U, 4) THE gather
            xi = xqp[rows_j]                    # (NB, B, 4) small gather
            d = min_image(xi[:, :, None, :3] - xqu[:, None, :, :3],
                          boxj, grd.periodic)
            rsq = jnp.sum(d * d, axis=-1)
            mask = ((un_j[:, None, :] != rows_j[:, :, None])
                    & (un_j[:, None, :] < n) & (rows_j[:, :, None] < n)
                    & (rsq < cutsq))
            rsq_s = jnp.where(mask, rsq, 1.0)
            r2 = 1.0 / rsq_s
            r6 = r2 * r2 * r2
            flj = jnp.where(mask, r6 * (l1 * r6 - l2) * r2, 0.0)
            r = jnp.sqrt(rsq_s)
            grij = g_ewald * r
            expm2 = jnp.exp(-grij * grij)
            tt = 1.0 / (1.0 + EWALD_P * grij)
            erfc = tt * (A1 + tt * (A2 + tt * (A3 + tt * (A4 + tt * A5)))) * expm2
            pref = qqr2e * xi[:, :, None, 3] * xqu[:, None, :, 3] / r
            fcoul = jnp.where(mask, pref * (erfc + EWALD_F * grij * expm2), 0.0)
            fpair = flj + fcoul * r2
            f_rows = jnp.sum(fpair[..., None] * d, axis=2)   # (NB, B, 3)
            # back to original order: inverse permutation gather
            f_flat = f_rows.reshape(-1, 3)[:n]
            return f_flat
        # inverse perm: f[perm[i]] = f_sorted[i]
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        inv_j = jnp.asarray(inv)

        def f_block_o(xx):
            return f_block(xx)[inv_j]

        ms = chain_ms(lambda xx: xx + 1e-30 * f_block_o(xx), x)
        print(f"block sweep B={B:2d} U={U}: {ms:8.3f} ms")
        fb = jax.jit(f_block_o)(x)
        # nlist forces include exclusion corrections; prototype doesn't —
        # compare against the raw sweep by adding them back
        from lammps_user_conp2_tpu.ops.cells import exclusion_correction
        df_, dev_, dec_ = jax.jit(lambda xx: exclusion_correction(
            xx, q, ti, tables, excl, box=grd.box, periodic=grd.periodic,
            cutsq=cutsq, qqr2e=qqr2e))(x)
        diff = float(jnp.max(jnp.abs((fb + df_) - fr)))
        print(f"    max|df| vs nlist: {diff:.3e} (scale "
              f"{float(jnp.max(jnp.abs(fr))):.1e})")


if __name__ == "__main__":
    main()
