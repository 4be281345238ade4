#!/usr/bin/env python
"""TPU experiments on the tiled PPPM force gather (gather3_ad) at the 100k
production geometry — the dominant phase of the large step (37.5 ms of a
92.4 ms step, round-3 breakdown).  Variants:

  V0  baseline gather3_ad_tiled (geom cap formula, (3cap,exy)@(exy,ez))
  V1  cap tightened to the actual max tile occupancy at x0 (+15%, 8-rounded)
  V2  transposed matmul layout: (ez,exy)@(exy,3cap) — lanes carry the 3cap
      axis (1413) instead of ez (38), ~3.4x better lane utilization
  V3  V1 + V2
  V4  tile-size sweep at tight cap (tlxy in {8,16}, tlz in {16,32})
  V5  V3 with Precision.DEFAULT (one-pass bf16) — measures the perf/accuracy
      tradeoff, NOT proposed for production

Each variant is checked against V0 output (max rel err) before timing.
Chained loops per CLAUDE.md.
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
from lammps_user_conp2_tpu.ops import pppm as P


def chain_ms(fn, x0, iters=50, trials=3):
    run = jax.jit(lambda s: jax.lax.fori_loop(0, iters, lambda i, t: fn(t), s))
    s = jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = jax.block_until_ready(run(s))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def gather3_T(grid, u, x, slots, geom, precision):
    """Transposed-layout variant of gather3_ad_tiled: per tile
    (ez, exy) @ (exy, 3cap) so the long 3cap axis rides the 128 lanes."""
    n = x.shape[0]
    dtype = x.dtype
    lxs, lys, lzs, dxs = slots.lxs, slots.lys, slots.lzs, slots.dxs
    table, overflow = slots.table, slots.overflow
    p, hw, tlx, tly, tlz, ntx, nty, ntz, t_tiles, cap, z_span, dm = geom
    bw = hw + dm
    ex, ey, ez = tlx + 2 * bw, tly + 2 * bw, tlz + 2 * bw
    cf = jnp.asarray(grid.coeffs, dtype)
    up = P._pad_brick(u, geom, grid.nz)

    def one(t, lxl, lyl, lzl, dxl):
        txi = t // (nty * ntz)
        tyi = (t // ntz) % nty
        tzi = t % ntz
        wxl = P._axis_onehot(lxl, P._horner_w(dxl[:, 0], cf), e=ex)
        wyl = P._axis_onehot(lyl, P._horner_w(dxl[:, 1], cf), e=ey)
        wzd = P._axis_onehot(lzl, P._horner_w(dxl[:, 2], cf), e=ez)
        dwxl = P._axis_onehot(lxl, P._horner_dw(dxl[:, 0], cf), e=ex)
        dwyl = P._axis_onehot(lyl, P._horner_dw(dxl[:, 1], cf), e=ey)
        dwzd = P._axis_onehot(lzl, P._horner_dw(dxl[:, 2], cf), e=ez)
        # (exy, 3cap): columns comp*cap + slot
        wxy3 = jnp.concatenate([
            (dwxl.T[:, None, :] * wyl.T[None, :, :]).reshape(ex * ey, cap),
            (wxl.T[:, None, :] * dwyl.T[None, :, :]).reshape(ex * ey, cap),
            (wxl.T[:, None, :] * wyl.T[None, :, :]).reshape(ex * ey, cap),
        ], axis=1)
        zero = jnp.zeros((), t.dtype)
        patch = jax.lax.dynamic_slice(
            up, (txi * tlx, tyi * tly, tzi * tlz), (ex, ey, ez))
        t1 = jnp.matmul(patch.reshape(ex * ey, ez).T, wxy3,
                        precision=precision)           # (ez, 3cap)
        wz3 = jnp.concatenate([wzd.T, wzd.T, dwzd.T], axis=1)
        out3 = jnp.sum(t1 * wz3, axis=0)               # (3cap,)
        return out3.reshape(3, cap).T                   # (cap, 3)

    xs = tuple(a.reshape((ntx, nty * ntz) + a.shape[1:])
               for a in (jnp.arange(t_tiles, dtype=jnp.int32),
                         lxs, lys, lzs, dxs))
    _, vals = jax.lax.scan(
        lambda _, args: (None, jax.vmap(one)(*args)), None, xs)
    out = jnp.zeros((n + 1, 3), dtype).at[table.reshape(-1)].add(
        vals.reshape(t_tiles * cap, 3))
    e = out[:n] * jnp.asarray(P._delinv(grid), dtype)[None, :]
    return jnp.where(overflow, jnp.nan, e)


def make_geom(grid, n, tlxy=None, tlz=None, cap=None):
    geom = P._tile_geometry(grid, n)
    if tlxy is not None:
        ntx, nty = grid.nx // tlxy, grid.ny // tlxy
        assert grid.nx % tlxy == 0 and grid.ny % tlxy == 0
        geom = geom._replace(tlx=tlxy, tly=tlxy, ntx=ntx, nty=nty)
    if tlz is not None:
        nz_occ = P._occupied_nz(grid)
        bw = geom.hw + geom.dm
        assert geom.z_span
        ntz = (nz_occ + tlz) // tlz + 2
        assert (ntz - 1) * tlz <= grid.nz, "ring must map into [0, nz)"
        geom = geom._replace(tlz=tlz, ntz=ntz)
    geom = geom._replace(t_tiles=geom.ntx * geom.nty * geom.ntz)
    if cap is not None:
        geom = geom._replace(cap=int(cap))
    return geom


def slots_for(grid, x, q, geom):
    orig = P._tile_geometry
    P._tile_geometry = lambda g, n: geom
    try:
        s = jax.jit(lambda xx, qq: P.tile_slots(grid, xx, qq))(x, q)
        return jax.block_until_ready(s)
    finally:
        P._tile_geometry = orig


def tight_cap(slots, n):
    occ = int(jnp.max(jnp.sum(slots.table < n, axis=1)))
    return occ, int(np.ceil(occ * 1.15 / 8.0) * 8)


def main():
    n_elyte = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=23, lz=240.0, lxy=120.0)
    u_sys = system.units()
    dtype = jnp.float32
    x = jnp.asarray(system.x0, dtype)
    q = jnp.asarray(system.q0, dtype)
    n = system.natoms
    q2 = float((system.q0 ** 2).sum()) * u_sys.qqr2e
    grid = P.setup_pppm(
        box=system.box, box_lo=tuple(system.box_lo),
        accuracy_abs=md.kspace_accuracy * u_sys.qqr2e, natoms=n,
        q2=q2, cutoff=md.cutoff, slabflag=True, slab_volfactor=3.0)
    print("grid", grid.nx, grid.ny, grid.nz)

    geom0 = P._tile_geometry(grid, n)
    print("geom0", geom0)
    slots0 = slots_for(grid, x, q, geom0)
    occ, capt = tight_cap(slots0, n)
    print(f"max tile occupancy {occ}  -> tight cap {capt} (was {geom0.cap})")

    rho = jax.jit(lambda xx, qq: P.spread(grid, xx, qq))(x, q)
    u = jax.block_until_ready(jax.jit(
        lambda r: P.poisson_u(grid, r))(rho))

    HI = jax.lax.Precision.HIGHEST
    ref = jax.jit(lambda xx: P.gather3_ad_tiled(grid, u, xx, slots=slots0))(x)
    ref = jax.block_until_ready(ref)
    scale = float(jnp.max(jnp.abs(ref)))

    def check(val):
        return float(jnp.max(jnp.abs(val - ref))) / scale

    eps = jnp.asarray(1e-30, dtype)
    results = {}

    def bench(name, gfn, slots, geom):
        v = jax.jit(lambda xx: gfn(xx))(x)
        err = check(v)
        ms = chain_ms(lambda xx: xx + eps * gfn(xx), x)
        flops = geom.t_tiles * 3 * geom.cap * \
            (geom.tlx + 2 * (geom.hw + geom.dm)) * \
            (geom.tly + 2 * (geom.hw + geom.dm)) * \
            (geom.tlz + 2 * (geom.hw + geom.dm)) * 2
        print(f"{name:34s}: {ms:7.2f} ms  rel_err={err:.2e}  "
              f"eff={flops / ms / 1e9:.2f} Tflop/s", flush=True)
        results[name] = ms

    bench("V0 baseline", lambda xx: P.gather3_ad_tiled(
        grid, u, xx, slots=slots0), slots0, geom0)

    geom1 = make_geom(grid, n, cap=capt)
    slots1 = slots_for(grid, x, q, geom1)
    orig = P._tile_geometry
    P._tile_geometry = lambda g, nn: geom1
    try:
        bench("V1 tight cap", lambda xx: P.gather3_ad_tiled(
            grid, u, xx, slots=slots1), slots1, geom1)
    finally:
        P._tile_geometry = orig

    bench("V2 transposed", lambda xx: gather3_T(
        grid, u, xx, slots0, geom0, HI), slots0, geom0)
    bench("V3 tight+transposed", lambda xx: gather3_T(
        grid, u, xx, slots1, geom1, HI), slots1, geom1)
    bench("V5 tight+T+bf16 (reference only)", lambda xx: gather3_T(
        grid, u, xx, slots1, geom1, jax.lax.Precision.DEFAULT),
        slots1, geom1)

    for tlxy, tlz in ((8, 16), (8, 32), (16, 16), (24, 32), (16, 48)):
        if grid.nx % tlxy or grid.ny % tlxy:
            continue
        try:
            g = make_geom(grid, n, tlxy=tlxy, tlz=tlz, cap=None)
        except AssertionError as e:
            print(f"V4 tl=({tlxy},{tlz}): skipped ({e})")
            continue
        s = slots_for(grid, x, q, g)
        o, c = tight_cap(s, n)
        g = g._replace(cap=c)
        s = slots_for(grid, x, q, g)
        bench(f"V4 tl=({tlxy},{tlz}) cap={c} T", lambda xx, g=g, s=s:
              gather3_T(grid, u, xx, s, g, HI), s, g)

    print(dict(sorted(results.items(), key=lambda kv: kv[1])))


if __name__ == "__main__":
    main()
