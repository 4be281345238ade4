#!/usr/bin/env python
"""TPU experiment: transposed matmul layout + occupancy-tight cap for the
tiled PPPM spread (companion to exp_gather3.py; spread was 11.3 ms of the
92.4 ms 100k step).  Baseline layout is (exy,cap)@(cap,ez) — lanes carry
ez=38 of 128; transposed is (ez,cap)@(cap,exy) — lanes carry exy=484."""
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
from tools.exp_gather3 import chain_ms, make_geom, slots_for, tight_cap


def spread_T(grid, x, slots, geom, precision):
    """Transposed-layout spread: per tile (ez,cap)@(cap,exy), then the
    overlap-add consumes the (exy, ez) patch as before (one transpose)."""
    dtype = x.dtype
    qs, lxs, lys, lzs, dxs = (slots.qs, slots.lxs, slots.lys, slots.lzs,
                              slots.dxs)
    overflow = slots.overflow
    p, hw, tlx, tly, tlz, ntx, nty, ntz, t_tiles, cap, z_span, dm = geom
    bw = hw + dm
    ex, ey, ez = tlx + 2 * bw, tly + 2 * bw, tlz + 2 * bw
    cf = jnp.asarray(grid.coeffs, dtype)

    def one(ql, lxl, lyl, lzl, dxl):
        wxl = P._axis_onehot(lxl, P._horner_w(dxl[:, 0], cf), e=ex)
        wyl = P._axis_onehot(lyl, P._horner_w(dxl[:, 1], cf), e=ey)
        wzl = P._axis_onehot(lzl, P._horner_w(dxl[:, 2], cf), e=ez)
        wxy = (wxl.T[:, None, :] * wyl.T[None, :, :]).reshape(ex * ey, cap)
        patchT = jnp.matmul(wzl.T * ql[None, :], wxy.T,
                            precision=precision)       # (ez, exy)
        return patchT.T

    xs = tuple(a.reshape((ntx, nty * ntz) + a.shape[1:])
               for a in (qs, lxs, lys, lzs, dxs))
    _, patches = jax.lax.scan(
        lambda _, args: (None, jax.vmap(one)(*args)), None, xs)
    rho = P._overlap_add(patches.reshape(t_tiles, ex * ey, ez), geom,
                         grid.nz)
    return jnp.where(overflow, jnp.nan, rho)


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
    slots0 = slots_for(grid, x, q, geom0)
    occ, capt = tight_cap(slots0, n)
    print(f"occupancy {occ} -> tight cap {capt} (was {geom0.cap})")
    geom1 = make_geom(grid, n, cap=capt)
    slots1 = slots_for(grid, x, q, geom1)

    HI = jax.lax.Precision.HIGHEST
    orig = P._tile_geometry
    P._tile_geometry = lambda g, nn: geom0
    ref = jax.block_until_ready(jax.jit(
        lambda xx: P.spread_tiled(grid, xx, q, slots=slots0))(x))
    P._tile_geometry = orig
    scale = float(jnp.max(jnp.abs(ref)))
    eps = jnp.asarray(1e-30, dtype)

    def bench(name, fn, geom_for):
        v = jax.jit(fn)(x)
        err = float(jnp.max(jnp.abs(v - ref))) / scale
        ms = chain_ms(lambda xx: xx + eps * fn(xx)[0, 0, :3], x)
        print(f"{name:28s}: {ms:7.2f} ms  rel_err={err:.2e}", flush=True)

    P._tile_geometry = lambda g, nn: geom0
    bench("V0 baseline", lambda xx: P.spread_tiled(
        grid, xx, q, slots=slots0), geom0)
    P._tile_geometry = lambda g, nn: geom1
    bench("V1 tight cap", lambda xx: P.spread_tiled(
        grid, xx, q, slots=slots1), geom1)
    P._tile_geometry = orig
    bench("V2 transposed", lambda xx: spread_T(
        grid, xx, slots0, geom0, HI), geom0)
    bench("V3 tight+transposed", lambda xx: spread_T(
        grid, xx, slots1, geom1, HI), geom1)


if __name__ == "__main__":
    main()
