#!/usr/bin/env python
"""Sweep PPPM tile geometry for spread/gather3 at 100k atoms on TPU."""
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
from lammps_user_conp2_tpu.ops import pppm as pppm_ops


def chain_ms(fn, x0, iters=30, trials=3):
    run = jax.jit(lambda s: jax.lax.fori_loop(0, iters, lambda i, t: fn(t), s))
    s = jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = jax.block_until_ready(run(s))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    geoms = ((16, 15), (16, 25), (16, 50), (16, 75), (16, 125),
             (16, 250), (16, 750), (24, 50), (24, 125), (12, 125),
             (36, 750), (24, 750))
    if "--geoms" in sys.argv:
        i = sys.argv.index("--geoms")
        geoms = tuple(tuple(int(v) for v in g.split(":"))
                      for g in sys.argv[i + 1].split(","))
        del sys.argv[i:i + 2]
    n_elyte = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=23, lz=240.0, lxy=120.0)
    u = system.units()
    q2 = float((system.q0 ** 2).sum()) * u.qqr2e
    grid = pppm_ops.setup_pppm(
        box=system.box, box_lo=tuple(system.box_lo),
        accuracy_abs=md.kspace_accuracy * u.qqr2e, natoms=system.natoms,
        q2=q2, cutoff=md.cutoff, slabflag=True, slab_volfactor=3.0)
    print(f"grid={grid.shape}", flush=True)
    x = jnp.asarray(system.x0, jnp.float32)
    q = jnp.asarray(system.q0, jnp.float32) + 0.01
    eps = jnp.asarray(1e-30, jnp.float32)
    rho0 = jax.jit(lambda xx, qq: pppm_ops.spread_tiled(grid, xx, qq))(x, q)
    bricks = (rho0, rho0 * 2, rho0 * 3)

    for txy, tz in geoms:
        pppm_ops.TILE_TARGET_XY = txy
        pppm_ops.TILE_TARGET_Z = tz
        geom = pppm_ops._tile_geometry(grid, system.natoms)
        p, hw, tlx, tly, tlz, ntx, nty, ntz, t_tiles, cap, z_span, dm = geom

        def f_spread(xx):
            rho = pppm_ops.spread_tiled(grid, xx, q)
            return xx + eps * jnp.sum(rho) * jnp.ones_like(xx)

        def f_gather(xx):
            g3 = pppm_ops.gather_tiled(grid, list(bricks), xx)
            return xx + eps * g3[0][:, None]

        s_ms = chain_ms(f_spread, x)
        g_ms = chain_ms(f_gather, x)
        print(f"txy={tlx:3d} tz={tlz:3d} span={int(z_span)} T={t_tiles:5d} "
              f"cap={cap:5d} spread={s_ms:7.2f} ms  gather3={g_ms:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
