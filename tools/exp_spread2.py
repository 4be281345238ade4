#!/usr/bin/env python
"""Decompose _spread_rhok_tiled's back half (merge + z-DFT + xy-FFT =
6.28 ms of the 7.69 ms spread at the 100k geometry — exp_patch_gather.py)
and its mirror pppm_energy_u_zbin (ifft2 + z-iDFT).

Variants (chained 50-iter loops, tools/timing.py):
  M1  xy overlap-add merges only
  M2  z-DFT matmul only (from merged m)
  M3  xy fft2 only (complex (nx, ny, nzh))
  M4  xy DFT-as-matmul (two complex matmuls) — same math as M3
  R3  xy ifft2 only (the energy_u direction)
  R4  xy iDFT-as-matmul
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.ops import pppm as P
from timing import chain_ms


def dft_mat(n):
    j = np.arange(n)[:, None] * np.arange(n)[None, :] % n
    ang = -2.0 * np.pi * j / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


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
    grid = P.with_tile_cap(grid, np.asarray(x))
    geom = P._tile_geometry(grid, n)
    print("grid", grid.shape, "geom", geom, flush=True)
    slots = jax.block_until_ready(
        jax.jit(lambda xx, qq: P.tile_slots(grid, xx, qq))(x, q))

    p_, hw, tlx, tly, tlz, ntx, nty, ntz, t_tiles, cap, z_span, dm = geom
    bw = hw + dm
    ex, ey, ez = tlx + 2 * bw, tly + 2 * bw, tlz + 2 * bw
    cf = jnp.asarray(grid.coeffs, dtype)
    hi = jax.lax.Precision.HIGHEST
    eps = jnp.asarray(1e-30, dtype)

    def build_patches(qs):
        def one(ql, lxl, lyl, lzl, dxl):
            wxy, wzd = P._local_weight_mats(lxl, lyl, lzl, dxl, cf,
                                            ex=ex, ey=ey, ez=ez, dtype=dtype)
            return jnp.matmul(wxy.T, ql[:, None] * wzd, precision=hi)
        xs = tuple(a.reshape((ntx, nty * ntz) + a.shape[1:])
                   for a in (qs, slots.lxs, slots.lys, slots.lzs, slots.dxs))
        _, patches = jax.lax.scan(
            lambda _, args: (None, jax.vmap(one)(*args)), None, xs)
        return patches

    patches0 = jax.block_until_ready(jax.jit(build_patches)(slots.qs))

    def merged(patches):
        pt = patches.reshape(ntx, nty, ntz, ex, ey, ez)
        pt = P._merge_axis(pt, 1, 4, tly, bw, periodic=True)
        pt = P._merge_axis(pt, 0, 3, tlx, bw, periodic=True)
        return pt.transpose(0, 3, 1, 4, 2, 5).reshape(
            ntx * tlx, nty * tly, ntz * ez)

    m0 = jax.block_until_ready(jax.jit(merged)(patches0))
    C, S = P._zbin_dft(grid, geom)
    Cj, Sj = jnp.asarray(C, dtype), jnp.asarray(S, dtype)

    def zdft(m):
        re = jnp.matmul(m, Cj, precision=hi)
        im = -jnp.matmul(m, Sj, precision=hi)
        return re, im

    re0, im0 = jax.block_until_ready(jax.jit(zdft)(m0))
    rk0 = jax.block_until_ready(jax.jit(
        lambda r, i: jnp.fft.fftn(r + 1j * i, axes=(0, 1)))(re0, im0))

    def bench(name, fn, x0):
        ms = chain_ms(fn, x0)
        print(f"{name:30s}: {ms:7.2f} ms", flush=True)
        return ms

    z3 = jnp.zeros((1, 1, 1), dtype)
    bench("M1 merges only",
          lambda s: s + eps * jnp.abs(
              merged(patches0 + eps * s[0, 0, 0])).sum(), z3)
    def m2(s):
        re, im = zdft(m0 + eps * s[0, 0, 0])
        return s + eps * (jnp.abs(re).sum() + jnp.abs(im).sum())
    bench("M2 z-DFT matmul only", m2, z3)

    def m3(s):
        rk = jnp.fft.fftn((re0 + eps * s[0, 0, 0]) + 1j * im0,
                          axes=(0, 1))
        return s + eps * jnp.abs(rk).sum()
    bench("M3 xy fft2 only", m3, z3)

    nx, ny = grid.nx, grid.ny
    CX, SX = dft_mat(nx)
    CY, SY = dft_mat(ny)
    CXj, SXj = jnp.asarray(CX), jnp.asarray(SX)
    CYj, SYj = jnp.asarray(CY), jnp.asarray(SY)

    def xy_dft(re, im):
        # axis 0: (nx, nx) @ (nx, ny*nzh)
        nzh = re.shape[-1]
        a = re.reshape(nx, ny * nzh)
        b = im.reshape(nx, ny * nzh)
        re1 = (jnp.matmul(CXj, a, precision=hi)
               - jnp.matmul(SXj, b, precision=hi))
        im1 = (jnp.matmul(CXj, b, precision=hi)
               + jnp.matmul(SXj, a, precision=hi))
        # axis 1: transpose y to front
        a = re1.reshape(nx, ny, nzh).transpose(1, 0, 2).reshape(ny, nx * nzh)
        b = im1.reshape(nx, ny, nzh).transpose(1, 0, 2).reshape(ny, nx * nzh)
        re2 = (jnp.matmul(CYj, a, precision=hi)
               - jnp.matmul(SYj, b, precision=hi))
        im2 = (jnp.matmul(CYj, b, precision=hi)
               + jnp.matmul(SYj, a, precision=hi))
        return (re2.reshape(ny, nx, -1).transpose(1, 0, 2),
                im2.reshape(ny, nx, -1).transpose(1, 0, 2))

    rr, ii = jax.jit(xy_dft)(re0, im0)
    err = float(jax.jit(
        lambda a, b, v: jnp.max(jnp.abs((a + 1j * b) - v))
        / jnp.max(jnp.abs(v)))(rr, ii, rk0))
    def m4(s):
        a, b = xy_dft(re0 + eps * s[0, 0, 0], im0)
        return s + eps * (jnp.abs(a).sum() + jnp.abs(b).sum())
    ms4 = bench("M4 xy DFT-as-matmul", m4, jnp.zeros((1, 1, 1), dtype))
    print(f"    M4 rel_err vs fft2: {err:.2e}", flush=True)

    # reverse direction (energy_u): ifft2 on phik
    gk = jnp.asarray(grid.greens[..., :grid.nz // 2 + 1], dtype)
    phik0 = jax.jit(lambda a, b: a * b)(rk0, gk)
    ph_re, ph_im = jax.jit(lambda pk: (jnp.real(pk), jnp.imag(pk)))(phik0)

    def r3(s):
        pk = (ph_re + eps * s[0, 0, 0]) + 1j * ph_im
        v = jnp.fft.ifftn(pk, axes=(0, 1))
        return s + eps * jnp.abs(v).sum()
    bench("R3 xy ifft2 only", r3, z3)

    def xy_idft(re, im):
        nzh = re.shape[-1]
        a = re.reshape(nx, ny * nzh)
        b = im.reshape(nx, ny * nzh)
        # inverse: conj DFT / n
        re1 = (jnp.matmul(CXj.T, a, precision=hi)
               + jnp.matmul(SXj.T, b, precision=hi)) / nx
        im1 = (jnp.matmul(CXj.T, b, precision=hi)
               - jnp.matmul(SXj.T, a, precision=hi)) / nx
        a = re1.reshape(nx, ny, nzh).transpose(1, 0, 2).reshape(ny, nx * nzh)
        b = im1.reshape(nx, ny, nzh).transpose(1, 0, 2).reshape(ny, nx * nzh)
        re2 = (jnp.matmul(CYj.T, a, precision=hi)
               + jnp.matmul(SYj.T, b, precision=hi)) / ny
        im2 = (jnp.matmul(CYj.T, b, precision=hi)
               - jnp.matmul(SYj.T, a, precision=hi)) / ny
        return (re2.reshape(ny, nx, -1).transpose(1, 0, 2),
                im2.reshape(ny, nx, -1).transpose(1, 0, 2))

    v0 = jax.jit(lambda pk: jnp.fft.ifftn(pk, axes=(0, 1)))(phik0)
    ra, rb = jax.jit(xy_idft)(ph_re, ph_im)
    err_i = float(jax.jit(
        lambda a, b, v: jnp.max(jnp.abs((a + 1j * b) - v))
        / jnp.max(jnp.abs(v)))(ra, rb, v0))
    def r4(s):
        a, b = xy_idft(ph_re + eps * s[0, 0, 0], ph_im)
        return s + eps * (jnp.abs(a).sum() + jnp.abs(b).sum())
    bench("R4 xy iDFT-as-matmul", r4, jnp.zeros((1, 1, 1), dtype))
    print(f"    R4 rel_err vs ifft2: {err_i:.2e}", flush=True)


if __name__ == "__main__":
    main()
