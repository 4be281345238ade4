#!/usr/bin/env python
"""Experiment: XLA rfftn Poisson vs DFT-as-matmul on the MXU.

XLA's TPU FFT at the 100k production grid (108,108,648 = 7.5M points) costs
~6 ms per transform — orders of magnitude off roofline (one HBM pass is
~0.04 ms; the DFT-as-matmul flops are ~10 Gflop ≈ 0.3 ms on the MXU).  This
probes three Poisson implementations at the production grid:

  a) jnp.fft.rfftn + irfftn  (current ops/pppm.py path)
  b) z-axis real<->half-spectrum DFT by matmul, xy by jnp.fft.fftn
  c) all-axes DFT by matmul (z real-to-complex, xy complex, MXU end to end)

Correctness vs a float64 CPU rfftn reference; timing per CLAUDE.md chained
loops.  Usage: python tools/exp_fft.py [--cpu]
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
    sys.argv.remove("--cpu")

HI = jax.lax.Precision.HIGHEST


def dft_mats(n, dtype=np.float32):
    """Exact-phase DFT matrices in f64, cast late.

    Returns (Cf, Sf) with Cf[j,k] = cos(2*pi*j*k/n), Sf[j,k] = sin(...),
    phases computed from (j*k) mod n in int64 so large j*k loses nothing.
    """
    j = np.arange(n, dtype=np.int64)
    jk = (j[:, None] * j[None, :]) % n
    ang = 2.0 * np.pi * jk.astype(np.float64) / n
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def make_poisson_matz(nx, ny, nz, greens):
    """Variant b: z-DFT via matmul, xy via complex fftn."""
    nzh = nz // 2 + 1
    Cz, Sz = dft_mats(nz)
    Czh = jnp.asarray(Cz[:, :nzh])
    Szh = jnp.asarray(Sz[:, :nzh])
    # inverse z weights: spectrum doubling for interior half-spectrum bins
    wz = np.ones(nzh, np.float64) * 2.0
    wz[0] = 1.0
    if nz % 2 == 0:
        wz[-1] = 1.0
    iCz = jnp.asarray((Cz[:, :nzh] * wz / nz).astype(np.float32))
    iSz = jnp.asarray((Sz[:, :nzh] * wz / nz).astype(np.float32))
    gk = jnp.asarray(greens[..., :nzh], jnp.float32)

    def poisson(rho):
        # forward z: rho (nx,ny,nz) -> re/im (nx,ny,nzh)
        re = jnp.matmul(rho, Czh, precision=HI)
        im = -jnp.matmul(rho, Szh, precision=HI)
        # xy complex FFT
        v = jnp.fft.fftn(re + 1j * im, axes=(0, 1))
        v = v * gk
        # inverse xy
        v = jnp.fft.ifftn(v, axes=(0, 1))
        # inverse z by matmul on re/im (projects the odd-Nyquist junk away)
        u = (jnp.matmul(jnp.real(v), iCz.T, precision=HI)
             - jnp.matmul(jnp.imag(v), iSz.T, precision=HI))
        return u

    return poisson


def make_poisson_matall(nx, ny, nz, greens):
    """Variant c: all axes by matmul."""
    nzh = nz // 2 + 1
    Cz, Sz = dft_mats(nz)
    Czh = jnp.asarray(Cz[:, :nzh])
    Szh = jnp.asarray(Sz[:, :nzh])
    wz = np.ones(nzh, np.float64) * 2.0
    wz[0] = 1.0
    if nz % 2 == 0:
        wz[-1] = 1.0
    iCz = jnp.asarray((Cz[:, :nzh] * wz / nz).astype(np.float32))
    iSz = jnp.asarray((Sz[:, :nzh] * wz / nz).astype(np.float32))
    Cx, Sx = dft_mats(nx)
    Cy, Sy = dft_mats(ny)
    Cx, Sx, Cy, Sy = map(jnp.asarray, (Cx, Sx, Cy, Sy))
    gk = jnp.asarray(greens[..., :nzh], jnp.float32)

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    def fwd_axis(re, im, C, S, axis, sign):
        # DFT along `axis` via tensordot; sign=-1 forward
        mr = jnp.tensordot(re, C, axes=(axis, 0))
        mi = jnp.tensordot(im, C, axes=(axis, 0))
        nr = jnp.tensordot(re, S, axes=(axis, 0))
        ni = jnp.tensordot(im, S, axes=(axis, 0))
        rr = mr - sign * ni
        ii = mi + sign * nr
        # tensordot moves the axis to the end; restore order
        return jnp.moveaxis(rr, -1, axis), jnp.moveaxis(ii, -1, axis)

    def poisson(rho):
        re = jnp.matmul(rho, Czh, precision=HI)
        im = -jnp.matmul(rho, Szh, precision=HI)
        with jax.default_matmul_precision("highest"):
            re, im = fwd_axis(re, im, Cx, Sx, 0, -1.0)
            re, im = fwd_axis(re, im, Cy, Sy, 1, -1.0)
            re, im = re * gk, im * gk
            re, im = fwd_axis(re, im, Cx, Sx, 0, 1.0)
            re, im = fwd_axis(re, im, Cy, Sy, 1, 1.0)
        re = re / (nx * ny)
        im = im / (nx * ny)
        u = (jnp.matmul(re, iCz.T, precision=HI)
             - jnp.matmul(im, iSz.T, precision=HI))
        return u

    return poisson


def chain_ms(fn, x0, iters=50, trials=3):
    eps = jnp.asarray(1e-30, jnp.float32)
    step = lambda r: r + eps * fn(r)
    run = jax.jit(lambda s: jax.lax.fori_loop(0, iters,
                                              lambda i, t: step(t), s))
    s = jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = jax.block_until_ready(run(s))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    nx, ny, nz = (int(a) for a in (sys.argv[1:4] or [108, 108, 648]))
    rng = np.random.default_rng(0)
    rho_np = rng.standard_normal((nx, ny, nz)).astype(np.float32)
    greens = rng.random((nx, ny, nz)).astype(np.float64) * 1e-2
    # hermitian-symmetric greens along z (as the real PPPM greens is)
    greens = 0.5 * (greens + greens[:, :, (-np.arange(nz)) % nz])

    # f64 reference on CPU
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        rhok = np.fft.rfftn(rho_np.astype(np.float64))
        uref = np.fft.irfftn(rhok * greens[..., :nz // 2 + 1],
                             s=(nx, ny, nz))

    rho = jnp.asarray(rho_np)
    gk32 = jnp.asarray(greens[..., :nz // 2 + 1], jnp.float32)

    def poisson_xla(r):
        return jnp.fft.irfftn(jnp.fft.rfftn(r) * gk32, s=(nx, ny, nz))

    p_matz = make_poisson_matz(nx, ny, nz, greens)
    p_matall = make_poisson_matall(nx, ny, nz, greens)

    ur = np.abs(uref).max()
    for name, fn in (("xla_rfftn", poisson_xla), ("matz", p_matz),
                     ("matall", p_matall)):
        u = np.asarray(jax.jit(fn)(rho))
        err = np.abs(u - uref).max() / ur
        ms = chain_ms(fn, rho)
        print(f"{name:10s}: {ms:7.3f} ms   rel_err={err:.3e}", flush=True)


if __name__ == "__main__":
    main()
