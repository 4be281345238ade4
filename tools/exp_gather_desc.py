#!/usr/bin/env python
"""Microbenchmark: TPU gather cost vs descriptor count and row width.

Hypothesis behind a block (tile) neighbor list: XLA TPU gather cost scales
with the NUMBER of gathered rows (descriptors), nearly independent of row
width up to a vector lane — so gathering one shared neighbor-union per
8-atom block (~12 descriptors/atom) instead of per-atom rows (K=56) should
cut the pair sweep's dominant cost ~5x.

Usage: python tools/exp_gather_desc.py [--cpu]
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


def chain_ms(fn, x0, iters=50, trials=3):
    eps = jnp.asarray(1e-30, jnp.float32)
    run = jax.jit(lambda s: jax.lax.fori_loop(
        0, iters, lambda i, t: t + eps * fn(t), s))
    s = jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = jax.block_until_ready(run(s))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    n = 99362
    rng = np.random.default_rng(0)
    for width in (4, 8):
        tab = jnp.asarray(rng.standard_normal((n + 1, width)), jnp.float32)
        for rows in (n * 56, n * 28, n * 56 // 4, (n // 8) * 96,
                     n * 56 // 8):
            idx = jnp.asarray(rng.integers(0, n, size=rows), jnp.int32)

            def g(t, idx=idx):
                return jnp.sum(t[idx], axis=(0, 1))[None, None]

            ms = chain_ms(g, tab)
            print(f"width={width}  rows={rows/1e6:6.2f}M : {ms:7.3f} ms "
                  f"({rows * width * 4 / ms * 1e3 / 2**30:6.1f} GiB/s)",
                  flush=True)


if __name__ == "__main__":
    main()
