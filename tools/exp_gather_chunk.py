#!/usr/bin/env python
"""Does chunking a big gather below the ~1.4M-descriptor cliff help?

exp_gather_desc.py found: 5.56M-row gather 27.5 ms, 1.39M rows 3.3 ms —
an 8x per-descriptor nonlinearity.  If the cliff is per-op, a lax.scan of
four 1.39M gathers should run ~4x faster than one 5.56M gather.  Also
measures spatially-local (sorted) indices, which is what the production
neighbor list actually issues.
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
    k = 56
    rng = np.random.default_rng(0)
    width = 4
    tab = jnp.asarray(rng.standard_normal((n + 1, width)), jnp.float32)

    idx_rand = rng.integers(0, n, size=(n, k)).astype(np.int32)
    # production-like locality: neighbor ids are near the row id
    idx_loc = (np.arange(n)[:, None]
               + rng.integers(-400, 400, size=(n, k))) % n
    idx_loc = idx_loc.astype(np.int32)

    for name, idx_np in (("random", idx_rand), ("local", idx_loc)):
        idx = jnp.asarray(idx_np)

        def g_one(t):
            return jnp.sum(t[idx.reshape(-1)], axis=0)[None]

        ms = chain_ms(g_one, tab)
        print(f"{name}  one-shot  (5.56M): {ms:7.3f} ms", flush=True)

        for nchunk in (4, 8, 16):
            rows = idx_np.size // nchunk
            idx_c = jnp.asarray(idx_np.reshape(nchunk, rows))

            def g_chunk(t, idx_c=idx_c, nchunk=nchunk):
                def body(c, acc):
                    return acc + jnp.sum(t[idx_c[c]], axis=0)
                return jax.lax.fori_loop(
                    0, nchunk, body, jnp.zeros((width,), jnp.float32))[None]

            ms = chain_ms(g_chunk, tab)
            print(f"{name}  {nchunk:2d}-chunk ({rows/1e6:.2f}M each): "
                  f"{ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
