#!/usr/bin/env python
"""Does a Mosaic in-VMEM gather beat the HBM descriptor floor?

The Verlet pair sweep is descriptor-rate-bound at ~2.2 ns/gather-row from
HBM (tools/exp_gather_chunk.py) — 12.3 ms of the 100k step.  Atoms are
z-sorted, so a block of B consecutive atoms has all its neighbors inside
a ±W/2 window of sorted indices.  If Pallas can gather (B, K) rows from a
(W, 4) VMEM-resident window at better than ~2 ns/row, a windowed pair
kernel breaks the floor.

This probe measures ONLY the gather: per grid step, load a (W, 4) window
+ (B, K) local indices, emit sum(window[idx]).  Rates are reported per
gathered ROW (4 f32 lanes each).
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timing import chain_ms


def gather_kernel(win_ref, idx_ref, out_ref):
    w = win_ref[0]                    # (W, 4)
    ix = idx_ref[0]                   # (B, K) int32
    g = jnp.take(w, ix.reshape(-1), axis=0)     # (B*K, 4)
    out_ref[0] = jnp.sum(g.reshape(ix.shape[0], ix.shape[1], 4), axis=1)


def run_probe(nb, B, K, W):
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((nb, W, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, size=(nb, B, K)), jnp.int32)

    f = pl.pallas_call(
        gather_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, W, 4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, K), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, 4), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, B, 4), jnp.float32),
    )

    def step(s):
        out = f(win + s[0, 0, 0], idx)
        return s + 1e-30 * jnp.sum(out)

    ms = chain_ms(step, jnp.zeros((1, 1, 1), jnp.float32), iters=50)
    rows = nb * B * K
    print(f"B={B} K={K} W={W} nb={nb}: {ms:7.3f} ms  "
          f"{ms * 1e6 / rows:6.3f} ns/row", flush=True)


def main():
    # ~5.6M gathered rows, like the production pair sweep
    run_probe(nb=100, B=1024, K=56, W=8192)
    run_probe(nb=100, B=1024, K=56, W=16384)
    run_probe(nb=400, B=256, K=56, W=4096)
    run_probe(nb=50, B=2048, K=56, W=16384)


if __name__ == "__main__":
    main()
