#!/usr/bin/env python
"""Measures the Mosaic tpu.dynamic_gather rate — the candidate to break
the pair sweep's HBM descriptor floor.

The Verlet pair sweep is descriptor-rate-bound at ~2.2 ns/gather-row from
HBM (tools/exp_gather_chunk.py) — 12.3 ms of the 100k step.  Atoms are
z-sorted, so a block of B consecutive atoms has all its neighbors inside
a +-W/2 window of sorted indices.  Mosaic lowers take_along_axis (input,
indices and output all (W, L)) to tpu.dynamic_gather: every LANE gathers
its own column of scalars along the sublane axis.  With the 4-float atom
payload tiled 32x across the 128 lanes, one (W, 128) op fetches W*32
arbitrary window rows.

Per grid step this kernel runs R dependent take_along_axis ops on a
VMEM-resident (W, 128) window; the reported ns/row divides by W*32 rows
per op.  HBM streaming of the blocks is amortized over R.
"""
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timing import chain_ms

R = int(os.environ.get("R", "8"))


def gather_kernel(win_ref, idx_ref, out_ref):
    w = win_ref[0]                    # (W, 128) f32
    ix = idx_ref[0]                   # (W, 128) int32
    acc = jnp.zeros_like(w)
    wn = w.shape[0]
    for r in range(R):
        g = jnp.take_along_axis(w, (ix + r) % wn, axis=0)
        acc = acc + g
    out_ref[0] = acc


def run_probe(nb, W):
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((nb, W, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, size=(nb, W, 128)), jnp.int32)

    f = pl.pallas_call(
        gather_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, W, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, W, 128), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, W, 128), jnp.float32),
    )

    def step(s):
        out = f(win + s[0, 0, 0], idx)
        return s + 1e-30 * jnp.sum(out)

    ms = chain_ms(step, jnp.zeros((1, 1, 1), jnp.float32), iters=20)
    rows = nb * R * W * 32            # 4-float payload rows per op
    print(f"W={W} nb={nb} R={R}: {ms:7.3f} ms  "
          f"{ms * 1e6 / rows:6.4f} ns/row  "
          f"({ms * 1e6 / (rows * 4):6.4f} ns/element)", flush=True)


def main():
    run_probe(nb=32, W=2048)
    run_probe(nb=32, W=4096)
    run_probe(nb=8, W=8192)


if __name__ == "__main__":
    main()
