"""Shared chained-loop timing for the TPU tools.

Two axon-relay pitfalls shape this helper (CLAUDE.md):
  1. Only CHAINED loops measure real step cost — state must feed back.
  2. Repeated calls with bit-identical inputs are memoized relay-side and
     read ~0 ms.  The old per-tool `xx + 1e-30*f` chains hit this whenever
     the update rounded to zero in f32 (ulp at x~100 is 7.6e-6), making the
     state an exact fixed point: trials 2-3 re-sent the same input and
     measured nothing.

Fix: thread a per-trial scalar `e` through the program.  `a + e` with
e <= 1e-38 is bitwise `a` for every normal f32/f64 value (it only shifts
subnormals), so physics is unchanged, but the program INPUT differs per
trial and the relay cannot memoize the call.  The fori_loop body always
executes on device regardless.
"""
import time

import jax
import jax.numpy as jnp


def _nudge(s, e):
    def leaf(a):
        a = jnp.asarray(a)
        if jnp.issubdtype(a.dtype, jnp.floating):
            return a + jnp.asarray(e, a.dtype)
        return a
    return jax.tree_util.tree_map(leaf, s)


def chain_ms(fn, x0, iters=50, trials=3):
    """min over `trials` of the per-iteration ms of a chained fori_loop.

    `fn(state) -> state` is iterated `iters` times on device per call;
    each trial's input is nudged by a sub-ulp scalar so no two calls are
    bit-identical (defeats relay memoization) while the numerics are
    untouched.
    """
    run = jax.jit(lambda s, e: jax.lax.fori_loop(
        0, iters, lambda i, t: fn(t), _nudge(s, e)))
    s = jax.block_until_ready(run(x0, 0.0))
    best = float("inf")
    for k in range(trials):
        t0 = time.perf_counter()
        s = jax.block_until_ready(run(s, (k + 1) * 1e-38))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best
