#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric: steps/sec on the reference's only recorded absolute number,
the tests/dilute deck (432 atoms, conp slab, Nevery=1): the reference logs
7.171 timesteps/s on 1 CPU rank (tests/dilute/persist.log; BASELINE.md).
vs_baseline = ours / 7.171 on the same deck.

Extra keys report the north-star workload (il_twolayer, BASELINE.md) and the
charge-solve cost.  Runs on the real TPU in float32; the one-time setup
linear algebra runs on host CPU in float64 (setup_conp handles this).
"""

import json
import os
import sys
import time

import numpy as np


def _build(workload, n):
    import jax.numpy as jnp
    from lammps_user_conp2_tpu import workloads
    from lammps_user_conp2_tpu.models.conp import setup_conp
    from lammps_user_conp2_tpu.models.md import build_engine

    system, md, cfg = getattr(workloads, workload)(n)
    solver = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    eng = build_engine(system, md, solver, dtype=jnp.float32)
    return eng


def bench_steps_per_sec(eng, nsteps=1000, repeats=4):
    """Chained fori_loop (state feeds back) — repeated identical calls are
    memoized by the axon relay and read ~0 ms (CLAUDE.md).  Best-of-N keeps
    the measurement robust to tunnel stall episodes (a stall only ever slows
    a trial, so max(steps/s) discards it).

    nsteps must be large: the axon tunnel adds ~35 ms of fixed overhead per
    device call (measured: a trivial 1000-iter chain costs the same ~35 ms
    as a 10-iter one), so short chains inflate per-step time by 35/nsteps ms.
    At nsteps=1000 the bias is <2% of a 2 ms step."""
    import jax

    state = eng.init_state()
    run = jax.jit(lambda st: jax.lax.fori_loop(
        0, nsteps, lambda i, s: eng.step(s), st))
    state = jax.block_until_ready(run(state))  # compile + warm
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = jax.block_until_ready(run(state))
        dt = time.perf_counter() - t0
        best = max(best, nsteps / dt)
    assert np.isfinite(float(np.asarray(state.energy))), "non-finite energy"
    return best


def bench_charge_solve_ms(eng, iters=1000, repeats=3):
    """CHAINED charge solves (q feeds back — identical-input repeats are
    memoized somewhere in the relay and would read ~0 ms); min over repeats
    discards stall-inflated trials.  iters large to amortize the ~35 ms
    fixed per-call tunnel overhead (see bench_steps_per_sec)."""
    import jax

    state = eng.init_state()
    x = state.x

    def body(i, q):
        qn, _ = eng.conp.solve(x, q, 0)
        return qn

    run = jax.jit(lambda q: jax.lax.fori_loop(0, iters, body, q))
    q = jax.block_until_ready(run(state.q))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        q = jax.block_until_ready(run(q))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def _bench_large_subprocess(result, budget_s=900):
    """100k-atom production config via tools/bench_large.py in a
    timeout-bounded SUBPROCESS — a compile stall there can never cost the
    driver the primary JSON line.  Shares the persistent compile cache so
    reruns skip the ~10 min first compile."""
    import re
    import subprocess

    env = dict(os.environ)
    env.setdefault("CONP2_TPU_COMPILE_CACHE",
                   os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".jax_cache"))
    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "bench_large.py")],
            capture_output=True, text=True, timeout=budget_s, env=env)
        m = re.search(r"step_ms=([\d.]+) steps_per_sec=([\d.]+)",
                      out.stdout)
        if m:
            result["large_100k_step_ms"] = float(m.group(1))
            result["large_100k_steps_per_sec"] = float(m.group(2))
        else:
            result["large_100k_error"] = (out.stdout + out.stderr)[-200:]
    except subprocess.TimeoutExpired:
        result["large_100k_error"] = f"timeout after {budget_s}s"
    except Exception as e:  # noqa: BLE001 — optional section
        result["large_100k_error"] = repr(e)[:200]


def _oracle_pass(budget_s, extra_env):
    """One kernel-oracle subprocess; returns 'ok' or a failure string."""
    import subprocess

    env = dict(os.environ, **extra_env)
    env.setdefault("CONP2_TPU_COMPILE_CACHE",
                   os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".jax_cache"))
    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "kernel_oracle.py")],
            capture_output=True, text=True, timeout=budget_s, env=env)
        if "kernel_oracle ok" in out.stdout:
            return "ok"
        return f"FAIL: {(out.stdout + out.stderr)[-300:]}"
    except subprocess.TimeoutExpired:
        return f"timeout after {budget_s}s"
    except Exception as e:  # noqa: BLE001 — optional section
        return repr(e)[:200]


def _bench_sharded_subprocess(result, budget_s=480):
    """d=1 sharded-engine overhead on the real chip (tools/bench_sharded.py,
    8k tiled-mesh config — same code paths as the 33k run recorded in
    VALIDATION.md at ~1/4 the compile cost, so the section fits its budget
    even on a slow tunnel hour) — the only multi-chip perf statement a
    1-chip environment permits; bounds the shard_map/collective overhead
    the CPU dryrun cannot see.  Subprocess + timeout; shares the cache."""
    import re
    import subprocess

    env = dict(os.environ)
    env.setdefault("CONP2_TPU_COMPILE_CACHE",
                   os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".jax_cache"))
    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "bench_sharded.py"), "synthetic8k", "200"],
            capture_output=True, text=True, timeout=budget_s, env=env)
        m = re.search(r"sharded_d1_ms=([\d.]+) overhead_pct=([-\d.]+)",
                      out.stdout)
        if m:
            result["sharded_d1_step_ms"] = float(m.group(1))
            result["sharded_d1_overhead_pct"] = float(m.group(2))
        else:
            result["sharded_d1_error"] = (out.stdout + out.stderr)[-200:]
    except subprocess.TimeoutExpired:
        result["sharded_d1_error"] = f"timeout after {budget_s}s"
    except Exception as e:  # noqa: BLE001 — optional section
        result["sharded_d1_error"] = repr(e)[:200]


def main():
    t_start = time.time()
    # persistent compile cache: the bench host is stable, and the 100k
    # section's first compile is ~10 min without it
    import lammps_user_conp2_tpu as pkg
    pkg.enable_compile_cache()
    result = {"metric": "dilute_steps_per_sec", "value": 0.0,
              "unit": "steps/s", "vs_baseline": 0.0}

    # 100k section FIRST: its (possibly cold) compile is the only part of
    # the bench that can blow the envelope, and in round 3 it starved after
    # dilute/il spent their ~6 min (BENCH_r03: "timeout after 1455s").  The
    # subprocess is bounded so dilute/il (the primary metric!) always keep
    # ~10 min of the driver's ~30 min envelope.
    if os.environ.get("BENCH_SKIP_LARGE") != "1":
        _bench_large_subprocess(result, budget_s=1100)

    # oracle in TWO passes with asymmetric degradation: a slow tunnel
    # hour (observed: bench wall 1121 -> 2112 s with identical code) must
    # cost the production-geometry pass before it costs the base one, and
    # neither before the primary metrics below.
    oracle_base = None
    if os.environ.get("BENCH_SKIP_ORACLE") != "1":
        ob = min(420, int(1500 - (time.time() - t_start)))
        if ob >= 60:
            oracle_base = _oracle_pass(ob, {"ORACLE_SKIP_PRODUCTION": "1"})
        else:
            oracle_base = "skipped (budget)"
        result["kernel_oracle"] = oracle_base

    try:
        eng = _build("dilute", 0)
        dilute_sps = bench_steps_per_sec(eng, nsteps=4000)
        result["value"] = round(dilute_sps, 3)
        result["vs_baseline"] = round(dilute_sps / 7.171, 2)
    except Exception as e:  # noqa: BLE001 — always emit the JSON line
        result["dilute_error"] = repr(e)[:200]

    if os.environ.get("BENCH_SKIP_IL") != "1":
        try:
            eng2 = _build("il_twolayer", 0)
            # nsteps=4000: at ~1.2 ms/step the ~35 ms fixed tunnel overhead
            # per call is ~0.7% of the chain (1.5% at 2000)
            result["il_twolayer_steps_per_sec"] = round(
                bench_steps_per_sec(eng2, nsteps=4000, repeats=4), 3)
            result["il_twolayer_charge_solve_ms"] = round(
                bench_charge_solve_ms(eng2, iters=1000), 3)
        except Exception as e:  # noqa: BLE001 — report partial results
            result["il_twolayer_error"] = repr(e)[:200]

    if oracle_base == "ok":
        pb = min(600, int(2100 - (time.time() - t_start)))
        if pb >= 120:
            prod = _oracle_pass(pb, {"ORACLE_SKIP_BASE": "1"})
            result["kernel_oracle"] = (
                "ok" if prod == "ok"
                else f"ok (base); production: {prod}")
        else:
            result["kernel_oracle"] = "ok (base); production skipped (budget)"

    if os.environ.get("BENCH_SKIP_SHARDED") != "1":
        # last section: generous budget, a timeout here costs nothing else
        sb = min(720, int(2700 - (time.time() - t_start)))
        if sb >= 120:
            _bench_sharded_subprocess(result, budget_s=sb)
        else:
            result["sharded_d1_error"] = "skipped (budget)"

    result["bench_wall_s"] = round(time.time() - t_start, 1)
    import jax
    result["device"] = str(jax.devices()[0])
    print(json.dumps(result))


if __name__ == "__main__":
    main()
