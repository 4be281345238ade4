"""Per-phase timing — the TPU equivalent of the reference's hand-rolled
Btime/Ctime/Ktime accounting (fix_conp.cpp:139-141, 549-567, 698-714).

Inside one fused jit step the phases aren't separable at runtime, so the
breakdown is measured by timing each phase's jitted function in isolation
(identical code paths), plus the fused step for the true per-step cost.
Also exposes jax.profiler hooks for full XLA traces.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax


def _time_it(fn, args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def profile_step(engine, state, *, iters: int = 10, log_path: str | None = None):
    """Returns {phase: seconds} — b-vector (Btime+Ktime analogue), charge
    solve, pair forces, k-space forces, constraint, full step."""
    from ..ops.pairs import dense_pair_forces

    sys = engine.system
    u = sys.units()
    x, q = state.x, state.q
    res = {}
    if engine.conp is not None:
        res["b_vector"] = _time_it(
            jax.jit(lambda x, q: engine.conp.b_vector(x, q)), (x, q), iters)
        res["charge_solve"] = _time_it(
            jax.jit(lambda x, q: engine.conp.solve(x, q, 0)), (x, q), iters)
    res["pair_forces"] = _time_it(
        jax.jit(lambda x, q: dense_pair_forces(
            x, q, engine.type_idx, engine.tables, engine.exclusions,
            box=engine.ksp_force.box, periodic=sys.periodic,
            cutoff=engine.md.cutoff, g_ewald=engine.ksp_force.g_ewald,
            qqr2e=u.qqr2e)), (x, q), iters)
    if engine.fksp is not None:
        from ..ops import ewald_factored as ewf
        res["kspace_forces"] = _time_it(
            jax.jit(lambda x, q: ewf.energy_forces_f(engine.fksp, x, q)),
            (x, q), iters)
    elif engine.pppm_grid is not None:
        from ..ops import pppm as pppm_ops
        res["kspace_forces"] = _time_it(
            jax.jit(lambda x, q: pppm_ops.pppm_forces(
                engine.pppm_grid, pppm_ops.spread(engine.pppm_grid, x, q), x, q)),
            (x, q), iters)
    res["full_step"] = _time_it(jax.jit(engine.step), (state,), iters)
    if log_path:
        with open(log_path, "w") as f:
            json.dump({k: round(v * 1e3, 4) for k, v in res.items()}, f)
    return res


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture a full XLA/TPU profile viewable in xprof/tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
