#!/usr/bin/env python
"""Electrode capacitance analysis — the headline observable of
constant-potential supercapacitor studies, which the reference leaves to
user post-processing of thermo logs.

Two estimators:

* STATIC: C = dQ_left/dV from the setup linear algebra directly.  The
  charge update is q = A^-1 b + dV * elesetq (fix_conp.cpp:1153-1158), so
  dQ_left/dV = sum_left elesetq = totsetq — no simulation needed.  The
  `<d,d>` diagnostic the reference logs at setup (fix_conp.cpp:458-461) is
  exactly this quantity.
* FLUCTUATION: C_diff = <dQ^2> / (kB T) from an equilibrium trajectory at
  fixed potential (standard constant-potential estimator; units converted
  so C is in e/V like the static one).

Usage: python tools/capacitance.py <workload> <trial> [--steps N] [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def static_capacitance(solver) -> float:
    """dQ_left/dV in e/V (= totsetq; the reference's <d,d> setup log)."""
    return float(np.asarray(solver.ctx.totsetq))


def fluctuation_capacitance(qleft_series: np.ndarray, temp_k: float,
                            units) -> float:
    """C_diff = <dQ^2>/(kB T) in e/V.

    qleft in e; kB T in energy units; the potential unit is
    energy-per-charge / evscale (volts), so C[e/V] =
    var(Q) * evscale / (boltz * T)."""
    var = float(np.var(np.asarray(qleft_series, np.float64)))
    return var * units.evscale / (units.boltz * temp_k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workload")
    ap.add_argument("trial", type=int)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--thermo", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lammps_user_conp2_tpu import workloads
    from lammps_user_conp2_tpu.models.conp import setup_conp
    from lammps_user_conp2_tpu.models.md import build_engine

    system, md, cfg = getattr(workloads, args.workload)(args.trial)
    solver = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    c_static = static_capacitance(solver)
    area = system.box[0] * system.box[1]
    print(f"static capacitance dQ_left/dV = {c_static:.6f} e/V "
          f"({c_static / area * 1e2:.4f} e/V per nm^2 of xy area)")

    eng = build_engine(system, md, solver, dtype=jnp.float32)
    st = eng.init_state()
    st, _ = eng.run(st, max(args.steps // 10, 10), thermo_every=0)  # equil
    st, th = eng.run(st, args.steps, thermo_every=args.thermo)
    qleft = np.asarray(th["qleft"])
    temps = np.asarray(th["temp"])
    t_mean = float(temps.mean())
    c_fluc = fluctuation_capacitance(qleft, t_mean, system.units())
    print(f"fluctuation capacitance <dQ^2>/(kB T) = {c_fluc:.6f} e/V "
          f"at <T> = {t_mean:.1f} K over {len(qleft)} samples")


if __name__ == "__main__":
    main()
