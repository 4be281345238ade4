#!/usr/bin/env python
"""One-off TPU perf experiments: bonded fusion, kspace matmul precision,
pallas pair tile sizes.  Chained loops (CLAUDE.md)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.conp import setup_conp
from lammps_user_conp2_tpu.models.md import build_engine


def chain_ms(fn, x0, iters=50, trials=3):
    run = jax.jit(lambda s: jax.lax.fori_loop(0, iters, lambda i, t: fn(t), s))
    s = jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = jax.block_until_ready(run(s))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    system, md, cfg = workloads.il_twolayer(0)
    conp = setup_conp(system, md, cfg, solve_dtype=jnp.float32)
    eng = build_engine(system, md, conp, dtype=jnp.float32)
    st = eng.init_state()
    x, q = st.x, st.q
    eps = jnp.asarray(1e-30, x.dtype)
    u = system.units()
    box = eng.ksp_force.box
    per = system.periodic

    # 1. bonded: combined vs separate
    from lammps_user_conp2_tpu.ops import bonded as B
    bonds = jnp.asarray(system.bonds)
    bco = jnp.asarray(system.bond_coeffs)
    angs = jnp.asarray(system.angles)
    aco = jnp.asarray(system.angle_coeffs)

    def f_sep(xx):
        fb, eb = B.bond_forces(xx, bonds, bco, box=box, periodic=per)
        fa, ea = B.angle_forces(xx, angs, aco, box=box, periodic=per)
        return xx + eps * (fb + fa)

    def f_comb(xx):
        f, e = B.bonded_forces(xx, bonds, bco, angs, aco, box=box, periodic=per)
        return xx + eps * f

    print(f"bonded separate  : {chain_ms(f_sep, x):7.3f} ms")
    print(f"bonded combined  : {chain_ms(f_comb, x):7.3f} ms")

    # correctness
    fb, eb = B.bond_forces(x, bonds, bco, box=box, periodic=per)
    fa, ea = B.angle_forces(x, angs, aco, box=box, periodic=per)
    fc, ec = B.bonded_forces(x, bonds, bco, angs, aco, box=box, periodic=per)
    print("bonded maxdiff   :", float(jnp.abs(fc - (fb + fa)).max()),
          float(jnp.abs(ec - (eb + ea))))

    # 2. kspace force precision
    from lammps_user_conp2_tpu.ops import ewald_factored as ewf
    fk = eng.fksp
    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        p = getattr(jax.lax.Precision, prec)
        import functools
        def f_ksp(xx, _p=p):
            with jax.default_matmul_precision(_p.name.lower() if hasattr(_p, "name") else "float32"):
                e, f = ewf.energy_forces_f(fk, xx, q)
            return xx + eps * f
        # monkeypatch: energy_forces_fkv uses explicit HIGHEST; emulate by
        # temporary module-level precision switch
    # direct: copy of energy_forces with parametrized precision
    def make_ksp(prec):
        def f_ksp(xx):
            mm = lambda a, b: jnp.matmul(a, b, precision=prec)
            (pr, pi), (zr, zi) = ewf.axis_tables_kv(xx, fk.kxy, fk.kz, fk.unitk)
            ug = jnp.asarray(fk.ug, xx.dtype)
            qzr = q[:, None] * zr
            qzi = q[:, None] * zi
            sr = mm(pr.T, qzr) - mm(pi.T, qzi)
            si = mm(pr.T, qzi) + mm(pi.T, qzr)
            wr = ug * sr
            wi = -ug * si
            gr = mm(zr, wr.T) - mm(zi, wi.T)
            gi = mm(zr, wi.T) + mm(zi, wr.T)
            ux, uy, uz = fk.unitk
            kzv = jnp.asarray(fk.kz, xx.dtype) * uz
            gzr = mm(zr, (wr * kzv).T) - mm(zi, (wi * kzv).T)
            gzi = mm(zr, (wi * kzv).T) + mm(zi, (wr * kzv).T)
            im_pg = pr * gi + pi * gr
            im_pgz = pr * gzi + pi * gzr
            kxv = jnp.asarray(fk.kxy[:, 0], xx.dtype) * ux
            kyv = jnp.asarray(fk.kxy[:, 1], xx.dtype) * uy
            fx = mm(im_pg, kxv)
            fy = mm(im_pg, kyv)
            fz = jnp.sum(im_pgz, axis=1)
            f = 2.0 * q[:, None] * jnp.stack([fx, fy, fz], axis=1)
            return f
        return f_ksp

    f_hi = make_ksp(jax.lax.Precision.HIGHEST)(x)
    scale = float(jnp.abs(f_hi).max())
    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH,
                 jax.lax.Precision.DEFAULT):
        fn = make_ksp(prec)
        ms = chain_ms(lambda xx, _f=fn: xx + eps * _f(xx), x)
        err = float(jnp.abs(fn(x) - f_hi).max()) / scale
        print(f"kspace {str(prec):30s}: {ms:7.3f} ms  rel_err {err:.2e}")

    # 3. pallas pair tiles
    from lammps_user_conp2_tpu.ops.pallas.pair_kernel import pair_forces_pallas
    for (tr, tc) in ((256, 512), (128, 512), (256, 256), (512, 512),
                     (128, 1024), (256, 1024), (512, 1024), (1024, 512)):
        try:
            def f_pair(xx, _tr=tr, _tc=tc):
                f, ev, ec2 = pair_forces_pallas(
                    xx, q, eng.type_idx, eng.tables, eng.exclusions,
                    box=box, periodic=per, cutoff=md.cutoff,
                    g_ewald=eng.ksp_force.g_ewald, qqr2e=u.qqr2e,
                    tr=_tr, tc=_tc)
                return xx + eps * f
            print(f"pair tiles ({tr:4d},{tc:4d}) : {chain_ms(f_pair, x):7.3f} ms")
        except Exception as e:
            print(f"pair tiles ({tr:4d},{tc:4d}) : FAIL {repr(e)[:80]}")


if __name__ == "__main__":
    main()
