"""Checkpoint / resume.

The reference has NO restart integration (SURVEY.md section 5) — only the
buggy A-matrix file IO and rerun-from-dump workarounds.  Here we checkpoint
everything needed to resume exactly: the MDState pytree, the solver context
(A^-1/A, elesetq, d, index maps) and a config digest to guard against
mismatched restarts.  Plain .npz — dependency-free and portable.
"""

from __future__ import annotations

import hashlib
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..models.system import MDState


def _config_digest(engine) -> str:
    payload = {
        "natoms": engine.system.natoms,
        "box": engine.system.box,
        "dt": engine.md.dt,
        "cutoff": engine.md.cutoff,
        "mode": engine.conp.cfg.mode.value if engine.conp else None,
        "g_ewald": engine.ksp_force.g_ewald,
    }
    return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()


def save_checkpoint(path: str, engine, state: MDState):
    # the neighbor list and mesh-tile assignment are derived state: rebuilt
    # deterministically from x on load, not serialized
    arrays = {f"state_{k}": np.asarray(v)
              for k, v in state._asdict().items()
              if k not in ("nbr", "tasg")}
    if engine.conp is not None:
        for k, v in engine.conp.ctx._asdict().items():
            arrays[f"ctx_{k}"] = np.asarray(v)
    arrays["digest"] = np.frombuffer(
        _config_digest(engine).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, engine) -> MDState:
    """Returns the restored MDState; verifies the config digest and the
    solver context (A^-1 must match the engine's to machine precision —
    positions/charges resume bit-exact)."""
    z = np.load(path)
    digest = bytes(z["digest"]).decode()
    if digest != _config_digest(engine):
        raise ValueError("checkpoint was written by an incompatible setup "
                         f"(digest {digest[:12]} != current)")
    if engine.conp is not None:
        saved = np.asarray(z["ctx_ainv"])
        cur = np.asarray(engine.conp.ctx.ainv)
        if saved.shape != cur.shape or not np.allclose(saved, cur, atol=1e-10):
            raise ValueError("checkpoint A^-1 differs from the current setup")
    dt = engine.dtype
    kw = {}
    for k in MDState._fields:
        if k in ("nbr", "tasg"):
            continue
        a = z[f"state_{k}"]
        kw[k] = jnp.asarray(a, dt if a.dtype.kind == "f" else None)
    if engine.ncfg is not None:
        from ..ops.neighbors import build_neighbor_list
        kw["nbr"] = build_neighbor_list(engine.ncfg, kw["x"], engine.tables,
                                        engine.type_idx)
    if getattr(engine, "mesh_persist", False):
        from ..ops import pppm as pppm_ops
        kw["tasg"] = jax.jit(
            lambda xx: pppm_ops.tile_assign(engine.pppm_grid, xx))(kw["x"])
    return MDState(**kw)
