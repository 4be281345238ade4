#!/usr/bin/env python
"""Feasibility stats for a block (cluster) neighbor list at the 100k config.

For i-blocks of B consecutive atoms in the cell-sorted order, the block's
j-list is the UNION of its atoms' Verlet lists.  TPU gather cost is
descriptor-bound with a cliff near ~1.5M descriptors (tools/
exp_gather_desc.py: 5.56M rows 27.5 ms, 1.39M rows 3.3 ms), so
(N/B) x U_pad descriptors decides the win.  CPU-only; prints union-size
percentiles and descriptor totals for B in {8, 16, 32}.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from lammps_user_conp2_tpu import workloads
from lammps_user_conp2_tpu.models.system import exclusion_lists
from lammps_user_conp2_tpu.ops.neighbors import (build_neighbor_list,
                                                 make_neighbor_config)
from lammps_user_conp2_tpu.ops.pairs import make_pair_tables


def main():
    n_elyte = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    system, md, cfg = workloads.synthetic(
        n_elyte=n_elyte, nele_side=23, lz=240.0, lxy=120.0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(system.x0 + 0.15 * rng.standard_normal(system.x0.shape),
                    jnp.float32)
    ti = jnp.asarray(system.type)
    tables = make_pair_tables(system.lj_eps, system.lj_sigma, system.type,
                              jnp.float32)
    ncfg = make_neighbor_config(system.box, tuple(system.box_lo), md.cutoff,
                                system.natoms, periodic=system.periodic,
                                x0=np.asarray(x))
    nbr = build_neighbor_list(ncfg, x, tables, ti)
    n = system.natoms
    idx = np.asarray(nbr.idx)
    print(f"natoms={n} K={ncfg.k_max} cutoff={md.cutoff} skin={ncfg.skin}")
    real = (idx < n)
    print(f"mean real neighbors: {real.sum(1).mean():.1f} "
          f"max {real.sum(1).max()}")

    # block unions in the CELL-SORTED order (the rebuild's sort frame):
    # sort atoms by their cell id so consecutive atoms are spatially close
    g = ncfg.grid
    xs = np.asarray(x)
    ids = []
    for ax, nc in enumerate(g.ncells):
        u = (xs[:, ax] - g.box_lo[ax]) / g.box[ax]
        if g.periodic[ax]:
            u = u - np.floor(u)
        ids.append(np.clip((u * nc).astype(np.int64), 0, nc - 1))
    cx, cy, cz = g.ncells
    cid = (ids[0] * cy + ids[1]) * cz + ids[2]
    perm = np.argsort(cid, kind="stable")
    idx_s = idx[perm]
    for B in (8, 16, 32):
        nb = (n + B - 1) // B
        sizes = np.empty(nb, np.int64)
        pad = n  # sentinel
        for b in range(nb):
            rows = idx_s[b * B:(b + 1) * B]
            u = np.unique(rows)
            sizes[b] = (u < pad).sum()
        for pct in (50, 90, 99, 100):
            print(f"B={B:2d} union p{pct}: {np.percentile(sizes, pct):.0f}",
                  end="  ")
        for upad in (96, 128, 160, 192, 256):
            desc = nb * upad / 1e6
            over = (sizes > upad).mean() * 100
            print(f"| U={upad}: {desc:.2f}M desc, {over:.1f}% over", end=" ")
        print()


if __name__ == "__main__":
    main()
