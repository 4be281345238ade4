"""LAMMPS-style trajectory dump write/read + rerun support.

The reference decks dump `id xu yu zu q` (tests/il_onelayer/input:101-103)
and rerun from those files (`rerun sol2.traj dump x y z`, N=7 trials) to
check that charges regenerate deterministically from positions.  We write
the same format and implement rerun as: for each frame, run the charge solve
at the dumped positions.
"""

from __future__ import annotations

import numpy as np


def write_dump_frame(f, step: int, natoms: int, box_lo, box_hi, tag, x, q=None):
    f.write("ITEM: TIMESTEP\n%d\n" % step)
    f.write("ITEM: NUMBER OF ATOMS\n%d\n" % natoms)
    f.write("ITEM: BOX BOUNDS pp pp pp\n")
    for ax in range(3):
        f.write(f"{box_lo[ax]:.16e} {box_hi[ax]:.16e}\n")
    if q is None:
        f.write("ITEM: ATOMS id x y z\n")
        for i in range(natoms):
            f.write(f"{int(tag[i])} {x[i,0]:.8g} {x[i,1]:.8g} {x[i,2]:.8g}\n")
    else:
        f.write("ITEM: ATOMS id xu yu zu q\n")
        for i in range(natoms):
            f.write(f"{int(tag[i])} {x[i,0]:13.8g} {x[i,1]:13.8g} "
                    f"{x[i,2]:13.8g} {q[i]:13.8g}\n")


def read_dump(path: str):
    """Yields (step, tags, columns dict) per frame."""
    frames = []
    with open(path) as f:
        lines = f.readlines()
    i = 0
    while i < len(lines):
        assert lines[i].startswith("ITEM: TIMESTEP")
        step = int(lines[i + 1])
        natoms = int(lines[i + 3])
        i += 4
        assert lines[i].startswith("ITEM: BOX")
        i += 4
        cols = lines[i].split()[2:]
        i += 1
        data = np.array([[float(v) for v in lines[i + k].split()]
                         for k in range(natoms)])
        i += natoms
        order = np.argsort(data[:, cols.index("id")], kind="stable")
        data = data[order]
        frames.append((step, data[:, 0].astype(np.int64),
                       {c: data[:, k] for k, c in enumerate(cols)}))
    return frames


def rerun_charges(solver, frames, q0, tags=None):
    """Recompute electrode charges for dumped frames (the reference's
    `rerun ... dump x y z` trials).  Returns list of (step, qleft-resolved q).

    ``tags``: the System's tag array.  read_dump sorts each frame by tag
    id, but the solver expects SYSTEM row order — which differs whenever
    the system was atom-reordered (models.system.electrodes_first).  When
    given, each frame's rows are mapped tag-order -> system order; the
    returned q arrays are in system order too."""
    import jax.numpy as jnp
    out = []
    q = jnp.asarray(q0)
    for (step, ftags, cols) in frames:
        xcols = [c for c in ("x", "xu") if c in cols][0]
        ycols = [c for c in ("y", "yu") if c in cols][0]
        zcols = [c for c in ("z", "zu") if c in cols][0]
        x = np.stack([cols[xcols], cols[ycols], cols[zcols]], axis=1)
        if tags is not None:
            # ftags is ascending (read_dump sorts); position of each system
            # tag in the frame:
            pos = np.searchsorted(ftags, np.asarray(tags))
            x = x[pos]
        qn, scalar = solver.solve(jnp.asarray(x), q, step)
        out.append((step, np.asarray(qn), float(scalar)))
    return out
