"""Parser for LAMMPS log thermo blocks — used to compare against the
reference's recorded runs (tests/dilute/persist.log etc.)."""

from __future__ import annotations

import numpy as np


def parse_thermo_blocks(path: str):
    """Returns a list of dict(column -> np.ndarray), one per thermo block."""
    blocks = []
    with open(path, errors="replace") as f:
        lines = f.readlines()
    i = 0
    while i < len(lines):
        parts = lines[i].split()
        if parts and parts[0] == "Step":
            cols = parts
            rows = []
            i += 1
            while i < len(lines):
                p = lines[i].split()
                if len(p) == len(cols):
                    try:
                        rows.append([float(v) for v in p])
                    except ValueError:
                        break
                else:
                    break
                i += 1
            if rows:
                arr = np.array(rows)
                blocks.append({c: arr[:, k] for k, c in enumerate(cols)})
        else:
            i += 1
    return blocks
