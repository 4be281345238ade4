"""A-matrix file I/O in the reference's format (matout / org / inv keywords).

Format (fix_conp.cpp:833-849, 960-977): first line = electrode tags
(%20d each), then elenum_all rows of %20.12f (amatrix) / %20.10f
(inv_a_matrix).  Read-back permutes entries by tag to the caller's
electrode order (fix_conp.cpp:721-773).
"""

from __future__ import annotations

import numpy as np


def write_matrix(path: str, tags: np.ndarray, mat: np.ndarray, digits: int = 12):
    ne = len(tags)
    assert mat.shape == (ne, ne)
    with open(path, "w") as f:
        f.write(" " + "".join(f"{int(t):20d}" for t in tags) + "\n")
        for i in range(ne):
            f.write(" " + " ".join(f"{v:20.{digits}f}" for v in mat[i]) + "\n")


def read_matrix(path: str, want_tags: np.ndarray):
    """Returns (tags, matrix) permuted so rows/cols follow want_tags order."""
    with open(path) as f:
        header = f.readline().split()
        tags = np.array([int(t) for t in header])
        ne = len(tags)
        vals = np.fromstring(f.read(), sep=" ")
    if vals.size != ne * ne:
        raise ValueError(
            f"A-matrix file {path} has {vals.size} entries, expected {ne * ne}")
    mat = vals.reshape(ne, ne)
    want = np.asarray(want_tags)
    pos = {int(t): i for i, t in enumerate(tags)}
    try:
        perm = np.array([pos[int(t)] for t in want])
    except KeyError as e:
        raise ValueError(f"electrode tag {e} missing from {path}")
    return tags[perm], mat[np.ix_(perm, perm)]
