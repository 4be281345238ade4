"""Reader for LAMMPS ``read_data`` files (atom_style full) and deck helpers.

The reference delegates IO to LAMMPS; our framework owns it.  This module
parses the test-suite data files (e.g. /root/reference/tests/dilute/data)
into a :class:`LammpsData` of numpy arrays, plus the handful of deck
operations the reference test inputs use: ``replicate 1 1 2``,
``change_box ... remap`` and z-mirror ``set`` transforms for the doubled-cell
(zneutr) trials.

Host-side, numpy only — a C++ fast path (native/dataloader) can override
`parse_data_file` for large files.
"""

from __future__ import annotations

import dataclasses
import re

import numpy as np

_HEADER_KEYS = [
    ("atoms", "natoms"),
    ("bonds", "nbonds"),
    ("angles", "nangles"),
    ("dihedrals", "ndihedrals"),
    ("impropers", "nimpropers"),
    ("atom types", "natomtypes"),
    ("bond types", "nbondtypes"),
    ("angle types", "nangletypes"),
    ("dihedral types", "ndihedraltypes"),
    ("improper types", "nimpropertypes"),
]

_SECTIONS = {
    "Masses", "Pair Coeffs", "PairIJ Coeffs", "Bond Coeffs", "Angle Coeffs",
    "Dihedral Coeffs", "Improper Coeffs", "Atoms", "Velocities", "Bonds",
    "Angles", "Dihedrals", "Impropers",
}


@dataclasses.dataclass
class LammpsData:
    """Parsed contents of a LAMMPS data file (atom ids remapped to 0-based,
    sorted by tag; ``tag`` preserves the original ids)."""
    natoms: int
    natomtypes: int
    box_lo: np.ndarray          # (3,)
    box_hi: np.ndarray          # (3,)
    tag: np.ndarray             # (N,) int64 original atom ids
    mol: np.ndarray             # (N,) int64
    type: np.ndarray            # (N,) int64, 1-based LAMMPS types
    q: np.ndarray               # (N,) float64
    x: np.ndarray               # (N, 3) float64
    v: np.ndarray               # (N, 3) float64
    mass_by_type: np.ndarray    # (ntypes+1,) float64, index 0 unused
    pair_coeffs: np.ndarray     # (ntypes+1, 2) [eps, sigma] per type (or zeros)
    pair_coeffs_ij: np.ndarray | None   # (ntypes+1, ntypes+1, 2) explicit, or None
    bond_coeffs: np.ndarray     # (nbondtypes+1, 2) [K, r0]
    angle_coeffs: np.ndarray    # (nangletypes+1, 2) [K, theta0_deg]
    bonds: np.ndarray           # (NB, 3) int64 [type, i, j] 0-based atom idx
    angles: np.ndarray          # (NA, 4) int64 [type, i, j, k]

    @property
    def box(self) -> tuple:
        d = self.box_hi - self.box_lo
        return (float(d[0]), float(d[1]), float(d[2]))


def _strip(line: str) -> str:
    i = line.find("#")
    if i >= 0:
        line = line[:i]
    return line.strip()


def _finalize_raw(f: dict) -> LammpsData:
    """Common post-processing: sort by tag, remap topology to 0-based rows."""
    order = np.argsort(f["tag"], kind="stable")
    inv = {int(f["tag"][o]): k for k, o in enumerate(order)}
    bonds = f["bonds"].copy()
    angles = f["angles"].copy()
    if len(bonds):
        bonds[:, 1] = [inv[int(t)] for t in bonds[:, 1]]
        bonds[:, 2] = [inv[int(t)] for t in bonds[:, 2]]
    if len(angles):
        for c in (1, 2, 3):
            angles[:, c] = [inv[int(t)] for t in angles[:, c]]
    return LammpsData(
        natoms=f["natoms"], natomtypes=f["natomtypes"],
        box_lo=f["box_lo"], box_hi=f["box_hi"],
        tag=f["tag"][order], mol=f["mol"][order], type=f["type"][order],
        q=f["q"][order], x=f["x"][order], v=f["v"][order],
        mass_by_type=f["mass_by_type"], pair_coeffs=f["pair_coeffs"],
        pair_coeffs_ij=f.get("pair_coeffs_ij"),
        bond_coeffs=f["bond_coeffs"], angle_coeffs=f["angle_coeffs"],
        bonds=bonds, angles=angles,
    )


def parse_data_file(path: str, *, use_native: bool = True) -> LammpsData:
    if use_native:
        from . import native
        fields = native.parse_data_native(path)
        if fields is not None and fields["natoms"] > 0:
            return _finalize_raw(fields)
    return parse_data_file_py(path)


def parse_data_file_py(path: str) -> LammpsData:
    with open(path) as f:
        lines = f.readlines()

    header = {}
    box_lo = np.zeros(3)
    box_hi = np.zeros(3)
    i = 1  # skip title line
    n = len(lines)
    section_start = None
    while i < n:
        raw = lines[i]
        s = _strip(raw)
        if not s:
            i += 1
            continue
        # section header?
        name = raw.split("#")[0].strip()
        if name in _SECTIONS:
            section_start = i
            break
        m = re.match(r"^([-\d.eE+]+)\s+([-\d.eE+]+)\s+(xlo xhi|ylo yhi|zlo zhi)$", s)
        if m:
            ax = {"xlo xhi": 0, "ylo yhi": 1, "zlo zhi": 2}[m.group(3)]
            box_lo[ax] = float(m.group(1))
            box_hi[ax] = float(m.group(2))
            i += 1
            continue
        matched = False
        for key, attr in _HEADER_KEYS:
            m = re.match(rf"^(\d+)\s+{key}$", s)
            if m:
                header[attr] = int(m.group(1))
                matched = True
                break
        if matched:
            i += 1
            continue
        if re.match(r"^[-\d.eE+\s]+xy xz yz$", s):
            raise ValueError("triclinic boxes not supported yet")
        i += 1

    natoms = header.get("natoms", 0)
    ntypes = header.get("natomtypes", 0)
    nbonds = header.get("nbonds", 0)
    nangles = header.get("nangles", 0)

    mass_by_type = np.zeros(ntypes + 1)
    pair_coeffs = np.zeros((ntypes + 1, 2))
    pair_coeffs_ij = None
    bond_coeffs = np.zeros((header.get("nbondtypes", 0) + 1, 2))
    angle_coeffs = np.zeros((header.get("nangletypes", 0) + 1, 2))
    tag = np.zeros(natoms, np.int64)
    mol = np.zeros(natoms, np.int64)
    typ = np.zeros(natoms, np.int64)
    q = np.zeros(natoms)
    x = np.zeros((natoms, 3))
    v = np.zeros((natoms, 3))
    bonds = np.zeros((nbonds, 3), np.int64)
    angles = np.zeros((nangles, 4), np.int64)

    def read_section(start: int):
        """Return (name, rows, next_index)."""
        name = lines[start].split("#")[0].strip()
        j = start + 1
        rows = []
        while j < n:
            raw = lines[j]
            nm = raw.split("#")[0].strip()
            if nm in _SECTIONS:
                break
            s = _strip(raw)
            if s:
                rows.append(s.split())
            j += 1
        return name, rows, j

    i = section_start
    while i is not None and i < n:
        name, rows, i = read_section(i)
        if name == "Masses":
            for r in rows:
                mass_by_type[int(r[0])] = float(r[1])
        elif name == "Pair Coeffs":
            for r in rows:
                pair_coeffs[int(r[0])] = [float(r[1]), float(r[2])]
        elif name == "PairIJ Coeffs":
            pair_coeffs_ij = np.zeros((ntypes + 1, ntypes + 1, 2))
            for r in rows:
                a, b = int(r[0]), int(r[1])
                pair_coeffs_ij[a, b] = [float(r[2]), float(r[3])]
                pair_coeffs_ij[b, a] = [float(r[2]), float(r[3])]
        elif name == "Bond Coeffs":
            for r in rows:
                bond_coeffs[int(r[0])] = [float(r[1]), float(r[2])]
        elif name == "Angle Coeffs":
            for r in rows:
                angle_coeffs[int(r[0])] = [float(r[1]), float(r[2])]
        elif name == "Atoms":
            for k, r in enumerate(rows):
                # full: id mol type q x y z [ix iy iz]
                tag[k] = int(r[0])
                mol[k] = int(r[1])
                typ[k] = int(r[2])
                q[k] = float(r[3])
                x[k] = [float(r[4]), float(r[5]), float(r[6])]
        elif name == "Velocities":
            vd = {int(r[0]): [float(r[1]), float(r[2]), float(r[3])] for r in rows}
            for k in range(natoms):
                if tag[k] in vd:
                    v[k] = vd[tag[k]]
        elif name == "Bonds":
            for k, r in enumerate(rows):
                bonds[k] = [int(r[1]), int(r[2]), int(r[3])]
        elif name == "Angles":
            for k, r in enumerate(rows):
                angles[k] = [int(r[1]), int(r[2]), int(r[3]), int(r[4])]
        elif name in ("Dihedrals", "Impropers"):
            if rows:
                raise ValueError(f"{name} present but not supported")

    # remap to 0-based contiguous, sorted by tag (the reference requires
    # contiguous ids too: /root/reference/README.md:26-28)
    order = np.argsort(tag, kind="stable")
    inv = {int(tag[o]): k for k, o in enumerate(order)}
    tag, mol, typ, q, x, v = tag[order], mol[order], typ[order], q[order], x[order], v[order]
    if nbonds:
        bonds[:, 1] = [inv[int(t)] for t in bonds[:, 1]]
        bonds[:, 2] = [inv[int(t)] for t in bonds[:, 2]]
    if nangles:
        for c in (1, 2, 3):
            angles[:, c] = [inv[int(t)] for t in angles[:, c]]

    return LammpsData(
        natoms=natoms, natomtypes=ntypes,
        box_lo=box_lo, box_hi=box_hi,
        tag=tag, mol=mol, type=typ, q=q, x=x, v=v,
        mass_by_type=mass_by_type, pair_coeffs=pair_coeffs,
        pair_coeffs_ij=pair_coeffs_ij,
        bond_coeffs=bond_coeffs, angle_coeffs=angle_coeffs,
        bonds=bonds, angles=angles,
    )


# ---------------------------------------------------------------------------
# deck operations used by the reference test inputs
# ---------------------------------------------------------------------------

def replicate_z2(d: LammpsData) -> LammpsData:
    """``replicate 1 1 2``: duplicate the cell along +z.

    New atoms get tags offset by N and molecule ids offset by max(mol)
    (LAMMPS offsets mol by the molecule count; the decks then reassign
    electrode mols explicitly, see tests/dilute/input:50-57)."""
    n = d.natoms
    zprd = d.box_hi[2] - d.box_lo[2]
    molmax = int(d.mol.max())
    x2 = d.x.copy()
    x2[:, 2] += zprd
    out = dataclasses.replace(
        d,
        natoms=2 * n,
        box_hi=np.array([d.box_hi[0], d.box_hi[1], d.box_hi[2] + zprd]),
        tag=np.concatenate([d.tag, d.tag + n]),
        mol=np.concatenate([d.mol, d.mol + molmax]),
        type=np.concatenate([d.type, d.type]),
        q=np.concatenate([d.q, d.q]),
        x=np.concatenate([d.x, x2]),
        v=np.concatenate([d.v, d.v]),
        bonds=(np.concatenate([d.bonds, d.bonds + np.array([0, n, n])])
               if len(d.bonds) else d.bonds),
        angles=(np.concatenate([d.angles, d.angles + np.array([0, n, n, n])])
                if len(d.angles) else d.angles),
    )
    return out


def change_box_z_centered(d: LammpsData) -> LammpsData:
    """``change_box all z final -lz/2 lz/2 remap units box``."""
    zprd = d.box_hi[2] - d.box_lo[2]
    shift = -zprd / 2 - d.box_lo[2]
    x = d.x.copy()
    x[:, 2] += shift
    return dataclasses.replace(
        d, x=x,
        box_lo=np.array([d.box_lo[0], d.box_lo[1], -zprd / 2]),
        box_hi=np.array([d.box_hi[0], d.box_hi[1], zprd / 2]),
    )


def mirror_group_z(d: LammpsData, mask: np.ndarray, *, flip_vz: bool = False) -> LammpsData:
    """``set group pos z v_newz`` with newz = lz/2 - z (tests/dilute/input:52-54)."""
    zprd = d.box_hi[2] - d.box_lo[2]
    x = d.x.copy()
    x[mask, 2] = zprd / 2 - x[mask, 2]
    v = d.v.copy()
    if flip_vz:
        v[mask, 2] = -v[mask, 2]
    return dataclasses.replace(d, x=x, v=v)


def set_mol(d: LammpsData, old_mol: int, new_mol: int) -> LammpsData:
    mol = d.mol.copy()
    mol[mol == old_mol] = new_mol
    return dataclasses.replace(d, mol=mol)
