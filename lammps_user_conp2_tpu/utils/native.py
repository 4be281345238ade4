"""ctypes bindings for the native host-runtime library (native/conp2_native.cpp).

Auto-builds the .so with g++ on first use (cached); every entry point has a
pure-Python fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libconp2_native.so"))
_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("CONP2_NO_NATIVE") == "1":
        return None
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.conp2_open_data.restype = ctypes.c_void_p
        lib.conp2_open_data.argtypes = [ctypes.c_char_p]
        lib.conp2_get_long.restype = ctypes.c_long
        lib.conp2_get_long.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.conp2_close.argtypes = [ctypes.c_void_p]
        lib.conp2_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 14
        lib.conp2_fill.restype = None
        lib.conp2_fill_pair_ij.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.conp2_fill_pair_ij.restype = None
        lib.conp2_write_dump_frame.restype = ctypes.c_int
        lib.conp2_write_dump_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.conp2_write_matrix.restype = ctypes.c_int
        lib.conp2_write_matrix.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def parse_data_native(path: str):
    """Returns the same field dict the Python parser produces, or None."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.conp2_open_data(path.encode())
    if not h:
        return None
    try:
        g = lambda f: lib.conp2_get_long(h, f.encode())
        n = g("natoms")
        nb, na = g("nbonds"), g("nangles")
        nt, nbt, nat = g("natomtypes"), g("nbondtypes"), g("nangletypes")
        boxlo = np.zeros(3)
        boxhi = np.zeros(3)
        tag = np.zeros(n, np.int64)
        mol = np.zeros(n, np.int64)
        typ = np.zeros(n, np.int64)
        q = np.zeros(n)
        x = np.zeros((n, 3))
        v = np.zeros((n, 3))
        mass = np.zeros(nt + 1)
        pc = np.zeros((nt + 1, 2))
        bc = np.zeros((nbt + 1, 2))
        ac = np.zeros((nat + 1, 2))
        bonds = np.zeros((max(nb, 1), 3), np.int64)
        angles = np.zeros((max(na, 1), 4), np.int64)
        lib.conp2_fill(h, _ptr(boxlo), _ptr(boxhi), _ptr(tag), _ptr(mol),
                       _ptr(typ), _ptr(q), _ptr(x), _ptr(v), _ptr(mass),
                       _ptr(pc), _ptr(bc), _ptr(ac), _ptr(bonds), _ptr(angles))
        pc_ij = None
        if g("has_pair_ij") == 1:
            pc_ij = np.zeros((nt + 1, nt + 1, 2))
            lib.conp2_fill_pair_ij(h, _ptr(pc_ij))
        return dict(natoms=n, natomtypes=nt, box_lo=boxlo, box_hi=boxhi,
                    tag=tag, mol=mol, type=typ, q=q, x=x, v=v,
                    mass_by_type=mass, pair_coeffs=pc, bond_coeffs=bc,
                    angle_coeffs=ac, bonds=bonds[:nb], angles=angles[:na],
                    pair_coeffs_ij=pc_ij)
    finally:
        lib.conp2_close(h)


def write_dump_frame_native(path: str, mode: str, step: int, box_lo, box_hi,
                            tag, x, q=None) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    tag = np.ascontiguousarray(tag, np.int64)
    x = np.ascontiguousarray(x, np.float64)
    lo = np.ascontiguousarray(box_lo, np.float64)
    hi = np.ascontiguousarray(box_hi, np.float64)
    qp = (np.ascontiguousarray(q, np.float64).ctypes.data_as(ctypes.c_void_p)
          if q is not None else None)
    rc = lib.conp2_write_dump_frame(
        path.encode(), mode.encode(), int(step), len(tag), _ptr(lo), _ptr(hi),
        _ptr(tag), _ptr(x), qp)
    return rc == 0
