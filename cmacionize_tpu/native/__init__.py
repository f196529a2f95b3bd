"""Native (C++) host-side kernels, loaded through ctypes.

Build once with ``python -m cmacionize_tpu.native.build`` (or just import —
the library is compiled on first use if g++ is available).  Falls back
cleanly: callers treat `load()` returning None as "use the numpy path".
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_sph_native.so")
_lib = None
_load_attempted = False


def build(force: bool = False) -> bool:
    """Compile sph_mapping.cpp → _sph_native.so.  Returns success."""
    src = os.path.join(_HERE, "sph_mapping.cpp")
    if os.path.exists(_SO_PATH) and not force:
        if os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
            return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             src, "-o", _SO_PATH],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load():
    """Load (building if needed) the native library; None on failure."""
    global _lib, _load_attempted
    if _lib is not None:
        return _lib
    if _load_attempted:
        return None
    _load_attempted = True
    if not build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    d = ctypes.POINTER(ctypes.c_double)
    i = ctypes.POINTER(ctypes.c_int64)
    lib.deposit_m_over_v.argtypes = [d, d, ctypes.c_int64, d, d, i, d]
    lib.deposit_sph_kernel.argtypes = [d, d, d, ctypes.c_int64, d, d, i, d]
    lib.sample_grid.argtypes = [d, i, d, d, d, ctypes.c_int64, d]
    _lib = lib
    return _lib


def _ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def deposit_m_over_v(positions, masses, anchor, sides, dims):
    lib = load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float64)
    masses = np.ascontiguousarray(masses, np.float64)
    anchor = np.ascontiguousarray(anchor, np.float64)
    sides = np.ascontiguousarray(sides, np.float64)
    dims = np.ascontiguousarray(dims, np.int64)
    grid = np.zeros(int(dims.prod()), np.float64)
    lib.deposit_m_over_v(
        _ptr(positions), _ptr(masses), len(masses),
        _ptr(anchor), _ptr(sides), _iptr(dims), _ptr(grid),
    )
    return grid.reshape(tuple(dims))


def deposit_sph_kernel(positions, masses, smoothing_lengths, anchor, sides, dims):
    lib = load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float64)
    masses = np.ascontiguousarray(masses, np.float64)
    smoothing_lengths = np.ascontiguousarray(smoothing_lengths, np.float64)
    anchor = np.ascontiguousarray(anchor, np.float64)
    sides = np.ascontiguousarray(sides, np.float64)
    dims = np.ascontiguousarray(dims, np.int64)
    grid = np.zeros(int(dims.prod()), np.float64)
    lib.deposit_sph_kernel(
        _ptr(positions), _ptr(masses), _ptr(smoothing_lengths), len(masses),
        _ptr(anchor), _ptr(sides), _iptr(dims), _ptr(grid),
    )
    return grid.reshape(tuple(dims))


def sample_grid(grid, anchor, sides, positions):
    lib = load()
    if lib is None:
        return None
    grid = np.ascontiguousarray(grid, np.float64)
    dims = np.asarray(grid.shape, np.int64)
    anchor = np.ascontiguousarray(anchor, np.float64)
    sides = np.ascontiguousarray(sides, np.float64)
    positions = np.ascontiguousarray(positions, np.float64)
    out = np.zeros(len(positions), np.float64)
    lib.sample_grid(
        _ptr(grid.reshape(-1)), _iptr(dims), _ptr(anchor), _ptr(sides),
        _ptr(positions), len(positions), _ptr(out),
    )
    return out
