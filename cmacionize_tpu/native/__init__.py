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


def build_cmi(force: bool = False):
    """Compile the CMILibrary-compatible C ABI shim → libcmi_tpu.so.

    The shim (cmi_c_library.c) embeds CPython and forwards the reference's
    cmi_* C API (/root/reference/src/CMILibrary.hpp:46-70) into
    cmacionize_tpu.cmi.  Returns the shared-library path, or None when no
    C toolchain / embedding flags are available.
    """
    src = os.path.join(_HERE, "cmi_c_library.c")
    out = os.path.join(_HERE, "libcmi_tpu.so")
    if os.path.exists(out) and not force:
        if os.path.getmtime(out) >= os.path.getmtime(src):
            return out
    try:
        includes = subprocess.run(
            ["python3-config", "--includes"],
            check=True, capture_output=True, text=True).stdout.split()
        ldflags = subprocess.run(
            ["python3-config", "--ldflags", "--embed"],
            check=True, capture_output=True, text=True).stdout.split()
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", src]
            + includes + ldflags + ["-o", out],
            check=True, capture_output=True,
        )
        return out
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


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
    lib.petkova_box_fraction.restype = ctypes.c_double
    lib.petkova_box_fraction.argtypes = [d, ctypes.c_double, d, d]
    lib.petkova_deposit.argtypes = [
        d, d, d, ctypes.c_int64, d, d, i, ctypes.c_int, d]
    lib.octree_create.restype = ctypes.c_void_p
    lib.octree_create.argtypes = [d, ctypes.c_int64]
    lib.octree_radius.restype = ctypes.c_int64
    lib.octree_radius.argtypes = [
        ctypes.c_void_p, d, ctypes.c_double, i, ctypes.c_int64]
    lib.octree_knn.restype = ctypes.c_int64
    lib.octree_knn.argtypes = [ctypes.c_void_p, d, ctypes.c_int64, i, d]
    lib.octree_free.argtypes = [ctypes.c_void_p]
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


def petkova_box_fraction(position, h, lo, hi):
    """Exact mass fraction of a cubic-spline kernel inside one box."""
    lib = load()
    if lib is None:
        return None
    position = np.ascontiguousarray(position, np.float64)
    lo = np.ascontiguousarray(lo, np.float64)
    hi = np.ascontiguousarray(hi, np.float64)
    return lib.petkova_box_fraction(_ptr(position), float(h), _ptr(lo),
                                    _ptr(hi))


def petkova_deposit(positions, masses, smoothing_lengths, anchor, sides,
                    dims, normalize=True):
    """Petkova et al. (2018) exact mass-conserving SPH->grid density map.

    Native equivalent of the reference's SPHARRAY_MAPPING_PETKOVA
    (/root/reference/src/SPHArrayInterface.cpp:739-930).  Returns the
    density grid, or None if the native library is unavailable.
    """
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
    lib.petkova_deposit(
        _ptr(positions), _ptr(masses), _ptr(smoothing_lengths), len(masses),
        _ptr(anchor), _ptr(sides), _iptr(dims), int(bool(normalize)),
        _ptr(grid),
    )
    return grid.reshape(tuple(dims))


class Octree:
    """Octree point locator over particle positions.

    Native counterpart of Octree.hpp / PointLocations.hpp: sphere queries
    (``get_ngbs_sphere``) and k-nearest-neighbor searches behind the SPH
    interface.  Raises RuntimeError if the native library is unavailable.
    """

    def __init__(self, positions):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable; build with "
                               "cmacionize_tpu.native.build()")
        self._lib = lib
        self._positions = np.ascontiguousarray(positions, np.float64)
        self._n = len(self._positions)
        self._handle = lib.octree_create(_ptr(self._positions), self._n)

    def radius_neighbors(self, center, radius):
        """Indices of all points within ``radius`` of ``center``."""
        center = np.ascontiguousarray(center, np.float64)
        cap = max(64, self._n // 8)
        while True:
            out = np.empty(cap, np.int64)
            count = self._lib.octree_radius(
                self._handle, _ptr(center), float(radius), _iptr(out), cap)
            if count <= cap:
                return out[:count]
            cap = int(count)

    def knn(self, center, k):
        """(indices, distances) of the k nearest points, ascending."""
        center = np.ascontiguousarray(center, np.float64)
        k = min(int(k), self._n)
        idx = np.empty(k, np.int64)
        dist = np.empty(k, np.float64)
        m = self._lib.octree_knn(
            self._handle, _ptr(center), k, _iptr(idx), _ptr(dist))
        return idx[:m], dist[:m]

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.octree_free(self._handle)
            self._handle = None
