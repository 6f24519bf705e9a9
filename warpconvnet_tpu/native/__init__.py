"""ctypes bindings for the native host coordinate engine
(``csrc/host_coords.cpp``).

The TPU deployment splits coordinate work: the device executes the jitted
sort-based engine (``ops/``) inside the step; the **input pipeline** uses
this C++/OpenMP engine to voxelize, deduplicate, and pre-plan kernel-map pair
tables on the host, overlapped with device compute (the role the reference's
``_C.cuhash`` plays on GPU, relocated to where a TPU system actually does
this work).

Builds on demand with g++ (no pybind11; plain C ABI + ctypes). Falls back
gracefully: ``is_available()`` is False if no compiler — callers keep using
the numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "csrc", "host_coords.cpp")
_LIB_PATH = os.path.join(_HERE, "_host_coords.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", src, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.wct_voxelize.restype = ctypes.c_int32
        lib.wct_voxelize.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_float, i32p, i32p, ctypes.c_int64]
        lib.wct_voxelize_csr.restype = ctypes.c_int32
        lib.wct_voxelize_csr.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_float, i32p, i32p, ctypes.c_int64]
        lib.wct_unique_coords.restype = ctypes.c_int32
        lib.wct_unique_coords.argtypes = [
            i32p, ctypes.c_int64, i32p, ctypes.c_int64]
        lib.wct_build_pair_table.restype = None
        lib.wct_build_pair_table.argtypes = [
            i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, ctypes.c_int64,
            i32p, i32p]
        lib.wct_reverse_pair_table.restype = None
        lib.wct_reverse_pair_table.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p]
        lib.wct_stride_coords.restype = ctypes.c_int32
        lib.wct_stride_coords.argtypes = [
            i32p, ctypes.c_int64, i32p, i32p, ctypes.c_int64]
        lib.wct_num_threads.restype = ctypes.c_int32
        lib.wct_num_threads.argtypes = []
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def num_threads() -> int:
    lib = _load()
    return int(lib.wct_num_threads()) if lib else 0


def _i32(a: np.ndarray) -> "ctypes.pointer":
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32(a: np.ndarray) -> "ctypes.pointer":
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def voxelize(points: np.ndarray, voxel_size: float, capacity: Optional[int] = None
             ) -> Tuple[np.ndarray, np.ndarray]:
    """points [N,3] float32 -> (unique voxel coords [M,3] int32, source point
    index [M] int32)."""
    lib = _load()
    assert lib is not None, "native engine unavailable"
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    cap = capacity or n
    out_c = np.empty((cap, 3), np.int32)
    out_i = np.empty((cap,), np.int32)
    m = lib.wct_voxelize(_f32(pts), n, ctypes.c_float(voxel_size),
                         _i32(out_c), _i32(out_i), cap)
    return out_c[:m], out_i[:m]


def voxelize_csr(points: np.ndarray, voxel_size: float,
                 capacity: Optional[int] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """points [N,3] -> (unique coords [M,3], per-point voxel id [N])."""
    lib = _load()
    assert lib is not None, "native engine unavailable"
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    cap = capacity or n
    out_c = np.empty((cap, 3), np.int32)
    vid = np.empty((n,), np.int32)
    m = lib.wct_voxelize_csr(_f32(pts), n, ctypes.c_float(voxel_size),
                             _i32(out_c), _i32(vid), cap)
    return out_c[:m], vid


def unique_coords(coords: np.ndarray, capacity: Optional[int] = None) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native engine unavailable"
    c = np.ascontiguousarray(coords, np.int32)
    cap = capacity or len(c)
    out = np.empty((cap, 3), np.int32)
    m = lib.wct_unique_coords(_i32(c), len(c), _i32(out), cap)
    return out[:m]


def stride_coords(coords: np.ndarray, stride, capacity: Optional[int] = None
                  ) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native engine unavailable"
    c = np.ascontiguousarray(coords, np.int32)
    s = np.asarray(
        [stride] * 3 if np.isscalar(stride) else stride, np.int32
    )
    cap = capacity or len(c)
    out = np.empty((cap, 3), np.int32)
    m = lib.wct_stride_coords(_i32(c), len(c), _i32(s), _i32(out), cap)
    return out[:m]


def build_pair_table(in_coords: np.ndarray, out_coords: np.ndarray,
                     offsets: np.ndarray, stride=(1, 1, 1)) -> np.ndarray:
    """Dense kernel map table [K, n_out] int32 (or -1)."""
    lib = _load()
    assert lib is not None, "native engine unavailable"
    ic = np.ascontiguousarray(in_coords, np.int32)
    oc = np.ascontiguousarray(out_coords, np.int32)
    off = np.ascontiguousarray(offsets, np.int32)
    s = np.asarray(
        [stride] * 3 if np.isscalar(stride) else stride, np.int32
    )
    k, n_out = len(off), len(oc)
    table = np.empty((k, n_out), np.int32)
    lib.wct_build_pair_table(_i32(ic), len(ic), _i32(oc), n_out, _i32(off), k,
                             _i32(s), _i32(table))
    return table


def reverse_pair_table(table: np.ndarray, n_in: int) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native engine unavailable"
    t = np.ascontiguousarray(table, np.int32)
    k, n_out = t.shape
    rev = np.empty((k, n_in), np.int32)
    lib.wct_reverse_pair_table(_i32(t), k, n_out, n_in, _i32(rev))
    return rev
