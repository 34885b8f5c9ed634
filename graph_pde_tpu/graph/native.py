"""ctypes bindings for the native cell-list radius-graph builder.

Lazily compiles native/graph_build.cpp with the system toolchain on first
use (cached as native/libgpde_graph.so). The Python fallback (cKDTree)
stays available; graph_pde_tpu.graph.build.radius_connectivity tries this
module first and falls back silently.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgpde_graph.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            src = os.path.join(_NATIVE_DIR, "graph_build.cpp")
            if not os.path.exists(src):
                _build_failed = True
                return None
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.gpde_radius_graph.restype = ctypes.c_int64
        lib.gpde_radius_graph.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double,
        ]
        lib.gpde_copy_edges.restype = None
        lib.gpde_copy_edges.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.gpde_torus2d_graph.restype = ctypes.c_int64
        lib.gpde_torus2d_graph.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double,
        ]
        lib.gpde_copy_torus_edges.restype = None
        lib.gpde_copy_torus_edges.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def native_radius(points: np.ndarray, points_b: Optional[np.ndarray],
                  r: float) -> Tuple[np.ndarray, np.ndarray]:
    """All (i, j) with ||a_i - b_j|| <= r via the C++ cell list.

    Raises RuntimeError when the native library is unavailable (callers
    fall back to the scipy path).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native graph builder unavailable")
    a = np.ascontiguousarray(points, np.float64)
    if a.ndim == 1:
        a = a[:, None]
    na, dim = a.shape
    if dim > 3:
        raise RuntimeError("native builder supports d <= 3")
    if points_b is None:
        b_ptr = None
        nb = 0
    else:
        b = np.ascontiguousarray(points_b, np.float64)
        if b.ndim == 1:
            b = b[:, None]
        assert b.shape[1] == dim
        b_ptr = b.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        nb = b.shape[0]

    with _lock:
        count = lib.gpde_radius_graph(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), na,
            b_ptr, nb, dim, float(r))
        if count < 0:
            raise RuntimeError("native radius graph failed")
        src = np.empty(count, np.int64)
        dst = np.empty(count, np.int64)
        if count > 0:
            lib.gpde_copy_edges(
                src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return src, dst


def native_torus2d(points: np.ndarray, r: float):
    """Periodic min-image radius graph on [0,1)^2 via the C++ cell list.

    Returns (edge_index [2, E], dist, dx, dy) sorted by (src, dst) —
    the same order and bit-identical geometry as the dense numpy path
    (build.torus2d_connectivity). Raises RuntimeError when the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native graph builder unavailable")
    p = np.ascontiguousarray(points, np.float64).reshape(-1, 2)
    n = p.shape[0]
    with _lock:
        count = lib.gpde_torus2d_graph(
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            float(r))
        if count < 0:
            raise RuntimeError("native torus graph failed")
        src = np.empty(count, np.int64)
        dst = np.empty(count, np.int64)
        dist = np.empty(count, np.float64)
        dx = np.empty(count, np.float64)
        dy = np.empty(count, np.float64)
        if count > 0:
            lib.gpde_copy_torus_edges(
                src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                dx.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                dy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    order = np.lexsort((dst, src))  # np.where order of the dense path
    ei = np.stack([src[order], dst[order]])
    return ei, dist[order], dx[order], dy[order]


__all__ = ["native_radius", "native_torus2d", "available"]
