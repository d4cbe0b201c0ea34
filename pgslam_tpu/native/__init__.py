"""Native (C++) runtime components, loaded via ctypes.

``graph_core.cpp`` provides the pose-graph shortest-path engine (the role
Boost.Graph plays in the reference). The library is compiled on first
import with the system toolchain; if compilation fails (no compiler in a
restricted environment), everything degrades gracefully to the pure-Python
implementations in :mod:`pgslam_tpu.graph.shortest_path`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graph_core.cpp")
_LIB = os.path.join(_DIR, "libpgslam_graph.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.pg_dijkstra.restype = ctypes.c_int
    lib.pg_dijkstra.argtypes = [
        ctypes.c_int, ctypes.c_int, i32p, i32p, f32p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, f32p, i32p]
    lib.pg_components.restype = ctypes.c_int
    lib.pg_components.argtypes = [ctypes.c_int, ctypes.c_int, i32p, i32p,
                                  i32p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def native_dijkstra(n_vertices: int, edge_from, edge_to, weights,
                    source: int, vertex_ok=None, edge_ok=None,
                    max_settled: Optional[int] = None):
    """Drop-in for :func:`pgslam_tpu.graph.shortest_path.dijkstra`.
    Returns (dists [n], settled list) or raises ImportError if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        raise ImportError("native graph core unavailable")
    ne = len(edge_from)
    ef = np.ascontiguousarray(edge_from, np.int32)
    et = np.ascontiguousarray(edge_to, np.int32)
    w = np.ascontiguousarray(weights, np.float32)
    dist = np.empty(n_vertices, np.float32)
    settled = np.empty(max(n_vertices, 1), np.int32)

    def mask_ptr(m):
        if m is None:
            return None
        arr = np.ascontiguousarray(np.asarray(m, bool).view(np.uint8))
        return arr.ctypes.data_as(ctypes.c_void_p), arr

    vp = mask_ptr(vertex_ok)
    ep = mask_ptr(edge_ok)
    n = lib.pg_dijkstra(
        n_vertices, ne, ef, et, w, int(source),
        vp[0] if vp else None, ep[0] if ep else None,
        0 if max_settled is None else int(max_settled), dist, settled)
    return dist, settled[:n].tolist()


def native_components(n_vertices: int, edge_from, edge_to):
    lib = _load()
    if lib is None:
        raise ImportError("native graph core unavailable")
    ef = np.ascontiguousarray(edge_from, np.int32)
    et = np.ascontiguousarray(edge_to, np.int32)
    labels = np.empty(n_vertices, np.int32)
    n = lib.pg_components(n_vertices, len(ef), ef, et, labels)
    return n, labels
