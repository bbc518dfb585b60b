"""Native (C++) host-side components with lazy compilation and Python fallback.

The compute path of the framework is JAX/XLA/Pallas; this module covers the
truly sequential host-side piece — the per-seed k-NN search over the tiny
seed-adjacency graph (a settled-array Dijkstra, written independently;
fulfils the role of epic_aux.cpp:44-87). The sequential sweep
distance-transform oracle lives in tests/ (tests/dt_oracle.py): it exists
only to validate the TPU min-plus fixpoint and is not a production path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "geodesic.cpp")
_LIB = os.path.join(_HERE, "libgeodesic.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmds = [
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
         _SRC, "-o", _LIB],
        ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
        ["cc", "-O3", "-shared", "-fPIC", "-lstdc++", _SRC, "-o", _LIB],
    ]
    for cmd in cmds:
        try:
            r = subprocess.run(cmd, capture_output=True, timeout=120)
            if r.returncode == 0 and os.path.exists(_LIB):
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def get_lib():
    """Return the loaded shared library, building it on first use.
    Returns None if no toolchain is available (callers fall back to Python)."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.geodesic_knn_all.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
        ]
        _lib = lib
        return _lib


def knn_graph_all(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
                  nmax: int):
    """k nearest seeds for every seed over a CSR graph.

    Returns (best [ns, nmax] int32, dist [ns, nmax] float32). Uses the C++
    Dijkstra when available, a heapq fallback otherwise.
    """
    ns = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float32)
    best = np.empty((ns, nmax), np.int32)
    dist = np.empty((ns, nmax), np.float32)
    lib = get_lib()
    if lib is not None and ns > 0:
        lib.geodesic_knn_all(ns, indptr, indices, data, nmax, best, dist)
        return best, dist
    return _knn_python(indptr, indices, data, nmax, best, dist)


def _knn_python(indptr, indices, data, nmax, best, dist):
    """Settled-array Dijkstra with lazy deletion (same as the C++ path)."""
    import heapq

    ns = len(indptr) - 1
    for src in range(ns):
        tentative = np.full(ns, np.inf, np.float64)
        settled = np.zeros(ns, bool)
        pq = [(0.0, src)]
        tentative[src] = 0.0
        found = 0
        while found < nmax and pq:
            d, u = heapq.heappop(pq)
            if settled[u]:
                continue
            settled[u] = True
            best[src, found] = u
            dist[src, found] = d
            found += 1
            for e in range(indptr[u], indptr[u + 1]):
                v = indices[e]
                cand = d + data[e]
                if not settled[v] and cand < tentative[v]:
                    tentative[v] = cand
                    heapq.heappush(pq, (cand, v))
        best[src, found:] = -1
        dist[src, found:] = np.inf
    return best, dist
