"""Native (C++) host-side components with lazy compilation and Python fallback.

The compute path of the framework is JAX/XLA/Pallas; these kernels cover the
truly sequential host-side pieces (per-seed Dijkstra over the seed-adjacency
graph, the sweep-based distance-transform oracle) that the reference also runs
on the CPU.
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
        lib.geodesic_dt_sweeps.restype = ctypes.c_float
        lib.geodesic_dt_sweeps.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
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
    import heapq

    ns = len(indptr) - 1
    for seed in range(ns):
        done = np.full(ns, np.inf, np.float64)
        heap = [(0.0, seed)]
        done[seed] = 0.0
        n = 0
        while heap:
            d, node = heapq.heappop(heap)
            if d > done[node]:
                continue
            best[seed, n] = node
            dist[seed, n] = d
            n += 1
            if n >= nmax:
                break
            for i in range(indptr[node], indptr[node + 1]):
                neigh = indices[i]
                nd = d + data[i]
                if nd >= done[neigh]:
                    continue
                done[neigh] = nd
                heapq.heappush(heap, (nd, neigh))
        best[seed, n:] = -1
        dist[seed, n:] = np.inf
    return best, dist


def dt_sweeps_oracle(cost: np.ndarray, dmap: np.ndarray, labels: np.ndarray,
                     max_iter: int = 40, min_change: float = 1.0):
    """Sequential sweep distance transform (reference semantics). In-place on
    dmap/labels. Used as a CPU oracle/fallback."""
    cost = np.ascontiguousarray(cost, np.float32)
    dmap_c = np.ascontiguousarray(dmap, np.float32)
    labels_c = np.ascontiguousarray(labels, np.int32)
    ty, tx = cost.shape
    lib = get_lib()
    if lib is not None:
        lib.geodesic_dt_sweeps(cost, dmap_c, labels_c, tx, ty, max_iter,
                               min_change)
        return dmap_c, labels_c
    return _dt_python(cost, dmap_c, labels_c, max_iter, min_change)


def _dt_python(cost, dmap, labels, max_iter, min_change):
    xs = [-1, 1, 1, -1]
    ys = [1, 1, -1, -1]
    ty, tx = cost.shape
    i, end_iter = 0, 4
    while i < end_iter:
        i += 1
        sx, sy = xs[i % 4], ys[i % 4]
        max_diff = 0.0
        yr = range(0, ty) if sy > 0 else range(ty - 1, -1, -1)
        xr = range(0, tx) if sx > 0 else range(tx - 1, -1, -1)
        by = 0 if sy > 0 else ty - 1
        bx = 0 if sx > 0 else tx - 1
        for j in yr:
            for x in xr:
                t1, l1 = (np.inf, -1) if j == by else (dmap[j - sy, x], labels[j - sy, x])
                t2, l2 = (np.inf, -1) if x == bx else (dmap[j, x - sx], labels[j, x - sx])
                dt12 = abs(t1 - t2) if np.isfinite(t1) or np.isfinite(t2) else np.inf
                C = cost[j, x]
                if dt12 > C:
                    if t1 < t2:
                        t0, l0 = t1 + C, l1
                    else:
                        t0, l0 = t2 + C, l2
                else:
                    t0 = 0.5 * (t1 + t2 + np.sqrt(2 * C * C - dt12 * dt12))
                    l0 = l1 if t1 < t2 else l2
                if t0 < dmap[j, x]:
                    max_diff = max(max_diff, dmap[j, x] - t0)
                    dmap[j, x] = t0
                    labels[j, x] = l0
        if max_diff > min_change:
            end_iter = min(max_iter, i + 3)
    return dmap, labels
