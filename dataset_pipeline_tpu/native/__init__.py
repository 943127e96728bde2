"""Native host kernels (C++ via ctypes), compiled on demand and cached.

The device compute path is JAX/XLA; these cover the host-runtime loops the
reference implements in C++ (acceleration-structure builds, bulk PLY
staging). Falls back to pure NumPy when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "gridder.cc")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "DPT_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "dpt_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"gridder_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + ".tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    os.replace(tmp, so_path)
    return so_path


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        so = _build()
        if so is not None:
            lib = ctypes.CDLL(so)
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
            u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
            lib.insert_triangles.restype = ctypes.c_int64
            lib.insert_triangles.argtypes = [
                i64p, i64p, ctypes.c_int64, i64p, ctypes.c_int32,
                i32p, i32p, ctypes.c_int64,
            ]
            lib.gather_ply_vertices.restype = None
            lib.gather_ply_vertices.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, f32p, f32p, u8p,
            ]
            lib.morton_cell_ids.restype = None
            lib.morton_cell_ids.argtypes = [
                f32p, ctypes.c_int64, f32p, ctypes.c_float, ctypes.c_int32, u64p,
            ]
            lib.greedy_merge.restype = ctypes.c_int64
            lib.greedy_merge.argtypes = [
                f32p, f32p, u8p, f32p, ctypes.c_int64, ctypes.c_float,
                ctypes.c_int32, f32p, f32p, u8p, f32p,
            ]
            lib.grid_knn.restype = ctypes.c_int32
            lib.grid_knn.argtypes = [
                f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_float, i32p, f32p,
            ]
            _lib = lib
    return _lib


def grid_knn(points: np.ndarray, queries: np.ndarray, k: int,
             skip_self: bool = False, cell_hint: float = 0.0):
    """Exact threaded kNN over a uniform grid with expanding-ring probes.

    Host-side counterpart of the reference's PCL KdTree queries
    (``opt/problem.cc:706-786``). Returns (d2 (Q,k) float32 ascending,
    idx (Q,k) int32, -1 padded) or None if the native library is
    unavailable. ``skip_self`` excludes the identically-INDEXED point
    (use when queries is the same array as points)."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    qs = np.ascontiguousarray(queries, np.float32)
    n, q = len(pts), len(qs)
    k = int(min(k, n))
    out_idx = np.empty((q, k), np.int32)
    out_d2 = np.empty((q, k), np.float32)
    rc = lib.grid_knn(pts, n, qs, q, k, 1 if skip_self else 0,
                      np.float32(cell_hint), out_idx, out_d2)
    if rc != 0:
        return None
    return out_d2, out_idx


def insert_triangles(lo_cells: np.ndarray, hi_cells: np.ndarray, dims,
                     max_per_cell: int) -> Optional[np.ndarray]:
    """C fast path for triangle-grid insertion; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    dims = np.ascontiguousarray(dims, np.int64)
    num_cells = int(dims[0] * dims[1] * dims[2])
    table = np.full((num_cells, max_per_cell), -1, np.int32)
    counts = np.zeros(num_cells, np.int32)
    lib.insert_triangles(
        np.ascontiguousarray(lo_cells, np.int64),
        np.ascontiguousarray(hi_cells, np.int64),
        len(lo_cells), dims, max_per_cell, table, counts, num_cells,
    )
    return table


def greedy_merge(points: np.ndarray, colors: np.ndarray, scan_indices: np.ndarray,
                 max_radius: np.ndarray, merge_distance: float,
                 num_scans: int):
    """Reference-semantics greedy radius merge (C fast path); None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(points)
    out_pts = np.empty((max(n, 1), 3), np.float32)
    out_col = np.empty(max(n, 1), np.float32)
    out_scan = np.empty(max(n, 1), np.uint8)
    out_mr = np.empty(max(n, 1), np.float32)
    m = lib.greedy_merge(
        np.ascontiguousarray(points, np.float32),
        np.ascontiguousarray(colors, np.float32),
        np.ascontiguousarray(scan_indices, np.uint8),
        np.ascontiguousarray(max_radius, np.float32),
        n, np.float32(merge_distance), num_scans,
        out_pts, out_col, out_scan, out_mr,
    )
    return out_pts[:m].copy(), out_col[:m].copy(), out_scan[:m].copy(), out_mr[:m].copy()


def morton_codes(points: np.ndarray, origin: np.ndarray, cell_size: float,
                 bits: int = 21) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(len(points), np.uint64)
    lib.morton_cell_ids(
        np.ascontiguousarray(points, np.float32), len(points),
        np.ascontiguousarray(origin, np.float32),
        np.float32(1.0 / cell_size), bits, out,
    )
    return out
