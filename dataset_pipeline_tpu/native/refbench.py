"""Measured single-node CPU baseline: the reference's ICP inner loop in C++.

The reference's own binaries cannot be built in this image — missing and
un-downloadable (zero egress): Eigen, PCL (KdTree/Correspondences), Boost,
Glog, GMP, opengv, GLEW/EGL; only OpenCV is present. ``ref_icp_loop.cc``
therefore mirrors ``/root/reference/src/icp/icp_point_to_plane_impl.h:
115-211`` line for line (global transforms per correspondence, symmetric
residual pair, exact Jacobian expressions, upper-triangular double
Accumulate) and is compiled with the reference's own optimization flags
(``-O2 -msse2 -msse3``, its CMakeLists.txt:82), single-threaded like the
reference's inner loop. This gives a MEASURED reference-algorithm
corr/s-per-inner-iteration on this host's CPU for BASELINE.md.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ref_icp_loop.cc")
_SRC_PHOTO = os.path.join(_HERE, "ref_photo_loop.cc")
_lib = None
_tried = False
_lib_photo = None
_tried_photo = False

# the reference's own flags (CMakeLists.txt:82) + shared-lib necessities
REF_FLAGS = ["-O2", "-msse2", "-msse3"]


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "DPT_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "dpt_native"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"ref_icp_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + ".tmp"
    cmd = (["g++", "-std=c++14"] + REF_FLAGS
           + ["-shared", "-fPIC", _SRC, "-o", tmp])
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    os.replace(tmp, so_path)
    return so_path


def _get():
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        so = _build()
        if so is not None:
            lib = ctypes.CDLL(so)
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
            lib.ref_icp_inner.restype = ctypes.c_double
            lib.ref_icp_inner.argtypes = [
                f32p, f32p, f32p, f32p, ctypes.c_long, ctypes.c_long,
                f32p, f32p, ctypes.c_int, f64p, f64p, f64p,
            ]
            _lib = lib
    return _lib


def _build_photo() -> Optional[str]:
    with open(_SRC_PHOTO, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "DPT_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "dpt_native"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"ref_photo_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + ".tmp"
    cmd = (["g++", "-std=c++14"] + REF_FLAGS
           + ["-shared", "-fPIC", _SRC_PHOTO, "-o", tmp])
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    os.replace(tmp, so_path)
    return so_path


def _get_photo():
    global _lib_photo, _tried_photo
    if _lib_photo is None and not _tried_photo:
        _tried_photo = True
        so = _build_photo()
        if so is not None:
            lib = ctypes.CDLL(so)
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
            lib.ref_photo_inner.restype = ctypes.c_double
            lib.ref_photo_inner.argtypes = [
                f32p, i32p, f32p, ctypes.c_long, ctypes.c_int,
                f32p, ctypes.c_int, ctypes.c_int,
                f32p, ctypes.c_int, ctypes.c_int,
                f32p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.c_int, f64p, f64p, f64p, i64p,
            ]
            _lib_photo = lib
    return _lib_photo


def ref_photo_inner(pts, neighbors, desc, lv0, lv1, scale_z, f, cx, cy,
                    iters: int = 1):
    """Time ``iters`` reference-style photometric H,b accumulation passes
    (PINHOLE, trilinear + chain rule + Huber descriptor rows). Returns
    (seconds, obs_count) or None without a compiler."""
    lib = _get_photo()
    if lib is None:
        return None
    N, K = neighbors.shape
    H = np.zeros((10, 10), np.float64)
    b = np.zeros(10, np.float64)
    cost = np.zeros(1, np.float64)
    count = np.zeros(1, np.int64)
    secs = lib.ref_photo_inner(
        np.ascontiguousarray(pts, np.float32),
        np.ascontiguousarray(neighbors, np.int32),
        np.ascontiguousarray(desc, np.float32), N, K,
        np.ascontiguousarray(lv0, np.float32), lv0.shape[1], lv0.shape[0],
        np.ascontiguousarray(lv1, np.float32), lv1.shape[1], lv1.shape[0],
        np.ascontiguousarray(scale_z, np.float32), f, cx, cy, iters,
        H, b, cost, count)
    return secs, int(count[0])


def ref_icp_inner(ps, ns, pt, nt, R=None, t=None, iters: int = 1,
                  ) -> Optional[Tuple[float, np.ndarray, np.ndarray, float]]:
    """Run ``iters`` reference-style inner H,b,cost accumulations over the
    M correspondences (first half source=cloud0->target=cloud1, second half
    reversed). Returns (seconds, H (6,6 upper), b (6,), cost) or None if no
    compiler is available."""
    lib = _get()
    if lib is None:
        return None
    M = len(ps)
    half = M // 2
    if R is None:
        R = np.tile(np.eye(3, dtype=np.float32)[None], (2, 1, 1))
    if t is None:
        t = np.zeros((2, 3), np.float32)
    H = np.zeros((6, 6), np.float64)
    b = np.zeros(6, np.float64)
    cost = np.zeros(1, np.float64)
    secs = lib.ref_icp_inner(
        np.ascontiguousarray(ps, np.float32),
        np.ascontiguousarray(ns, np.float32),
        np.ascontiguousarray(pt, np.float32),
        np.ascontiguousarray(nt, np.float32),
        M, half,
        np.ascontiguousarray(R, np.float32).reshape(-1),
        np.ascontiguousarray(t, np.float32).reshape(-1),
        iters, H, b, cost)
    return secs, H, b, float(cost[0])


# ---------------------------------------------------------------------------
# Cube-map face + GT-depth frame loops (ref_render_loops.cc): measured
# single-core baselines for the rendering tools (VERDICT r4 missing #2).
# ---------------------------------------------------------------------------

_SRC_RENDER = os.path.join(_HERE, "ref_render_loops.cc")
_lib_render = None
_tried_render = False


def _get_render():
    global _lib_render, _tried_render
    if _lib_render is None and not _tried_render:
        _tried_render = True
        with open(_SRC_RENDER, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.environ.get(
            "DPT_NATIVE_CACHE",
            os.path.join(tempfile.gettempdir(), "dpt_native"))
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"ref_render_{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + ".tmp"
            cmd = (["g++", "-std=c++14"] + REF_FLAGS
                   + ["-shared", "-fPIC", _SRC_RENDER, "-o", tmp])
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError):
                return None
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        lib.ref_cubemap_face.restype = None
        lib.ref_cubemap_face.argtypes = [
            f32p, u8p, ctypes.c_longlong, f64p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, f32p, u8p,
        ]
        lib.ref_gt_depth_frame.restype = None
        lib.ref_gt_depth_frame.argtypes = [
            f32p, i32p, ctypes.c_longlong, f64p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, f32p, ctypes.c_float, f32p,
        ]
        _lib_render = lib
    return _lib_render


def ref_cubemap_face(points, colors, R, fx, fy, cx, cy, width, height):
    """One reference cube-map face render (project + z-buffer + median
    fill-in + color flood). Returns (depth (H,W), color (H,W,3)) or None
    without a compiler. Time the call from outside."""
    lib = _get_render()
    if lib is None:
        return None
    depth = np.zeros((height, width), np.float32)
    color = np.zeros((height, width, 3), np.uint8)
    lib.ref_cubemap_face(
        np.ascontiguousarray(points, np.float32),
        np.ascontiguousarray(colors, np.uint8), len(points),
        np.ascontiguousarray(R, np.float64).reshape(-1),
        fx, fy, cx, cy, width, height, depth, color)
    return depth, color


def ref_gt_depth_frame(points, obs_counts, T34, fx, fy, cx, cy,
                       width, height, occlusion, threshold=0.01):
    """One reference GT-depth frame (>=2-obs trim + occlusion z-test +
    min-z). Returns depth (H,W) or None. Time the call from outside."""
    lib = _get_render()
    if lib is None:
        return None
    depth = np.zeros((height, width), np.float32)
    lib.ref_gt_depth_frame(
        np.ascontiguousarray(points, np.float32),
        np.ascontiguousarray(obs_counts, np.int32), len(points),
        np.ascontiguousarray(T34, np.float64).reshape(-1),
        fx, fy, cx, cy, width, height,
        np.ascontiguousarray(occlusion, np.float32), threshold, depth)
    return depth
