"""Multi-resolution point cloud construction.

Counterpart of ``opt/multi_scale_point_cloud.{h,cc}``:

- scans are converted to grayscale intensity (luma 0.299/0.587/0.114,
  ``multi_scale_point_cloud.cc:186-212``) and concatenated with scan indices;
- for every point, the minimum/maximum useful radius is the radius that
  projects to 0.5 px at the finest / coarsest image scale over all images
  that observe the point (``ComputeMinMaxPointRadius``, ``.cc:127-184``);
- octave levels: level radius starts at ``global_min_radius * min_radius_bias``
  and doubles until ``0.99 * global_max_radius``; the active set at each level
  keeps points whose [min_radius, max_radius] interval contains the level
  radius, and close points are merged within
  ``merge_distance_factor * radius`` (``.cc:214-368``).

The merge step (``MergeClosePoints``, ``.cc:44-125``) runs with the
reference's exact greedy semantics in a native C++ uniform-grid kernel
(``native/gridder.cc:greedy_merge``, replacing the PCL KdTree radius
search); a vectorized voxel-grid clustering variant remains available for
the sharded/device path (``merge_close_points_voxel``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3


def intensity_from_rgb(colors: np.ndarray) -> np.ndarray:
    """uint8 RGB (N,3) -> float grayscale in [0,255]."""
    c = colors.astype(np.float32)
    return 0.299 * c[:, 0] + 0.587 * c[:, 1] + 0.114 * c[:, 2]


@dataclass
class PointLevel:
    points: np.ndarray  # (N,3) float32, global frame
    intensities: np.ndarray  # (N,) float32 0..255
    scan_indices: np.ndarray  # (N,) uint8
    radius: float


def compute_min_max_point_radius(points, images_T_global: SE3, camera: cm.Camera,
                                 min_scaling_factor: float,
                                 occlusion_depths: Optional[list] = None,
                                 occlusion_threshold: float = 0.01):
    """Per-point (min_radius, max_radius, observed) over all images.

    ``occlusion_depths``: optional list of (H,W) splat depth maps (one per
    image, full resolution) for the z-test.
    """
    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]
    min_r = np.full(n, np.inf, np.float32)
    max_r = np.full(n, -np.inf, np.float32)
    B = images_T_global.q.shape[0]
    for b in range(B):
        pose = SE3(images_T_global.q[b], images_T_global.t[b])
        p_cam = pose.apply(pts)
        pix, valid = cm.project(camera, p_cam)
        valid = valid & cm.in_image(camera, pix)
        if occlusion_depths is not None:
            od = jnp.asarray(occlusion_depths[b])
            ix = jnp.clip(jnp.round(pix[:, 0]).astype(jnp.int32), 0, od.shape[1] - 1)
            iy = jnp.clip(jnp.round(pix[:, 1]).astype(jnp.int32), 0, od.shape[0] - 1)
            occ = od[iy, ix]
            valid = valid & (p_cam[:, 2] <= occ + occlusion_threshold)
        # pixels per meter at the point: project p + r*(1,0,0), r small
        z = jnp.maximum(p_cam[:, 2], 1e-6)
        eps = 1e-3 * z
        p2 = p_cam + jnp.stack([eps, jnp.zeros_like(eps), jnp.zeros_like(eps)], -1)
        pix2, _ = cm.project(camera, p2)
        px_per_m = jnp.linalg.norm(pix2 - pix, axis=-1) / eps
        r_half_px = 0.5 / jnp.maximum(px_per_m, 1e-12)  # radius giving 0.5 px at scale 0
        v = np.asarray(valid)
        rh = np.asarray(r_half_px)
        min_r[v] = np.minimum(min_r[v], rh[v])
        max_r[v] = np.maximum(max_r[v], rh[v] / min_scaling_factor)
    return min_r, max_r


def merge_close_points(points, intensities, scan_indices, max_radius, merge_distance,
                       num_scans: int):
    """Greedy radius merge with the reference's exact semantics
    (``MergeClosePoints``, ``.cc:44-125``): seeds in input order, positions
    averaged over ALL points within ``merge_distance`` of the seed (already-
    merged neighbors included — the reference only skips done seeds), color
    from the dominant scan only, max_radius = member max. Runs in the native
    C++ grid kernel; falls back to an exact NumPy loop for small inputs and
    to voxel clustering for large inputs without a compiler."""
    from dataset_pipeline_tpu import native

    points = np.ascontiguousarray(points, np.float32)
    res = native.greedy_merge(points, intensities, scan_indices, max_radius,
                              merge_distance, num_scans)
    if res is not None:
        return res
    if len(points) <= 20000:
        return _greedy_merge_numpy(points, intensities, scan_indices,
                                   max_radius, merge_distance, num_scans)
    return merge_close_points_voxel(points, intensities, scan_indices,
                                    max_radius, merge_distance, num_scans)


def _greedy_merge_numpy(points, intensities, scan_indices, max_radius,
                        merge_distance, num_scans):
    """Exact (O(N^2), chunk-free) reference-semantics merge for fallback."""
    n = len(points)
    done = np.zeros(n, bool)
    r2 = merge_distance * merge_distance
    scans = np.asarray(scan_indices, np.int64)
    out_p, out_i, out_s, out_r = [], [], [], []
    for i in range(n):
        if done[i]:
            continue
        d2 = ((points - points[i]) ** 2).sum(1)
        nb = np.flatnonzero(d2 <= r2)
        done[nb] = True
        cnt = np.bincount(scans[nb], minlength=num_scans)
        best = int(cnt.argmax())
        sel = nb[scans[nb] == best]
        out_p.append(points[nb].mean(0))
        out_i.append(float(np.asarray(intensities)[sel].mean()))
        out_s.append(best)
        out_r.append(float(np.asarray(max_radius)[nb].max()))
    return (np.asarray(out_p, np.float32), np.asarray(out_i, np.float32),
            np.asarray(out_s, np.uint8), np.asarray(out_r, np.float32))


def merge_close_points_voxel(points, intensities, scan_indices, max_radius,
                             merge_distance, num_scans: int):
    """Voxel-grid clustering merge (one vectorized segment-mean; used by the
    sharded/device path and as the large-input fallback)."""
    cell = max(merge_distance, 1e-9)
    ijk = np.floor(points / cell).astype(np.int64)
    ijk -= ijk.min(0)
    dims = ijk.max(0) + 1
    cell_id = (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]
    uniq, inverse = np.unique(cell_id, return_inverse=True)
    k = len(uniq)
    counts = np.bincount(inverse, minlength=k)
    pos = np.stack([np.bincount(inverse, points[:, d], k) for d in range(3)], -1)
    pos /= counts[:, None]
    # dominant scan per cell
    scan_counts = np.zeros((k, num_scans), np.int64)
    np.add.at(scan_counts, (inverse, scan_indices.astype(np.int64)), 1)
    dominant = scan_counts.argmax(1).astype(np.uint8)
    # intensity mean over dominant-scan members only
    dom_mask = scan_indices == dominant[inverse]
    int_sum = np.bincount(inverse[dom_mask], intensities[dom_mask], k)
    int_cnt = np.maximum(np.bincount(inverse[dom_mask], minlength=k), 1)
    merged_int = (int_sum / int_cnt).astype(np.float32)
    merged_max_r = np.zeros(k, np.float32)
    np.maximum.at(merged_max_r, inverse, max_radius)
    return pos.astype(np.float32), merged_int, dominant, merged_max_r


def build_multiscale_cloud(points, colors_rgb, scan_indices, images_T_global: SE3,
                           camera: cm.Camera, image_scale_count: int,
                           occlusion_depths=None,
                           min_radius_bias: float = 1.05,
                           merge_distance_factor: float = 4.0,
                           occlusion_threshold: float = 0.01) -> List[PointLevel]:
    """Full octave pyramid (``CreateMultiScalePointCloud``)."""
    points = np.ascontiguousarray(points, np.float32)
    intens = intensity_from_rgb(np.asarray(colors_rgb))
    scan_indices = np.asarray(scan_indices, np.uint8)
    num_scans = int(scan_indices.max()) + 1 if len(scan_indices) else 1
    min_scaling = 2.0 ** (-(image_scale_count - 1))

    min_r, max_r = compute_min_max_point_radius(
        points, images_T_global, camera, min_scaling, occlusion_depths,
        occlusion_threshold,
    )
    observed = np.isfinite(min_r)
    if not observed.any():
        raise ValueError("no point is observed by any image")
    min_val = float(min_r[observed].min())
    max_val = float(max_r[observed].max())

    radius = min_val * min_radius_bias
    levels: List[PointLevel] = []
    # active set: points whose radius range contains the level radius
    while True:
        active = observed & (radius >= min_r) & (radius <= max_r)
        # carry the reference's quirk: min_radius check only on entry; here the
        # vectorized equivalent applies both bounds every level
        if active.any():
            pos, inten, scan, mr = merge_close_points(
                points[active], intens[active], scan_indices[active],
                max_r[active], merge_distance_factor * radius, num_scans,
            )
            levels.append(PointLevel(pos, inten, scan, float(radius)))
        radius *= 2.0
        if radius >= max_val * 0.99:
            break
    if not levels:
        levels.append(PointLevel(points[observed], intens[observed],
                                 scan_indices[observed], float(radius)))
    return levels
