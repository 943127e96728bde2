"""Photometric alignment problem state.

Counterpart of ``opt/problem.{h,cc}``: fixed scan geometry (multi-scale point
levels with per-point K-neighbor indices and fixed descriptors), image
pyramids, camera pyramid, per-image poses, and occlusion splat geometry.

Pytree-friendly: all per-level geometry is a dict of stacked device arrays;
images are one (B, H_s, W_s) array per scale. Single shared intrinsics in
this version (multi-intrinsics groups and rigs layer on top).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.ops.knn import knn_bruteforce
from dataset_pipeline_tpu.photometric.multiscale import PointLevel

DEFAULT_NEIGHBOR_COUNT = 5
DEFAULT_NEIGHBOR_CANDIDATES = 25
DEFAULT_MIN_MEAN_INTENSITY_DIFFERENCE = 5.0


def image_scale_count(width: int, height: int, max_initial_image_area: int = 200 * 160) -> int:
    """max(2, 1 + ceil(log4(area / max_initial_area))) (``opt/intrinsics.h:82-86``)."""
    area = width * height
    if area <= max_initial_image_area:
        return 2
    return max(2, 1 + int(np.ceil(np.log(area / max_initial_image_area) / np.log(4.0))))


def build_image_pyramid(images_u8: np.ndarray, scale_count: int) -> List[jnp.ndarray]:
    """(B,H,W) uint8 -> list of (B,H_s,W_s) float32 per scale (0 = full res).

    Halving uses 2x2 box averaging (the reference uses INTER_AREA halving,
    ``opt/image.cc:106-131`` — identical for even sizes).
    """
    img = jnp.asarray(images_u8, jnp.float32)
    pyr = [img]
    for _ in range(1, scale_count):
        b, h, w = pyr[-1].shape
        h2, w2 = h // 2, w // 2
        cropped = pyr[-1][:, : h2 * 2, : w2 * 2]
        down = cropped.reshape(b, h2, 2, w2, 2).mean((2, 4))
        pyr.append(down)
    return pyr


@dataclass
class PhotoLevel:
    """One point scale uploaded to device, with neighbors and descriptors."""

    points: jnp.ndarray  # (N,3)
    intensities: jnp.ndarray  # (N,)
    scan_indices: jnp.ndarray  # (N,)
    neighbors: jnp.ndarray  # (N,K) indices into this level
    fixed_descriptors: jnp.ndarray  # (N,K) neighbor minus center scan intensity
    radius: float


@dataclass
class ImageGroup:
    """All images sharing one intrinsics (one reference ``Intrinsics`` entry).

    ``min_image_scale`` is the GLOBAL scale index of this group's finest
    pyramid level (``opt/problem.cc:488-491``: larger cameras have deeper
    pyramids; smaller cameras start at a coarser global scale).
    """

    camera: cm.Camera  # camera of the group's finest level
    pyramid: List[jnp.ndarray]  # per group level (B,H_l,W_l) float32
    poses: SE3  # (B,) image_T_global (DERIVED for rig-dependent groups)
    image_ids: List[int]
    min_image_scale: int = 0
    # rig role (``opt/rig.h``): a group whose camera is a non-reference rig
    # camera has its poses derived as image_T_rig . ref_pose
    rig_id: int = -1
    rig_cam_index: int = 0
    ref_group: int = -1  # index of the reference camera's group
    ref_slots: Optional[np.ndarray] = None  # per image: index into ref group
    # optional observation masks (photometric/masks.py), per scale (B,H_s,W_s)
    mask_pyramid: Optional[List[jnp.ndarray]] = None

    @property
    def num_images(self) -> int:
        return int(self.poses.q.shape[0])

    @property
    def level_count(self) -> int:
        return len(self.pyramid)


@dataclass
class PhotoProblem:
    groups: List[ImageGroup]
    levels: List["PhotoLevel"]
    occlusion_points: jnp.ndarray  # (M,3) splat points (global frame)
    occlusion_radius: float  # splat world radius
    scale_count: int  # global image scale count
    rig_extrinsics: List[SE3] = field(default_factory=list)  # per rig: (ncams,) image_T_rig
    occlusion_mesh: Optional[object] = None  # ops.mesh_raster.OcclusionMesh
    # fixed per-image depth maps for the optional inverse-depth residual:
    # per group, per group scale, (B,H_s,W_s); build with build_image_pyramid
    depth_map_pyramids: Optional[List[List[jnp.ndarray]]] = None
    max_valid_intensity: float = 252.0
    occlusion_depth_threshold: float = 0.01

    @property
    def num_images(self) -> int:
        return sum(g.num_images for g in self.groups)


BRUTEFORCE_NEIGHBOR_LIMIT = 200_000


def _neighbor_candidates(points: np.ndarray, cand: int) -> np.ndarray:
    """(N, cand) nearest-neighbor candidate indices (self excluded), -1 for
    missing slots. Production-scale levels use the native threaded grid-kNN
    (exact expanding-ring search, ``native/gridder.cc:grid_knn`` — the host
    counterpart of the reference's PCL KdTree, ``opt/problem.cc:706-786``);
    small levels use the tiled MXU brute force. ``knn_adaptive`` is the
    device-only fallback when no compiler is available."""
    n = len(points)
    pts_np = np.ascontiguousarray(points, np.float32)
    if n > BRUTEFORCE_NEIGHBOR_LIMIT:
        from dataset_pipeline_tpu import native

        out = native.grid_knn(pts_np, pts_np, min(cand, n - 1), skip_self=True)
        if out is not None:
            return out[1]
        from dataset_pipeline_tpu.ops.knn import knn_adaptive

        _, idx = knn_adaptive(pts_np, pts_np, min(cand + 1, n), chunk=4096)
        idx = np.asarray(idx)
    else:
        _, idx = knn_bruteforce(jnp.asarray(pts_np), jnp.asarray(pts_np),
                                min(cand + 1, n))
        idx = np.asarray(idx)
    # drop self matches (first column in the exact case; anywhere for grid)
    self_col = idx == np.arange(n)[:, None]
    idx = np.where(self_col, -1, idx)
    # stable-compact each row so valid candidates lead
    order = np.argsort(idx < 0, axis=1, kind="stable")
    idx = np.take_along_axis(idx, order, axis=1)
    return idx[:, :cand]


def determine_point_neighbors(points: np.ndarray, scan_indices: np.ndarray,
                              k: int = DEFAULT_NEIGHBOR_COUNT,
                              num_candidates: int = DEFAULT_NEIGHBOR_CANDIDATES,
                              same_scan_only: bool = True,
                              seed: int = 0) -> np.ndarray:
    """K seeded-random picks from the nearest ``num_candidates`` neighbors.

    Mirrors ``Problem::DeterminePointNeighbors`` (``opt/problem.cc:706-786``):
    seeded RNG, candidates restricted to the same scan when fixed (scan)
    colors are in use. Fully vectorized: each row draws k candidates without
    replacement by ranking uniform random keys, with cross-scan candidates
    pushed behind same-scan ones whenever >=k same-scan candidates exist.
    """
    n = len(points)
    idx = _neighbor_candidates(np.asarray(points), num_candidates)
    scan = np.asarray(scan_indices)
    valid = idx >= 0
    safe = np.maximum(idx, 0)
    same = (scan[safe] == scan[:, None]) & valid

    rng = np.random.RandomState(seed)
    keys = rng.rand(n, idx.shape[1])
    # invalid slots sort last; when the same-scan restriction applies,
    # cross-scan candidates sort after every same-scan one
    keys = np.where(valid, keys, np.inf)
    if same_scan_only:
        enough_same = same.sum(1) >= k
        keys = keys + np.where(enough_same[:, None] & valid & ~same, 2.0, 0.0)

    order = np.argsort(keys, axis=1, kind="stable")[:, :k]
    out = np.take_along_axis(safe, order, axis=1).astype(np.int32)
    picked_invalid = np.take_along_axis(~valid, order, axis=1)
    # rows with fewer than k candidates: repeat the first pick (edge-pad)
    out = np.where(picked_invalid, out[:, :1], out)
    return out


def gradient_filter_mask(intensities: np.ndarray, neighbors: np.ndarray,
                         min_mean_diff: float = DEFAULT_MIN_MEAN_INTENSITY_DIFFERENCE,
                         dilate: bool = True):
    """Keep points whose mean |descriptor| is at least ``min_mean_diff``
    (the reference's gradient-magnitude filter, ``opt/problem.cc:251-312``).

    Pass 2 (``dilate``, ``opt/problem.cc:282-293``): every K-neighbor of a
    kept point is also kept — this dilates the kept regions slightly, giving
    the optimizer a larger convergence basin around intensity edges.
    """
    d = intensities[neighbors] - intensities[:, None]
    keep = np.abs(d).mean(1) >= min_mean_diff
    if not dilate:
        return keep
    dilated = keep.copy()
    dilated[neighbors[keep].ravel()] = True
    return dilated


def build_photo_level(level: PointLevel, k: int = DEFAULT_NEIGHBOR_COUNT,
                      apply_gradient_filter: bool = True, seed: int = 0,
                      num_candidates: int = DEFAULT_NEIGHBOR_CANDIDATES,
                      min_mean_diff: float = DEFAULT_MIN_MEAN_INTENSITY_DIFFERENCE,
                      ) -> Optional[PhotoLevel]:
    pts = level.points
    inten = level.intensities
    scans = level.scan_indices
    if len(pts) <= k + 1:
        return None
    neighbors = determine_point_neighbors(pts, scans, k=k,
                                          num_candidates=num_candidates, seed=seed)
    if apply_gradient_filter:
        keep = gradient_filter_mask(inten, neighbors, min_mean_diff)
        if keep.sum() < k + 1:
            return None
        # restrict to kept points; remap neighbors by re-picking among kept
        pts, inten, scans = pts[keep], inten[keep], scans[keep]
        neighbors = determine_point_neighbors(pts, scans, k=k,
                                              num_candidates=num_candidates,
                                              seed=seed + 1)
    desc = inten[neighbors] - inten[:, None]
    return PhotoLevel(
        jnp.asarray(pts), jnp.asarray(inten), jnp.asarray(scans),
        jnp.asarray(neighbors), jnp.asarray(desc.astype(np.float32)), level.radius,
    )
