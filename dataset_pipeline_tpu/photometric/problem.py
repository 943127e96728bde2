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


def determine_point_neighbors(points: np.ndarray, scan_indices: np.ndarray,
                              k: int = DEFAULT_NEIGHBOR_COUNT,
                              num_candidates: int = DEFAULT_NEIGHBOR_CANDIDATES,
                              same_scan_only: bool = True,
                              seed: int = 0) -> np.ndarray:
    """K random picks from the nearest ``num_candidates`` neighbors.

    Mirrors ``Problem::DeterminePointNeighbors`` (``opt/problem.cc:706-786``):
    seeded RNG, candidates restricted to the same scan when fixed (scan)
    colors are in use.
    """
    n = len(points)
    cand = min(num_candidates + 1, n)
    _, idx = knn_bruteforce(jnp.asarray(points), jnp.asarray(points), cand)
    idx = np.asarray(idx)[:, 1:]  # drop self
    rng = np.random.RandomState(seed)
    out = np.zeros((n, k), np.int32)
    scan = np.asarray(scan_indices)
    for i in range(n):
        cands = idx[i]
        if same_scan_only:
            same = cands[scan[cands] == scan[i]]
            if len(same) >= k:
                cands = same
        if len(cands) >= k:
            out[i] = rng.choice(cands, size=k, replace=False)
        else:
            out[i] = np.pad(cands, (0, k - len(cands)), mode="edge")
    return out


def gradient_filter_mask(intensities: np.ndarray, neighbors: np.ndarray,
                         min_mean_diff: float = DEFAULT_MIN_MEAN_INTENSITY_DIFFERENCE):
    """Keep points whose mean |descriptor| is at least ``min_mean_diff``
    (the reference's gradient-magnitude filter, ``opt/problem.cc:251-312``)."""
    d = intensities[neighbors] - intensities[:, None]
    return np.abs(d).mean(1) >= min_mean_diff


def build_photo_level(level: PointLevel, k: int = DEFAULT_NEIGHBOR_COUNT,
                      apply_gradient_filter: bool = True, seed: int = 0) -> Optional[PhotoLevel]:
    pts = level.points
    inten = level.intensities
    scans = level.scan_indices
    if len(pts) <= k + 1:
        return None
    neighbors = determine_point_neighbors(pts, scans, k=k, seed=seed)
    if apply_gradient_filter:
        keep = gradient_filter_mask(inten, neighbors)
        if keep.sum() < k + 1:
            return None
        # restrict to kept points; remap neighbors by re-picking among kept
        pts, inten, scans = pts[keep], inten[keep], scans[keep]
        neighbors = determine_point_neighbors(pts, scans, k=k, seed=seed + 1)
    desc = inten[neighbors] - inten[:, None]
    return PhotoLevel(
        jnp.asarray(pts), jnp.asarray(inten), jnp.asarray(scans),
        jnp.asarray(neighbors), jnp.asarray(desc.astype(np.float32)), level.radius,
    )
