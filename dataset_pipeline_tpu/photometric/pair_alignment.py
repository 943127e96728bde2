"""Two-frame photometric alignment harness.

Counterpart of the reference's ``ProcessOnePair``
(``opt/test/test_alignment_util.cc:123-253``) — the minimal end-to-end slice
of the ImageRegistrator stack:

- depth PNG (uint16 * depth_factor) + RGB image -> colored point cloud in
  frame A (``:135-183``);
- CPU splat occlusion geometry from the same points (``:186-188``);
- a Problem with one pinhole intrinsics and two images at given initial
  poses; multi-scale cloud build, neighbors, fixed descriptors;
- coarse-to-fine optimization; the result is the refined relative pose.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.photometric.multiscale import PointLevel, build_multiscale_cloud
from dataset_pipeline_tpu.photometric.optimizer import PhotometricOptimizer
from dataset_pipeline_tpu.photometric.problem import (
    PhotoProblem,
    build_image_pyramid,
    build_photo_level,
    image_scale_count,
)


@dataclass
class PairFixture:
    """Parsed reference pair fixture (``test_data/small_offset.txt``)."""

    camera: cm.Camera
    depth_factor: float
    image_a: np.ndarray  # (H,W,3) uint8
    depth_a: np.ndarray  # (H,W) uint16
    image_b: np.ndarray
    depth_b: np.ndarray
    a_T_b: np.ndarray  # (4,4) ground truth
    average_scene_depth: float


def load_pair_fixture(path: str) -> PairFixture:
    import os

    from PIL import Image

    base = os.path.dirname(os.path.abspath(path))
    vals = {}
    with open(path) as f:
        for line in f:
            tok = line.split()
            if tok:
                vals[tok[0]] = tok[1:]
    w, h, fx, fy, cx, cy, depth_factor = (float(v) for v in vals["calibration"])
    camera = cm.make_camera("PINHOLE", int(w), int(h), [fx, fy, cx, cy])
    load = lambda key: np.asarray(Image.open(os.path.join(base, vals[key][0])))
    a_T_b = np.eye(4)
    a_T_b[:3, :] = np.asarray([float(v) for v in vals["a_t_b"]]).reshape(3, 4)
    return PairFixture(
        camera, depth_factor,
        load("a_image"), load("a_depth"),
        load("b_image"), load("b_depth"),
        a_T_b, float(vals["average_scene_depth"][0]),
    )


def cloud_from_depth(camera: cm.Camera, depth_u16: np.ndarray, depth_factor: float,
                     image_rgb: np.ndarray, stride: int = 1):
    """Unproject a depth map into a colored cloud (camera frame).

    Per-pixel unprojection is served by the undistortion lookup table
    (``camera_base_impl.h:255-273``) instead of running the 100-iteration GN
    per pixel — the repeated-unprojection path the reference built the LUT
    for."""
    H, W = depth_u16.shape
    ys, xs = np.mgrid[0:H:stride, 0:W:stride]
    d = depth_u16[::stride, ::stride].astype(np.float32) * depth_factor
    valid = d > 0
    xs, ys, d = xs[valid], ys[valid], d[valid]
    pix = jnp.asarray(np.stack([xs, ys], -1), jnp.float32)
    lut = cm.build_undistortion_lut(camera)
    pts = cm.unproject_lut(camera, lut, pix, jnp.asarray(d))
    colors = image_rgb[::stride, ::stride][valid]
    return np.asarray(pts), colors.reshape(-1, image_rgb.shape[-1])[:, :3]


def align_pair(camera: cm.Camera, cloud_points: np.ndarray, cloud_colors: np.ndarray,
               image_a: np.ndarray, image_b: np.ndarray,
               init_a_T_global: np.ndarray, init_b_T_global: np.ndarray,
               splat_radius: Optional[float] = None,
               optimize_intrinsics: bool = False,
               max_iterations_per_scale: int = 50,
               fixed_weight: float = 1.0,
               variable_weight: float = 0.0,
               use_observations_cache: bool = False,
               print_progress: bool = False) -> Tuple[SE3, cm.Camera]:
    """Run the photometric optimizer on a 2-image problem.

    ``cloud_points`` are in the GLOBAL frame; images grayscale or RGB uint8.
    Returns (poses (2,) image_T_global, refined camera).
    """

    def to_gray(img):
        if img.ndim == 3:
            c = img.astype(np.float32)
            return 0.299 * c[..., 0] + 0.587 * c[..., 1] + 0.114 * c[..., 2]
        return img.astype(np.float32)

    H, W = to_gray(image_a).shape
    scale_count = image_scale_count(W, H)
    images = np.stack([to_gray(image_a), to_gray(image_b)])
    pyr = build_image_pyramid(images, scale_count)

    poses_np = np.stack([init_a_T_global, init_b_T_global])
    poses = SE3.from_matrix(jnp.asarray(poses_np, jnp.float32))

    levels_raw = build_multiscale_cloud(
        cloud_points, cloud_colors,
        np.zeros(len(cloud_points), np.uint8),
        poses, camera, scale_count,
    )
    levels = []
    for i, lv in enumerate(levels_raw):
        pl = build_photo_level(lv, seed=i)
        if pl is not None:
            levels.append(pl)
    if not levels:
        raise ValueError("no usable point levels after filtering")

    if splat_radius is None:
        # derived like the reference test: a couple of pixels at scene depth
        splat_radius = float(np.median(cloud_points[:, 2])) * 2.0 / float(camera.fx)

    from dataset_pipeline_tpu.photometric.problem import ImageGroup

    group = ImageGroup(camera=camera, pyramid=pyr, poses=poses,
                       image_ids=[0, 1], min_image_scale=0)
    problem = PhotoProblem(
        groups=[group],
        levels=levels,
        occlusion_points=jnp.asarray(cloud_points, jnp.float32),
        occlusion_radius=splat_radius,
        scale_count=scale_count,
    )
    opt = PhotometricOptimizer(problem, optimize_intrinsics=optimize_intrinsics,
                               fixed_weight=fixed_weight,
                               variable_weight=variable_weight)
    if use_observations_cache:
        # mirror ImageRegistrator: enable compaction after the first scale
        done = {"first": False}

        def _on_scale(o, report):
            if not done["first"]:
                o.build_observations_cache()
            done["first"] = True

        opt.run(max_iterations_per_scale=max_iterations_per_scale,
                print_progress=print_progress, on_scale_done=_on_scale)
    else:
        opt.run(max_iterations_per_scale=max_iterations_per_scale,
                print_progress=print_progress)
    g = opt.p.groups[0]
    return g.poses, g.camera
