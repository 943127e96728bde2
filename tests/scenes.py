"""Shared synthetic scene builders for tests (not collected by pytest)."""

import numpy as np

import jax.numpy as jnp

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.ops.splat import (
    fill_color_from_depth,
    flood_fill_colors,
    render_points_depth_color,
)
from dataset_pipeline_tpu.photometric.multiscale import build_multiscale_cloud
from dataset_pipeline_tpu.photometric.problem import (
    ImageGroup,
    PhotoProblem,
    build_image_pyramid,
    build_photo_level,
)


def synthetic_two_frame_problem():
    """Small rendered scene: textured height field seen from two poses."""
    W, H = 160, 120
    rng = np.random.RandomState(11)
    n = 120
    xs = np.linspace(0, 2, n)
    gx, gy = np.meshgrid(xs, xs)
    gz = 0.1 * np.sin(3 * gx) * np.cos(2.5 * gy)
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1).astype(np.float32)
    tex = (128 + 60 * np.sin(7 * gx) * np.cos(9 * gy)).clip(0, 252)
    cols = np.stack([tex.ravel()] * 3, -1).astype(np.uint8)
    f, cx, cy = 140.0, 79.5, 59.5
    cam = cm.make_camera("PINHOLE", W, H, [f, f, cx, cy])

    def look_at(eye):
        target = np.asarray([1.0, 1.0, 0.0])
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        r = np.cross(fwd, [0.0, 1.0, 0.0])
        r = r / np.linalg.norm(r)
        d = np.cross(fwd, r)
        R = np.stack([r, d, fwd])
        return R, -R @ eye

    mats, imgs = [], []
    for eye in ([1.0, 1.0, -2.2], [1.25, 1.05, -2.15]):
        R, t = look_at(np.asarray(eye))
        p_cam = pts @ R.T + t
        d, c = render_points_depth_color(jnp.asarray(p_cam), jnp.asarray(cols),
                                         W, H, f, f, cx, cy)
        cf, v = fill_color_from_depth(d, c)
        img = np.asarray(flood_fill_colors(cf, v))[..., 0]
        m = np.eye(4, dtype=np.float32)
        m[:3, :3], m[:3, 3] = R, t
        mats.append(m)
        imgs.append(img)

    poses = SE3.from_matrix(jnp.asarray(np.stack(mats), jnp.float32))
    scale_count = 2
    pyr = build_image_pyramid(np.stack(imgs), scale_count)
    levels_raw = build_multiscale_cloud(pts, cols, np.zeros(len(pts), np.uint8),
                                        poses, cam, scale_count)
    levels = [pl for i, lv in enumerate(levels_raw)
              if (pl := build_photo_level(lv, seed=i)) is not None]
    group = ImageGroup(camera=cam, pyramid=pyr, poses=poses, image_ids=[0, 1])
    problem = PhotoProblem(
        groups=[group], levels=levels,
        occlusion_points=jnp.asarray(pts), occlusion_radius=0.03,
        scale_count=scale_count,
    )
    return problem
