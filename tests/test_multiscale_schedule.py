"""Coarse-to-fine schedule with 3+ image scales (640x480 -> scale_count 3).

The small_offset fixture only exercises 2 pyramid levels; this synthesizes a
larger pair so the multi-level observation gating, per-scale lambda reset,
and NextScale loop run for real.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.ops.splat import (
    fill_color_from_depth,
    flood_fill_colors,
    render_points_depth_color,
)
from dataset_pipeline_tpu.photometric.pair_alignment import align_pair
from dataset_pipeline_tpu.photometric.problem import image_scale_count

RNG = np.random.RandomState(41)


@pytest.mark.slow
def test_three_scale_pair_alignment():
    W, H = 640, 480
    assert image_scale_count(W, H) == 3

    n = 600
    xs = np.linspace(0, 2, n)
    gx, gy = np.meshgrid(xs, xs)
    gz = 0.15 * np.sin(3 * gx) * np.cos(2.5 * gy)
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1).astype(np.float32)
    tex = (128 + 60 * np.sin(7 * gx) * np.cos(9 * gy)
           + 40 * np.sin(21 * gx + 13 * gy)).clip(0, 252)
    cols = np.stack([tex.ravel()] * 3, -1).astype(np.uint8)

    f, cx, cy = 560.0, 319.5, 239.5
    cam = cm.make_camera("PINHOLE", W, H, [f, f, cx, cy])

    def look_at(eye):
        target = np.asarray([1.0, 1.0, 0.0])
        fwd = target - eye
        fwd /= np.linalg.norm(fwd)
        r = np.cross(fwd, [0.0, 1.0, 0.0])
        r /= np.linalg.norm(r)
        d = np.cross(fwd, r)
        R = np.stack([r, d, fwd])
        return R, -R @ eye

    def render(R, t):
        p_cam = pts @ R.T + t
        d, c = render_points_depth_color(jnp.asarray(p_cam), jnp.asarray(cols),
                                         W, H, f, f, cx, cy)
        cf, v = fill_color_from_depth(d, c)
        img = flood_fill_colors(cf, v)
        return np.asarray(img)

    R0, t0 = look_at(np.asarray([1.0, 1.0, -1.6]))
    R1, t1 = look_at(np.asarray([1.12, 0.94, -1.55]))
    img0 = render(R0, t0)
    img1 = render(R1, t1)

    M0 = np.eye(4, dtype=np.float32)
    M0[:3, :3], M0[:3, 3] = R0, t0
    M1 = np.eye(4, dtype=np.float32)
    M1[:3, :3], M1[:3, 3] = R1, t1
    # perturb image 1's init
    w_ = RNG.randn(3) * 0.004
    K = np.asarray([[0, -w_[2], w_[1]], [w_[2], 0, -w_[0]], [-w_[1], w_[0], 0]])
    M1p = M1.copy()
    Rp = (np.eye(3) + K) @ R1
    u, _, vt = np.linalg.svd(Rp)
    M1p[:3, :3] = u @ vt
    M1p[:3, 3] = t1 + RNG.randn(3) * 0.012

    poses, _ = align_pair(cam, pts, cols, img0, img1, M0, M1p,
                          optimize_intrinsics=False, max_iterations_per_scale=25)
    t_est = np.asarray(poses.t[1])
    init_err = np.linalg.norm(M1p[:3, 3] - t1)
    fin_err = np.linalg.norm(t_est - t1)
    print(f"3-scale: init terr {init_err:.4f} -> final {fin_err:.4f}")
    assert fin_err < init_err * 0.5
    assert fin_err < 0.01
