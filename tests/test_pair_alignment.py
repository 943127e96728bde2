"""End-to-end two-frame photometric alignment on the reference fixture.

Mirrors ``opt/test/test_alignment.cc:50-84``: run the full optimizer on the
``small_offset`` RGB-D pair and require translation error / average scene
depth <= 1e-2 and rotation error <= 1 degree.
"""

import os

import numpy as np
import pytest

from dataset_pipeline_tpu.photometric.pair_alignment import (
    align_pair,
    cloud_from_depth,
    load_pair_fixture,
)

FIXTURE = "/root/reference/test_data/small_offset.txt"


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference fixture not present")
def test_small_offset_pair():
    fx = load_pair_fixture(FIXTURE)
    pts, colors = cloud_from_depth(fx.camera, fx.depth_a, fx.depth_factor, fx.image_a)

    # global frame = frame A; both images start at identity (the reference
    # initializes b at identity too and lets the optimizer find a_T_b)
    init = np.eye(4, dtype=np.float32)
    poses, _ = align_pair(
        fx.camera, pts, colors, fx.image_a, fx.image_b,
        init, init, optimize_intrinsics=False, print_progress=True,
    )

    # estimated a_T_b = pose_a^-1 . pose_b ... poses are image_T_global with
    # global = A: a_T_global ~ I, b_T_global = b_T_a => a_T_b = (b_T_global)^-1
    q = np.asarray(poses.q)
    t = np.asarray(poses.t)
    from dataset_pipeline_tpu.models.lie import SE3
    import jax.numpy as jnp

    pose_a = SE3(jnp.asarray(q[0]), jnp.asarray(t[0]))
    pose_b = SE3(jnp.asarray(q[1]), jnp.asarray(t[1]))
    a_T_b_est = np.asarray(pose_a.compose(pose_b.inverse()).matrix())

    gt = fx.a_T_b
    t_err = np.linalg.norm(a_T_b_est[:3, 3] - gt[:3, 3])
    rel = a_T_b_est[:3, :3] @ gt[:3, :3].T
    r_err_deg = np.rad2deg(np.arccos(np.clip((np.trace(rel) - 1) / 2, -1, 1)))
    print(f"translation err {t_err:.5f} (bound {1e-2 * fx.average_scene_depth:.5f}), "
          f"rotation err {r_err_deg:.4f} deg")
    assert t_err / fx.average_scene_depth <= 1e-2
    assert r_err_deg <= 1.0


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference fixture not present")
def test_small_offset_pair_with_variable_colors():
    """Reference default config: fixed AND variable color residuals both
    active (``opt/parameters.h:50-51``); same accuracy bounds must hold."""
    import jax.numpy as jnp

    from dataset_pipeline_tpu.models.lie import SE3

    fx = load_pair_fixture(FIXTURE)
    pts, colors = cloud_from_depth(fx.camera, fx.depth_a, fx.depth_factor, fx.image_a)
    init = np.eye(4, dtype=np.float32)
    poses, _ = align_pair(
        fx.camera, pts, colors, fx.image_a, fx.image_b, init, init,
        optimize_intrinsics=False, fixed_weight=1.0, variable_weight=1.0,
    )
    pose_a = SE3(jnp.asarray(poses.q[0]), jnp.asarray(poses.t[0]))
    pose_b = SE3(jnp.asarray(poses.q[1]), jnp.asarray(poses.t[1]))
    a_T_b_est = np.asarray(pose_a.compose(pose_b.inverse()).matrix())
    gt = fx.a_T_b
    t_err = np.linalg.norm(a_T_b_est[:3, 3] - gt[:3, 3])
    rel = a_T_b_est[:3, :3] @ gt[:3, :3].T
    r_err_deg = np.rad2deg(np.arccos(np.clip((np.trace(rel) - 1) / 2, -1, 1)))
    print(f"[variable colors] t_err {t_err:.5f}, r_err {r_err_deg:.4f} deg")
    assert t_err / fx.average_scene_depth <= 1e-2
    assert r_err_deg <= 1.0
