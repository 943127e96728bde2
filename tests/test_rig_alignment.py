"""Rig assignment and 4-frame rig alignment test (2 cameras x 2 sets).

Mirrors the reference's synthetic rig test (``opt/test/test_alignment.cc:87-545``,
rig variants): images rendered from known geometry, poses perturbed, the
optimizer must recover consistent rig extrinsics and set poses.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dataset_pipeline_tpu.io.colmap import ColmapRig, ColmapRigCamera
from dataset_pipeline_tpu.io.state import ImageState, ModelState
from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3, quat_from_matrix, quat_to_matrix
from dataset_pipeline_tpu.ops.splat import (
    fill_color_from_depth,
    flood_fill_colors,
    render_points_depth_color,
)
from dataset_pipeline_tpu.photometric.multiscale import build_multiscale_cloud
from dataset_pipeline_tpu.photometric.optimizer import PhotometricOptimizer
from dataset_pipeline_tpu.photometric.problem import (
    ImageGroup,
    PhotoProblem,
    build_image_pyramid,
    build_photo_level,
    image_scale_count,
)
from dataset_pipeline_tpu.photometric.rig import assign_rigs, rig_extrinsics_se3

RNG = np.random.RandomState(21)


def _quat(R):
    return np.asarray(quat_from_matrix(jnp.asarray(R, jnp.float32)), np.float64)


def _look_at(eye, target, up=np.asarray([0.0, 1.0, 0.0])):
    f = target - eye
    f /= np.linalg.norm(f)
    r = np.cross(f, up)
    r /= np.linalg.norm(r)
    d = np.cross(f, r)
    R = np.stack([r, d, f])
    return R, -R @ eye


def test_assign_rigs_consistency():
    # known extrinsics: cam1 = 10cm right of cam0
    R_e = np.eye(3)
    t_e = np.asarray([-0.1, 0.0, 0.0])  # cam1_T_cam0 translation
    sets = []
    images = []
    iid = 1
    for si in range(3):
        R0, t0 = _look_at(np.asarray([si * 0.2, 0.0, -2.0]), np.zeros(3))
        # cam0 (reference)
        images.append(ImageState(iid, 1, f"cam0/{si}.png", _quat(R0), t0 + RNG.randn(3) * 1e-3))
        iid += 1
        # cam1: image_T_global = extr . ref
        R1 = R_e @ R0
        t1 = R_e @ t0 + t_e
        images.append(ImageState(iid, 2, f"cam1/{si}.png", _quat(R1), t1 + RNG.randn(3) * 1e-3))
        iid += 1
    state = ModelState({}, images, 1.0)
    rigs = assign_rigs(state, [ColmapRig(1, [ColmapRigCamera(1, "cam0"),
                                             ColmapRigCamera(2, "cam1")])])
    assert len(rigs) == 1
    rig = rigs[0]
    assert len(rig.sets) == 3
    # extrinsics recovered within noise
    np.testing.assert_allclose(rig.image_T_rig[1][:3, 3], t_e, atol=5e-3)
    np.testing.assert_allclose(rig.image_T_rig[1][:3, :3], R_e, atol=5e-3)
    # back-assigned poses consistent: image_T_global(cam1) == extr . image_T_global(cam0)
    by_id = {im.image_id: im for im in state.images}
    for s in rig.sets:
        im0, im1 = by_id[s.image_ids[0]], by_id[s.image_ids[1]]
        R0 = np.asarray(quat_to_matrix(jnp.asarray(im0.qvec, jnp.float32)))
        R1 = np.asarray(quat_to_matrix(jnp.asarray(im1.qvec, jnp.float32)))
        np.testing.assert_allclose(R1, rig.image_T_rig[1][:3, :3] @ R0, atol=1e-5)
        np.testing.assert_allclose(
            im1.tvec, rig.image_T_rig[1][:3, :3] @ im0.tvec + rig.image_T_rig[1][:3, 3],
            atol=1e-5,
        )


def _render_image(pts, cols, R, t, W, H, f, cx, cy):
    p_cam = pts @ R.T + t
    d, c = render_points_depth_color(jnp.asarray(p_cam), jnp.asarray(cols),
                                     W, H, f, f, cx, cy)
    cf, v = fill_color_from_depth(d, c)
    img = flood_fill_colors(cf, v)
    gray = np.asarray(img).astype(np.float32).mean(-1)
    return gray


@pytest.mark.slow
def test_rig_four_frame_alignment():
    # textured wavy surface
    n = 300
    xs = np.linspace(0, 2, n)
    gx, gy = np.meshgrid(xs, xs)
    gz = 0.12 * np.sin(3 * gx) * np.cos(2.5 * gy)
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1).astype(np.float32)
    tex = (128 + 60 * np.sin(7 * gx) * np.cos(9 * gy) + 40 * np.sin(23 * gx + 13 * gy)).clip(0, 252)
    cols = np.stack([tex.ravel()] * 3, -1).astype(np.uint8)

    W, H = 200, 150
    f, cx, cy = 180.0, 99.5, 74.5
    cam = cm.make_camera("PINHOLE", W, H, [f, f, cx, cy])

    # GT: rig extrinsics cam1 = small baseline; 2 sets
    extr_R = np.eye(3)
    extr_t = np.asarray([-0.08, 0.0, 0.0])
    set_eyes = [np.asarray([0.9, 1.0, -1.4]), np.asarray([1.15, 1.05, -1.35])]

    gt_ref_poses = []
    images0, images1 = [], []
    for eye in set_eyes:
        R0, t0 = _look_at(eye, np.asarray([1.0, 1.0, 0.0]))
        gt_ref_poses.append((R0, t0))
        images0.append(_render_image(pts, cols, R0, t0, W, H, f, cx, cy))
        R1 = extr_R @ R0
        t1 = extr_R @ t0 + extr_t
        images1.append(_render_image(pts, cols, R1, t1, W, H, f, cx, cy))

    # perturbed initialization
    def perturb(R, t, rot_scale, t_scale, rng):
        w = rng.randn(3) * rot_scale
        K = np.asarray([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        Rp = (np.eye(3) + K) @ R
        u, _, vt = np.linalg.svd(Rp)
        return u @ vt, t + rng.randn(3) * t_scale

    rng = np.random.RandomState(3)
    scale_count = image_scale_count(W, H)
    pyr0 = build_image_pyramid(np.stack(images0), scale_count)
    pyr1 = build_image_pyramid(np.stack(images1), scale_count)

    init_ref = [perturb(R, t, 0.003, 0.008, rng) for R, t in gt_ref_poses]
    init_eR, init_et = perturb(extr_R, extr_t, 0.002, 0.005, rng)

    def se3_stack(poses):
        mats = []
        for R, t in poses:
            M = np.eye(4)
            M[:3, :3] = R
            M[:3, 3] = t
            mats.append(M)
        return SE3.from_matrix(jnp.asarray(np.stack(mats), jnp.float32))

    ref_poses = se3_stack(init_ref)
    extr_M = np.eye(4)
    extr_M[:3, :3] = init_eR
    extr_M[:3, 3] = init_et
    extr = SE3.from_matrix(jnp.asarray(np.stack([np.eye(4), extr_M]), jnp.float32))

    group0 = ImageGroup(camera=cam, pyramid=pyr0, poses=ref_poses,
                        image_ids=[1, 3], min_image_scale=0,
                        rig_id=0, rig_cam_index=0)
    group1 = ImageGroup(camera=cam, pyramid=pyr1, poses=ref_poses,  # overwritten by sync
                        image_ids=[2, 4], min_image_scale=0,
                        rig_id=0, rig_cam_index=1, ref_group=0,
                        ref_slots=np.asarray([0, 1]))

    all_poses = SE3(
        jnp.concatenate([ref_poses.q, ref_poses.q]),
        jnp.concatenate([ref_poses.t, ref_poses.t]),
    )
    levels_raw = build_multiscale_cloud(
        pts, cols, np.zeros(len(pts), np.uint8), all_poses, cam, scale_count)
    levels = [pl for i, lv in enumerate(levels_raw)
              if (pl := build_photo_level(lv, seed=i)) is not None]

    problem = PhotoProblem(
        groups=[group0, group1], levels=levels,
        occlusion_points=jnp.asarray(pts), occlusion_radius=0.008,
        scale_count=scale_count, rig_extrinsics=[extr],
    )
    opt = PhotometricOptimizer(problem, optimize_intrinsics=False)
    opt.run(max_iterations_per_scale=30)

    # check extrinsics recovery
    e = opt.p.rig_extrinsics[0]
    t_est = np.asarray(e.t[1])
    terr_extr = np.linalg.norm(t_est - extr_t)
    # check ref pose recovery
    max_terr = 0.0
    for i, (R, t) in enumerate(gt_ref_poses):
        t_est_i = np.asarray(opt.p.groups[0].poses.t[i])
        max_terr = max(max_terr, np.linalg.norm(t_est_i - t))
    init_err = max(np.linalg.norm(init_ref[i][1] - gt_ref_poses[i][1]) for i in range(2))
    print(f"extr terr {terr_extr:.5f}, ref max terr {max_terr:.5f} (init {init_err:.5f})")
    assert terr_extr < 0.01
    assert max_terr < init_err * 0.6  # clearly improved
