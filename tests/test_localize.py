"""Localize-image PnP tool + label transfer tests.

Mirrors the reference's interactive tools headlessly
(``dataset_inspector/localize_image_tool.cc``,
``dataset_inspector/gui_main_window.cc:868-1054``).
"""

import numpy as np

import jax.numpy as jnp

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.photometric.localize import (
    localize_image,
    transfer_labels,
)
from dataset_pipeline_tpu.photometric.masks import (
    MASK_EVAL_OBS,
    MASK_NONE,
    MASK_OBS,
)

RNG = np.random.RandomState(7)


def _random_pose(rng, rot_scale=0.05, trans_scale=0.05):
    tangent = np.concatenate(
        [trans_scale * rng.randn(3), rot_scale * rng.randn(3)]
    ).astype(np.float32)
    return SE3.exp(jnp.asarray(tangent))


def _pnp_case(model, params, n=30):
    cam = cm.make_camera(model, 640, 480, params)
    gt_pose = SE3.exp(
        jnp.asarray([0.1, -0.05, 0.2, 0.03, -0.02, 0.04], jnp.float32))
    # points in front of the camera, spread over the image
    pts = RNG.rand(n, 3).astype(np.float32)
    pts[:, 0] = (pts[:, 0] - 0.5) * 2.0
    pts[:, 1] = (pts[:, 1] - 0.5) * 1.5
    pts[:, 2] = pts[:, 2] * 2.0 + 2.0
    pts_world = np.asarray(gt_pose.inverse().apply(jnp.asarray(pts)))
    pix, valid = cm.project(cam, jnp.asarray(pts))
    pix, valid = np.asarray(pix), np.asarray(valid)
    return cam, gt_pose, pts_world[valid], pix[valid]


def test_localize_pinhole_recovers_pose():
    cam, gt_pose, pts3d, pix = _pnp_case("PINHOLE",
                                         [500.0, 500.0, 319.5, 239.5])
    init = SE3.exp(jnp.asarray(
        [0.03, -0.02, 0.05, 0.01, 0.02, -0.015], jnp.float32)).compose(gt_pose)
    est = localize_image(cam, pts3d, pix, init)
    err = np.asarray(est.compose(gt_pose.inverse()).log())
    assert np.abs(err).max() < 1e-4, err


def test_localize_fisheye_recovers_pose():
    cam, gt_pose, pts3d, pix = _pnp_case(
        "OPENCV_FISHEYE",
        [400.0, 400.0, 319.5, 239.5, 0.05, -0.01, 0.004, -0.001])
    init = SE3.exp(jnp.asarray(
        [-0.02, 0.04, -0.03, -0.015, 0.01, 0.02], jnp.float32)).compose(gt_pose)
    est = localize_image(cam, pts3d, pix, init)
    err = np.asarray(est.compose(gt_pose.inverse()).log())
    assert np.abs(err).max() < 1e-3, err


def test_localize_requires_six():
    cam = cm.make_camera("PINHOLE", 64, 48, [50.0, 50.0, 31.5, 23.5])
    try:
        localize_image(cam, np.zeros((5, 3)), np.zeros((5, 2)),
                       SE3.identity())
    except ValueError:
        return
    raise AssertionError("expected ValueError for <6 correspondences")


def test_transfer_labels_projects_and_fills():
    cam = cm.make_camera("PINHOLE", 64, 48, [40.0, 40.0, 31.5, 23.5])
    # dense grid of points on the z=2 plane visible in both views
    xs, ys = np.meshgrid(np.linspace(-1.2, 1.2, 60),
                         np.linspace(-0.9, 0.9, 45))
    pts = np.stack([xs, ys, np.full_like(xs, 2.0)], -1).reshape(-1, 3)
    src_pose = SE3.identity()
    tgt_pose = SE3.exp(jnp.asarray([0.05, 0, 0, 0, 0, 0], jnp.float32))

    src_mask = np.zeros((48, 64), np.uint8)
    src_mask[:, :32] = MASK_OBS  # left half of source labeled
    src_mask[:8, :] = MASK_EVAL_OBS
    occ = np.full((48, 64), 10.0, np.float32)  # nothing occluded

    out = transfer_labels(pts, cam, src_pose, src_mask, occ,
                          cam, tgt_pose, occ, transfer_eval_obs=False)
    assert (out == MASK_OBS).sum() > 200  # left region transferred + filled
    assert (out == MASK_EVAL_OBS).sum() == 0  # eval not transferred

    out2 = transfer_labels(pts, cam, src_pose, src_mask, occ,
                           cam, tgt_pose, occ, transfer_eval_obs=True)
    assert (out2 == MASK_EVAL_OBS).sum() > 20

    # merging never downgrades existing kEvalObs
    existing = np.full((48, 64), MASK_EVAL_OBS, np.uint8)
    merged = transfer_labels(pts, cam, src_pose, src_mask, occ,
                             cam, tgt_pose, occ,
                             existing_target_mask=existing)
    assert (merged == MASK_EVAL_OBS).all()


def test_transfer_labels_occlusion_gate():
    cam = cm.make_camera("PINHOLE", 64, 48, [40.0, 40.0, 31.5, 23.5])
    pts = np.asarray([[0.0, 0.0, 2.0]], np.float32)
    src_mask = np.full((48, 64), MASK_OBS, np.uint8)
    free = np.full((48, 64), 10.0, np.float32)
    blocked = np.full((48, 64), 1.0, np.float32)  # occluder at z=1
    out = transfer_labels(pts, cam, SE3.identity(), src_mask, blocked,
                          cam, SE3.identity(), free)
    assert (out == MASK_NONE).all()
    out2 = transfer_labels(pts, cam, SE3.identity(), src_mask, free,
                           cam, SE3.identity(), blocked)
    assert (out2 == MASK_NONE).all()
