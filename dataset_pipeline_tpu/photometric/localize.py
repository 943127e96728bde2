"""Manual localization + label transfer (headless DatasetInspector tools).

Counterparts of the reference's interactive tools:

- :func:`localize_image` — the "Localize image" tool
  (``dataset_inspector/localize_image_tool.cc:47-88,136-155``): given >=6
  clicked 2D-3D correspondences, refine the image pose nonlinearly. The
  reference converts pixels to normalized bearing vectors and calls OpenGV's
  ``absolute_pose::optimize_nonlinear``; here the same bearing-vector
  objective is minimized by Levenberg-Marquardt with autodiff Jacobians,
  supporting every camera model (undistortion via the fixed-iteration GN of
  ``models/cameras.py``).
- :func:`transfer_labels` — the "Label transfer" button
  (``dataset_inspector/gui_main_window.cc:868-1054``): project all scan
  points into the source image, read its mask value where the point is
  visible (occlusion z-test with slack) and masked, write that value at the
  point's pixel in the target image if also visible there, then fill holes
  with a 5x5 integral-image window at a 10% occupancy threshold and merge
  into the existing target mask (never downgrading kEvalObs).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.photometric.masks import (
    MASK_EVAL_OBS,
    MASK_NONE,
    MASK_OBS,
)


def bearing_vectors(camera: cm.Camera, pixels) -> jnp.ndarray:
    """Pixels -> unit bearing vectors in the camera frame
    (``localize_image_tool.cc:58-62``: ImageToNormalized then normalize)."""
    n = cm.image_to_normalized(camera, jnp.asarray(pixels, jnp.float32))
    b = jnp.concatenate([n, jnp.ones(n.shape[:-1] + (1,), n.dtype)], -1)
    return b / jnp.linalg.norm(b, axis=-1, keepdims=True)


def localize_image(
    camera: cm.Camera,
    points3d,
    pixels,
    init_image_T_global: SE3,
    max_iters: int = 50,
    init_lambda: float = 1e-4,
) -> SE3:
    """Nonlinear absolute-pose refinement from 2D-3D correspondences.

    Residual per correspondence: measured unit bearing (from the clicked
    pixel) minus predicted unit bearing of the transformed 3D point —
    OpenGV ``optimize_nonlinear``'s objective. LM on the 6-dof tangent
    delta applied multiplicatively (``exp(delta) . T``), like every pose
    update in this framework. Needs >=6 correspondences
    (``localize_image_tool.cc:138-141``).
    """
    points3d = jnp.asarray(points3d, jnp.float32)
    if points3d.shape[0] < 6:
        raise ValueError(
            f"need at least 6 correspondences, got {points3d.shape[0]}")
    b_meas = bearing_vectors(camera, pixels)

    q0, t0 = init_image_T_global.q, init_image_T_global.t

    def residuals(delta, q, t):
        pose = SE3.exp(delta).compose(SE3(q, t))
        p_cam = pose.apply(points3d)
        norm = jnp.linalg.norm(p_cam, axis=-1, keepdims=True)
        b_pred = p_cam / jnp.maximum(norm, 1e-12)
        return (b_meas - b_pred).reshape(-1)

    @jax.jit
    def lm_quantities(q, t):
        zero = jnp.zeros(6, jnp.float32)
        r = residuals(zero, q, t)
        J = jax.jacfwd(residuals)(zero, q, t)
        # Gram products at HIGHEST precision: on TPU the default would hit
        # the MXU in bf16 (~1e-2 error), degrading the PnP refinement.
        H = jax.lax.dot_general(
            J, J, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        g = jax.lax.dot_general(
            J, r[:, None], (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )[:, 0]
        return H, g, jnp.sum(r * r)

    @jax.jit
    def apply_delta(x, q, t):
        pose = SE3.exp(-x).compose(SE3(q, t))
        return pose.q, pose.t

    @jax.jit
    def cost_of(q, t):
        r = residuals(jnp.zeros(6, jnp.float32), q, t)
        return jnp.sum(r * r)

    q, t = q0, t0
    lam = init_lambda
    H, g, cost = lm_quantities(q, t)
    cost = float(cost)
    for _ in range(max_iters):
        H_lm = np.asarray(H, np.float64)
        H_lm[np.diag_indices(6)] *= 1.0 + lam
        try:
            x = np.linalg.solve(H_lm, np.asarray(g, np.float64))
        except np.linalg.LinAlgError:
            lam *= 2.0
            continue
        q_new, t_new = apply_delta(jnp.asarray(x, jnp.float32), q, t)
        new_cost = float(cost_of(q_new, t_new))
        if new_cost < cost:
            q, t = q_new, t_new
            improvement = cost - new_cost
            cost = new_cost
            lam = max(lam * 0.5, 1e-10)
            H, g, _ = lm_quantities(q, t)
            if improvement < 1e-14:
                break
        else:
            lam *= 2.0
            if lam > 1e8:
                break
    return SE3(q, t)


def _project_nearest(camera: cm.Camera, pose: SE3, points) -> tuple:
    """Project points, return (ix, iy, z, valid-in-image) with the
    reference's nearest-pixel convention ``int(x + 0.5)``
    (``gui_main_window.cc:911-921``)."""
    p_cam = pose.apply(points)
    pix, valid = cm.project(camera, p_cam)
    pix = np.asarray(pix)
    z = np.asarray(p_cam[..., 2])
    ix = np.floor(pix[..., 0] + 0.5).astype(np.int64)
    iy = np.floor(pix[..., 1] + 0.5).astype(np.int64)
    ok = (
        np.asarray(valid)
        & (pix[..., 0] + 0.5 >= 0)
        & (pix[..., 1] + 0.5 >= 0)
        & (ix >= 0)
        & (iy >= 0)
        & (ix < camera.width)
        & (iy < camera.height)
    )
    return ix, iy, z, ok


def _box_count_fill(mask: np.ndarray, value: int, radius: int,
                    threshold: int) -> np.ndarray:
    """Pixels whose (2r+1)^2 window contains >= threshold pixels == value
    (integral-image hole filling, ``gui_main_window.cc:957-1032``)."""
    hit = (mask == value).astype(np.int64)
    ii = hit.cumsum(0).cumsum(1)
    ii = np.pad(ii, ((1, 0), (1, 0)))
    h, w = mask.shape
    y0 = np.clip(np.arange(h) - radius, 0, h)
    y1 = np.clip(np.arange(h) + radius + 1, 0, h)
    x0 = np.clip(np.arange(w) - radius, 0, w)
    x1 = np.clip(np.arange(w) + radius + 1, 0, w)
    counts = (
        ii[y1[:, None], x1[None, :]]
        - ii[y0[:, None], x1[None, :]]
        - ii[y1[:, None], x0[None, :]]
        + ii[y0[:, None], x0[None, :]]
    )
    return counts >= threshold


def transfer_labels(
    points,
    source_camera: cm.Camera,
    source_pose: SE3,
    source_mask: np.ndarray,
    source_occlusion: np.ndarray,
    target_camera: cm.Camera,
    target_pose: SE3,
    target_occlusion: np.ndarray,
    existing_target_mask: Optional[np.ndarray] = None,
    transfer_eval_obs: bool = False,
    occlusion_depth_threshold: float = 0.01,
) -> np.ndarray:
    """Transfer obs/eval-obs mask labels from a source to a target image
    through the scan geometry (``gui_main_window.cc:868-1054``).

    ``*_occlusion`` are depth maps at the same resolution as the masks
    (render with ``ops.splat``/``ops.mesh_raster``). Returns the merged
    target mask (uint8 of MASK_* flags).
    """
    points = jnp.asarray(points, jnp.float32)
    sx, sy, sz, s_ok = _project_nearest(source_camera, source_pose, points)
    tx, ty, tz, t_ok = _project_nearest(target_camera, target_pose, points)

    s_occ = np.nan_to_num(np.asarray(source_occlusion), nan=-np.inf,
                          posinf=np.inf, neginf=-np.inf)
    t_occ = np.nan_to_num(np.asarray(target_occlusion), nan=-np.inf,
                          posinf=np.inf, neginf=-np.inf)
    sxc = np.clip(sx, 0, source_camera.width - 1)
    syc = np.clip(sy, 0, source_camera.height - 1)
    s_vis = s_ok & (sz > 0) & (
        s_occ[syc, sxc] + occlusion_depth_threshold >= sz)
    src_val = np.asarray(source_mask, np.uint8)[syc, sxc]
    labeled = s_vis & (src_val != MASK_NONE)
    if not transfer_eval_obs:
        labeled &= src_val != MASK_EVAL_OBS

    txc = np.clip(tx, 0, target_camera.width - 1)
    tyc = np.clip(ty, 0, target_camera.height - 1)
    t_vis = t_ok & (tz > 0) & (
        t_occ[tyc, txc] + occlusion_depth_threshold >= tz)

    ok = labeled & t_vis
    target_mask = np.full((target_camera.height, target_camera.width),
                          MASK_NONE, np.uint8)
    # last write wins, as in the reference's sequential point loop
    target_mask[tyc[ok], txc[ok]] = src_val[ok]

    # 5x5 window, fill if >=10% occupied (threshold int(0.10*25+0.5)=3)
    radius = 2
    threshold = int(0.10 * (2 * radius + 1) ** 2 + 0.5)
    # both integral images are built from the pre-fill mask, then obs is
    # written before eval (eval wins on overlap) — gui_main_window.cc:968-1031
    fill_obs = _box_count_fill(target_mask, MASK_OBS, radius, threshold)
    fill_eval = (_box_count_fill(target_mask, MASK_EVAL_OBS, radius,
                                 threshold) if transfer_eval_obs else None)
    target_mask[fill_obs] = MASK_OBS
    if fill_eval is not None:
        target_mask[fill_eval] = MASK_EVAL_OBS

    if existing_target_mask is None:
        return target_mask
    merged = np.asarray(existing_target_mask, np.uint8).copy()
    write = (target_mask != MASK_NONE) & (merged != MASK_EVAL_OBS)
    merged[write] = target_mask[write]
    return merged
