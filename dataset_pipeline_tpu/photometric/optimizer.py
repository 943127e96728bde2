"""Photometric joint pose+intrinsics Gauss-Newton/LM optimizer.

Counterpart of ``opt/visibility_estimator.cc``, ``opt/cost_calculator.cc`` and
``opt/intrinsics_and_pose_optimizer.cc``:

- **Visibility**: project every point of every level; z-test against the
  splat occlusion depth with ``occlusion_depth_threshold`` slack
  (``visibility_estimator.cc:276-294``); continuous observation scale
  ``log2(2 * radius_px)`` must lie in [current_image_scale, scale_count-1)
  (``CreateObservationIfScaleFits``, ``:405-532``); border / mask /
  oversaturation checks at the coarser interpolation scale.
- **Residuals**: a point contributes iff its center and all K neighbors are
  observed; component k is (I(neighbor_k) - I(center)) - fixed_descriptor_k,
  robust-weighted by Huber on the component-vector norm
  (``intrinsics_and_pose_optimizer.cc:839-930``).
- **Jacobians**: JAX forward-mode autodiff of the composed
  sample(project(exp(eps) * pose, intrinsics)) per observation — replacing
  ~1.5 kLoC of hand-derived chain rules; identical analytic values.
- **LM**: H diagonal *= (1+lambda), accept-if-cost-decreases with FROZEN
  visibility, lambda halve/double, 10 tries, force-apply the last try
  (``.cc:197-258``). Variable order: intrinsics block first, then 6 dof per
  image (``CountAndIndexVariables``, ``.cc:442-473``).

All heavy evaluation is jitted per (image-batch, level); the tiny solve runs
on host in float64.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.ops.interpolate import bilinear, trilinear
from dataset_pipeline_tpu.ops.robust import DEFAULT_COLOR_HUBER, huber_rho, huber_weight
from dataset_pipeline_tpu.ops.splat import render_splats_depth
from dataset_pipeline_tpu.photometric.problem import PhotoLevel, PhotoProblem


# ---------------------------------------------------------------------------
# Differentiable camera-pyramid projection
# ---------------------------------------------------------------------------


def _scaled_params(camera: cm.Camera, params, scale: int):
    """Full-res params -> params of the 2^-scale camera, differentiably
    (same formula as ``scaled_by``; linear in the originals)."""
    factor = 2.0 ** (-scale)
    if camera.spec.unique_focal:
        f = params[0] * factor
        cx = factor * (params[1] + 0.5) - 0.5
        cy = factor * (params[2] + 0.5) - 0.5
        return jnp.concatenate([jnp.stack([f, cx, cy]), params[3:]])
    fx = params[0] * factor
    fy = params[1] * factor
    cx = factor * (params[2] + 0.5) - 0.5
    cy = factor * (params[3] + 0.5) - 0.5
    return jnp.concatenate([jnp.stack([fx, fy, cx, cy]), params[4:]])


def _project_full(camera: cm.Camera, params, p_cam):
    """Project with explicit params at scale 0. Returns (pix, valid)."""
    c = camera.with_params(params)
    return cm.project(c, p_cam)


# ---------------------------------------------------------------------------
# Visibility (per image, per level) — observation masks and scales
# ---------------------------------------------------------------------------


def _visibility_core(camera: cm.Camera, pose_q, pose_t, points, radius,
                     occl_depth, current_scale, scale_count: int,
                     width: int, height: int, depth_slack=0.01,
                     min_depth=0.05):
    """Observation mask + frozen observation scale for every point.

    Returns (visible (N,), obs_scale (N,)). ``occl_depth`` is the (H,W)
    full-res splat occlusion depth for this image.
    """
    pose = SE3(pose_q, pose_t)
    p_cam = pose.apply(points)
    pix, valid = cm.project(camera, p_cam)
    z = p_cam[:, 2]

    # occlusion z-test with slack
    ix = jnp.clip(jnp.round(pix[:, 0]).astype(jnp.int32), 0, width - 1)
    iy = jnp.clip(jnp.round(pix[:, 1]).astype(jnp.int32), 0, height - 1)
    occ = occl_depth[iy, ix]
    valid = valid & (z <= occ + depth_slack) & (z > min_depth)

    # footprint scale
    eps = 1e-3 * jnp.maximum(z, 1e-6)
    p2 = p_cam + jnp.stack([eps, jnp.zeros_like(eps), jnp.zeros_like(eps)], -1)
    pix2, _ = cm.project(camera, p2)
    px_per_m = jnp.linalg.norm(pix2 - pix, axis=-1) / eps
    radius_px = radius * px_per_m
    obs_scale = jnp.log2(jnp.maximum(2.0 * radius_px, 1e-12))

    valid = valid & (obs_scale >= current_scale) & (
        jnp.floor(obs_scale) < scale_count - 1
    ) & (obs_scale >= 0)

    # border check at the coarser interpolation scale
    si = jnp.floor(obs_scale).astype(jnp.int32) + 1
    factor = jnp.exp2(-si.astype(jnp.float32))
    xs = factor * (pix[:, 0] + 0.5) - 0.5
    ys = factor * (pix[:, 1] + 0.5) - 0.5
    w_si = jnp.floor(width * factor + 0.5)
    h_si = jnp.floor(height * factor + 0.5)
    border = 1.0
    valid = valid & (xs + 0.5 >= border) & (ys + 0.5 >= border) & (
        xs + 0.5 < w_si - border
    ) & (ys + 0.5 < h_si - border)
    return valid, obs_scale


@partial(jax.jit, static_argnames=("scale_count", "width", "height"))
def _visibility_one_image(camera: cm.Camera, pose_q, pose_t, points, radius,
                          occl_depth, current_scale, scale_count: int,
                          width: int, height: int, mask_pyr_coarse=None,
                          image_pyr_stack=None, max_valid_intensity=252.0):
    """Single-image wrapper over ``_visibility_core`` (kept for tests)."""
    return _visibility_core(camera, pose_q, pose_t, points, radius, occl_depth,
                            current_scale, scale_count, width, height)


def _mask_filter_core(camera: cm.Camera, pose_q, pose_t, points,
                      obs_scale, valid, image_pyr, mask_pyr,
                      max_valid_intensity):
    """Reject observations whose coarse-interp-scale pixel is masked or
    oversaturated (``visibility_estimator.cc:482-509``). ``mask_pyr`` may be
    an empty tuple (no masks).

    Only the point's OWN interpolation level matters, so this is ONE
    flat-pyramid gather per point (per-level meta via an elementwise
    select chain) instead of a gather per level — each XLA gather costs
    ~6.7 ns/item, and this runs per image per visibility refresh."""
    pose = SE3(pose_q, pose_t)
    p_cam = pose.apply(points)
    pix, _ = cm.project(camera, p_cam)
    si = jnp.floor(obs_scale).astype(jnp.int32) + 1
    L = len(image_pyr)
    if L <= 1:
        return valid
    flat, Hs, Ws, off = _pyramid_flat_meta(image_pyr)
    sic = jnp.clip(si, 1, L - 1)
    # per-point (H_l, W_l, off_l): elementwise selects, NOT tiny-table
    # gathers (and NOT a one-hot matvec — bf16 MXU corrupts the offsets)
    H_l = jnp.full(sic.shape, int(image_pyr[1].shape[0]), jnp.int32)
    W_l = jnp.full(sic.shape, int(image_pyr[1].shape[1]), jnp.int32)
    o_l = jnp.full(sic.shape, int(np.prod(image_pyr[0].shape[-2:])),
                   jnp.int32)
    o_acc = int(np.prod(image_pyr[0].shape[-2:]))
    for s in range(2, L):
        o_acc += int(np.prod(image_pyr[s - 1].shape[-2:]))
        at = sic == s
        H_l = jnp.where(at, int(image_pyr[s].shape[0]), H_l)
        W_l = jnp.where(at, int(image_pyr[s].shape[1]), W_l)
        o_l = jnp.where(at, o_acc, o_l)
    f = jnp.exp2(-sic.astype(jnp.float32))
    xs = f * (pix[:, 0] + 0.5) - 0.5
    ys = f * (pix[:, 1] + 0.5) - 0.5
    ix = jnp.clip(jnp.floor(xs + 0.5).astype(jnp.int32), 0, W_l - 1)
    iy = jnp.clip(jnp.floor(ys + 0.5).astype(jnp.int32), 0, H_l - 1)
    idx = o_l + iy * W_l + ix
    bad = flat[idx] > max_valid_intensity
    if mask_pyr:
        mflat = jnp.concatenate([m.reshape(-1) for m in mask_pyr])
        bad = bad | (mflat[idx] != 0)
    in_range = (si >= 1) & (si <= L - 1)
    return valid & ~(in_range & bad)


# ---------------------------------------------------------------------------
# Intensity sampling across the pyramid at a continuous scale
# ---------------------------------------------------------------------------


def _pyramid_flat_meta(image_pyr: List):
    """Flatten a pyramid into one 1-D buffer + static per-level meta.

    Lets the trilinear sampler gather ONLY the two bracketing levels of each
    point via index arithmetic — 8 taps/point regardless of L — instead of
    evaluating every level pair and one-hot selecting (3x the gathers; the
    sampler dominates the H,b batch on TPU).
    """
    sizes = [im.shape[-2] * im.shape[-1] for im in image_pyr]
    offs = [0]
    for s in sizes:
        offs.append(offs[-1] + s)
    flat = jnp.concatenate([im.reshape(-1) for im in image_pyr])
    Hs = jnp.asarray([im.shape[-2] for im in image_pyr], jnp.int32)
    Ws = jnp.asarray([im.shape[-1] for im in image_pyr], jnp.int32)
    off = jnp.asarray(offs[:-1], jnp.int32)
    return flat, Hs, Ws, off


def _bilinear_flat(flat, Hs, Ws, off, level, pix0):
    """Bilinear sample of per-point pyramid ``level`` at full-res coords.

    Returns (value, d/dpix0_x, d/dpix0_y, valid); the 2^-level coordinate
    scale is folded into the derivatives.
    """
    f = jnp.exp2(-level.astype(jnp.float32))
    x = f * (pix0[..., 0] + 0.5) - 0.5
    y = f * (pix0[..., 1] + 0.5) - 0.5
    W_l = Ws[level]
    H_l = Hs[level]
    o = off[level]
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    valid = (x >= 0) & (y >= 0) & (ix < W_l - 1) & (iy < H_l - 1)
    ixc = jnp.clip(ix, 0, W_l - 2)
    iyc = jnp.clip(iy, 0, H_l - 2)
    base = o + iyc * W_l + ixc
    tl = flat[base]
    tr = flat[base + 1]
    bl = flat[base + W_l]
    br = flat[base + W_l + 1]
    fx = x - ixc
    fy = y - iyc
    top = (1 - fx) * tl + fx * tr
    bottom = (1 - fx) * bl + fx * br
    value = (1 - fy) * top + fy * bottom
    dx = (fy * (br - bl) + (1 - fy) * (tr - tl)) * f
    dy = (bottom - top) * f
    return value, dx, dy, valid


# Brick (blocked-row) sampling: ON for TPU backends (each XLA gather costs
# ~6.7 ns regardless of payload, so 128-lane-row gathers from the brick
# layout beat 8 scalar taps by ~25x — see ops/brick.py), OFF on CPU where
# scalar gathers are cheap. Override for tests/benchmarks via USE_BRICK.
USE_BRICK = None


def _use_brick() -> bool:
    if USE_BRICK is not None:
        return USE_BRICK
    return jax.default_backend() == "tpu"


def _sample_pyramid(image_pyr: List, pix0, obs_scale):
    """Trilinear sample at full-res coords ``pix0`` and continuous scale.

    image_pyr: list of (H_s,W_s) single-image planes, scale 0 first.
    """
    if _use_brick():
        from dataset_pipeline_tpu.ops.brick import (
            brick_sample,
            build_brick_pyramid,
        )

        brick = build_brick_pyramid(list(image_pyr))
        return brick_sample(brick, len(image_pyr), pix0, obs_scale)
    L = len(image_pyr)
    flat, Hs, Ws, off = _pyramid_flat_meta(image_pyr)
    if L == 1:
        # no coarser bracket exists — plain bilinear of level 0 (a clip to
        # [1, L-1] would wrap si-1 to -1 into the per-level meta arrays)
        zero = jnp.zeros(pix0.shape[:-1], jnp.int32)
        v, _, _, ok = _bilinear_flat(flat, Hs, Ws, off, zero, pix0)
        return v, ok
    si = jnp.clip(jnp.floor(obs_scale).astype(jnp.int32) + 1, 1, L - 1)
    z = 1.0 - (obs_scale - jnp.floor(obs_scale))
    vc, _, _, okc = _bilinear_flat(flat, Hs, Ws, off, si, pix0)  # coarser
    vf, _, _, okf = _bilinear_flat(flat, Hs, Ws, off, si - 1, pix0)  # finer
    return (1.0 - z) * vc + z * vf, okc & okf


# ---------------------------------------------------------------------------
# Residuals / Jacobians for one image over one level
# ---------------------------------------------------------------------------



def _nbr_inten_ok(inten, ok, neighbors):
    """Neighbor (intensity, validity) in ONE gather: validity rides as a
    sentinel value INSIDE the intensity plane (intensities live in
    [0, 255]; 3e8 is exactly representable in f32). Each XLA gather costs
    ~6.7 ns PER GATHERED ITEM, so separate inten[nbr] / ok[nbr] gathers
    double the per-observation bill; unlike a packed (N,K,2) gather this
    adds NO narrow trailing dim for the (8,128) tile layout to pad."""
    enc = jnp.where(ok, inten, jnp.float32(3.0e8))
    ge = enc[neighbors]
    nbr_ok = ge < 1.5e8
    return jnp.where(nbr_ok, ge, 0.0), nbr_ok


def _point_intensities(camera, params, pose_q, pose_t, points, image_pyr, obs_scale):
    """Intensity of every point under the given state (vectorized)."""
    pose = SE3(pose_q, pose_t)
    p_cam = pose.apply(points)
    pix, valid = _project_full(camera, params, p_cam)
    val, ok = _sample_pyramid(image_pyr, pix, obs_scale)
    return val, valid & ok


def _residual_data(camera, params, pose_q, pose_t, level: PhotoLevel, image_pyr,
                   obs_scale, contrib_mask):
    """Per-point residual vectors r (N,K) and the scalar robust cost terms."""
    inten, ok = _point_intensities(camera, params, pose_q, pose_t, level.points,
                                   image_pyr, obs_scale)
    nbr_inten, nbr_ok = _nbr_inten_ok(inten, ok, level.neighbors)
    r = (nbr_inten - inten[:, None]) - level.fixed_descriptors
    norm = jnp.sqrt(jnp.maximum(jnp.sum(r * r, -1), 1e-20))
    rho = huber_rho(norm, DEFAULT_COLOR_HUBER)
    w = huber_weight(norm, DEFAULT_COLOR_HUBER)
    all_ok = ok & jnp.all(nbr_ok, -1) & contrib_mask
    return r, w, rho, all_ok


@partial(jax.jit, static_argnames=("scale_count",))
def _point_costs_one(camera: cm.Camera, params, pose_q, pose_t, level_points,
                     level_neighbors, level_desc, image_pyr, obs_scale,
                     contrib_mask, scale_count: int):
    """Per-point robust cost rho (N,) + validity — the data behind the
    GUI's cost display modes (``dataset_inspector/gui_main_window.h:47-61``)."""
    level = PhotoLevel(level_points, None, None, level_neighbors, level_desc, 0.0)
    _, _, rho, all_ok = _residual_data(camera, params, pose_q, pose_t, level,
                                       image_pyr, obs_scale, contrib_mask)
    return rho, all_ok


@partial(jax.jit, static_argnames=("scale_count",))
def _cost_one(camera: cm.Camera, params, pose_q, pose_t, level_points,
              level_neighbors, level_desc, image_pyr, obs_scale, contrib_mask,
              scale_count: int):
    level = PhotoLevel(level_points, None, None, level_neighbors, level_desc, 0.0)
    _, _, rho, all_ok = _residual_data(camera, params, pose_q, pose_t, level,
                                       image_pyr, obs_scale, contrib_mask)
    cost = jnp.sum(jnp.where(all_ok, rho, 0.0))
    count = jnp.sum(all_ok)
    return cost, count


@partial(jax.jit, static_argnames=("scale_count",))
def _image_descriptors_one(camera: cm.Camera, params, pose_q, pose_t, level_points,
                           level_neighbors, image_pyr, obs_scale, contrib_mask,
                           scale_count: int):
    """This image's contribution to the variable-descriptor mean
    (``opt/color_optimizer.cc:40-123``): image-space descriptors of fully
    observed points. Returns (desc_sum (N,K), observed (N,))."""
    inten, ok = _point_intensities(camera, params, pose_q, pose_t, level_points,
                                   image_pyr, obs_scale)
    nbr_inten, nbr_ok = _nbr_inten_ok(inten, ok, level_neighbors)
    all_ok = ok & jnp.all(nbr_ok, -1) & contrib_mask
    desc = jnp.where(all_ok[:, None], nbr_inten - inten[:, None], 0.0)
    return jnp.where(all_ok[:, None], desc, 0.0), all_ok


def _footprint_scale(camera, params, pose, points, radius):
    """Continuous observation scale log2(2*radius_px) as a DIFFERENTIABLE
    function of intrinsics and pose — same finite-footprint formula as
    ``_visibility_one_image`` so values coincide at the linearization point.
    This is the d(scale)/d(state) chain of the reference's image-scale
    Jacobian row (``intrinsics_and_pose_optimizer.cc:1026-1070``)."""
    c = camera.with_params(params)
    p_cam = pose.apply(points)
    pix, _ = cm.project(c, p_cam)
    z = p_cam[:, 2]
    eps = 1e-3 * jnp.maximum(z, 1e-6)
    p2 = p_cam + jnp.stack([eps, jnp.zeros_like(eps), jnp.zeros_like(eps)], -1)
    pix2, _ = cm.project(c, p2)
    px_per_m = jnp.linalg.norm(pix2 - pix, axis=-1) / eps
    return jnp.log2(jnp.maximum(2.0 * radius * px_per_m, 1e-12))


def _intensity_ok(camera, prm, pose, points, image_pyr, obs_scale, radius,
                  dynamic_scale: bool):
    """(intensity, valid) per point. With ``dynamic_scale`` the sampling
    scale is anchored at the frozen ``obs_scale`` VALUE but carries the
    footprint-scale derivative, adding the third chain-rule row
    d(intensity)/d(scale) * d(scale)/d(state) to any Jacobian taken through
    this function (the reference's ``.cc:1026-1070`` term)."""
    if dynamic_scale:
        fp = _footprint_scale(camera, prm, pose, points, radius)
        s = jax.lax.stop_gradient(obs_scale) + fp - jax.lax.stop_gradient(fp)
    else:
        s = obs_scale
    p_cam = pose.apply(points)
    pix, valid = _project_full(camera, prm, p_cam)
    val, ok = _sample_pyramid(image_pyr, pix, s)
    return val, valid & ok


def _gram_assemble(J, inten, ok, neighbors, desc, contrib_mask):
    """Assemble H,b,cost,count from the PER-POINT intensity Jacobian J (N,V).

    The descriptor-residual rows are r_{nk} = I[nbr_nk] - I[n] - d_{nk} with
    Jacobian J[nbr_nk] - J[n] (``AccumulateOnHAndB``, ``.cc:1219-1296``).
    Instead of materializing the (N,K,V) row tensor, expand the Gram sum:

      H = J^T diag(c + K*w) J - (S^T A + A^T S)
      b = J^T (gamma - w .* sum_k r_k)

    expanded per neighbor slot k with A_k = J[nbr_:,k] (K static gathers):

      H = sum_k [A_k^T W A_k - A_k^T W J - (A_k^T W J)^T] + K J^T W J
      b = sum_k A_k^T (w r_k)  -  J^T (w sum_k r_k)

    — gathers + (V,N)x(N,V) MXU products at HIGHEST precision only, NO
    scatters (TPU scatter-adds with colliding indices serialize; this
    formulation trades them for K tiny matmuls).
    """
    nbr_inten, nbr_ok = _nbr_inten_ok(inten, ok, neighbors)
    all_ok = ok & jnp.all(nbr_ok, -1) & contrib_mask
    r = (nbr_inten - inten[:, None]) - desc
    r = jnp.where(all_ok[:, None], r, 0.0)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(r * r, -1), 1e-20))
    rho = huber_rho(norm, DEFAULT_COLOR_HUBER)
    w = jnp.where(all_ok, huber_weight(norm, DEFAULT_COLOR_HUBER), 0.0)
    # zero invalid points' J rows: they carry no weight anywhere, but may
    # hold non-finite values that would poison the matmuls
    J = jnp.where(ok[:, None], J, 0.0)
    K = neighbors.shape[1]

    def gram(x, y):
        return jax.lax.dot_general(
            x, y, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    A = w[:, None] * J  # W J
    H = K * gram(A, J)  # K J^T W J
    b = -gram(J, (w * jnp.sum(r, -1))[:, None])[:, 0]
    for k in range(K):
        Ak = J[neighbors[:, k]]
        WAk = w[:, None] * Ak
        M = gram(WAk, J)
        H = H + gram(WAk, Ak) - M - M.T
        b = b + gram(Ak, (w * r[:, k])[:, None])[:, 0]
    cost = jnp.sum(jnp.where(all_ok, rho, 0.0))
    count = jnp.sum(all_ok)
    return H, b, cost, count


def _sample_pyramid_with_derivs(image_pyr: List, pix0, obs_scale):
    """Trilinear sample + analytic derivatives wrt the FULL-RES pixel coords
    and the continuous scale: (value, d/dpix0_x, d/dpix0_y, d/dscale, ok).

    Flat-pyramid gathers (see :func:`_pyramid_flat_meta`): only the two
    bracketing levels of each point are touched; the per-level coordinate
    scaling contributes the 2^-s chain factor, and z = 1 - frac(scale)
    contributes d/dscale = -d/dz. On TPU the brick-layout row-gather twin
    (``ops/brick.py``) replaces this path (2 row gathers instead of 8
    scalar gathers per observation).
    """
    if _use_brick():
        from dataset_pipeline_tpu.ops.brick import (
            brick_sample_with_derivs,
            build_brick_pyramid,
        )

        brick = build_brick_pyramid(list(image_pyr))
        return brick_sample_with_derivs(brick, len(image_pyr), pix0, obs_scale)
    L = len(image_pyr)
    flat, Hs, Ws, off = _pyramid_flat_meta(image_pyr)
    if L == 1:
        # single-level pyramid: plain bilinear of level 0, d/dscale = 0
        zero = jnp.zeros(pix0.shape[:-1], jnp.int32)
        v, dx, dy, ok = _bilinear_flat(flat, Hs, Ws, off, zero, pix0)
        return v, dx, dy, jnp.zeros_like(v), ok
    si = jnp.clip(jnp.floor(obs_scale).astype(jnp.int32) + 1, 1, L - 1)
    z = 1.0 - (obs_scale - jnp.floor(obs_scale))
    vc, dxc, dyc, okc = _bilinear_flat(flat, Hs, Ws, off, si, pix0)
    vf, dxf, dyf, okf = _bilinear_flat(flat, Hs, Ws, off, si - 1, pix0)
    value = (1.0 - z) * vc + z * vf
    dpx = (1.0 - z) * dxc + z * dxf
    dpy = (1.0 - z) * dyc + z * dyf
    ds = -(vf - vc)  # dz/dscale = -1
    return value, dpx, dpy, ds, okc & okf


def _hb_core(camera, params, pose_q, pose_t, points, neighbors, desc,
             image_pyr, obs_scale, contrib_mask, radius,
             optimize_intrinsics: bool, dynamic_scale: bool):
    """H,b contribution of one image on one level.

    Variable layout of the returned block: [P intrinsics | 6 pose].

    Jacobian structure mirrors the reference's
    ``ComputePointIntensityAndJacobians`` (``.cc:932-1217``): ONE
    sample-with-analytic-derivatives per point (dI/dpix, dI/dscale) chained
    with forward-mode Jacobians of the GATHER-FREE projection/footprint
    math (dpix/dstate, dscale/dstate) — the image is touched once instead
    of once per tangent, which is what makes this the production-rate path.
    """
    pose0 = SE3(pose_q, pose_t)

    def geom(eps, prm):
        """(pix (N,2), footprint-scale (N,)) — elementwise, no gathers."""
        pose = SE3.exp(eps).compose(pose0)
        p_cam = pose.apply(points)
        pix, _ = _project_full(camera, prm, p_cam)
        if dynamic_scale:
            fp = _footprint_scale(camera, prm, pose, points, radius)
        else:
            fp = jnp.zeros(points.shape[0], pix.dtype)
        return pix, fp

    eps0 = jnp.zeros(6, jnp.float32)
    pix, _ = geom(eps0, params)
    _, valid = _project_full(camera, params, pose0.apply(points))
    inten, dpx, dpy, dvds, okS = _sample_pyramid_with_derivs(
        image_pyr, pix, obs_scale)
    ok = valid & okS

    (Jpix_e, Jpix_p), (Jfp_e, Jfp_p) = jax.jacfwd(geom, argnums=(0, 1))(
        eps0, params)
    J_pose = dpx[:, None] * Jpix_e[:, 0, :] + dpy[:, None] * Jpix_e[:, 1, :]
    if dynamic_scale:
        J_pose = J_pose + dvds[:, None] * Jfp_e
    if optimize_intrinsics:
        J_int = dpx[:, None] * Jpix_p[:, 0, :] + dpy[:, None] * Jpix_p[:, 1, :]
        if dynamic_scale:
            J_int = J_int + dvds[:, None] * Jfp_p
        J = jnp.concatenate([J_int, J_pose], -1)
    else:
        J = J_pose
    return _gram_assemble(J, inten, ok, neighbors, desc, contrib_mask)


@partial(jax.jit, static_argnames=("scale_count", "optimize_intrinsics",
                                   "dynamic_scale"))
def _hb_one(camera: cm.Camera, params, pose_q, pose_t, level_points,
            level_neighbors, level_desc, image_pyr, obs_scale, contrib_mask,
            scale_count: int, optimize_intrinsics: bool,
            radius=0.0, dynamic_scale: bool = False):
    """Single-image wrapper over ``_hb_core`` (kept for tests / tools)."""
    return _hb_core(camera, params, pose_q, pose_t, level_points,
                    level_neighbors, level_desc, image_pyr, obs_scale,
                    contrib_mask, radius, optimize_intrinsics, dynamic_scale)


def _hb_depth_core(camera, params, pose_q, pose_t, level_points,
                   depth_pyr, obs_scale, contrib_mask,
                   optimize_intrinsics: bool):
    """H,b for inverse-depth residuals r = 1/D(pix) - 1/z against a FIXED
    per-image depth-map pyramid, Tukey-weighted
    (``intrinsics_and_pose_optimizer.cc:1149-1214``; the reference leaves the
    rig-dependent case unimplemented — so do we)."""
    from dataset_pipeline_tpu.ops.robust import DEFAULT_DEPTH_TUKEY, tukey_rho, tukey_weight

    pose0 = SE3(pose_q, pose_t)

    def geom(eps, prm):
        """(pix (N,2), z (N,)) — elementwise, no gathers."""
        pose = SE3.exp(eps).compose(pose0)
        p_cam = pose.apply(level_points)
        c2 = camera.with_params(prm)
        pix, _ = cm.project(c2, p_cam)
        return pix, p_cam[:, 2]

    eps0 = jnp.zeros(6, jnp.float32)
    pix, z = geom(eps0, params)
    _, valid = cm.project(camera.with_params(params), pose0.apply(level_points))
    D, dDx, dDy, _, okD = _sample_pyramid_with_derivs(depth_pyr, pix, obs_scale)
    inv_D = jnp.where(D > 0, 1.0 / jnp.maximum(D, 1e-9), 0.0)
    safe_z = jnp.where(z == 0, 1.0, z)
    inv_z = jnp.where(z != 0, 1.0 / safe_z, 0.0)
    r0 = inv_D - inv_z
    rho = tukey_rho(r0, DEFAULT_DEPTH_TUKEY)
    w = tukey_weight(r0, DEFAULT_DEPTH_TUKEY)
    ok = valid & okD & (D > 0) & contrib_mask
    wfull = jnp.where(ok, w, 0.0)

    # dr/dstate = -(1/D^2) dD/dpix . dpix/dstate + (1/z^2) dz/dstate
    (Jpix_e, Jpix_p), (Jz_e, Jz_p) = jax.jacfwd(geom, argnums=(0, 1))(
        eps0, params)
    dD_coef = -jnp.where(D > 0, 1.0 / jnp.maximum(D * D, 1e-18), 0.0)
    dz_coef = jnp.where(z != 0, 1.0 / (safe_z * safe_z), 0.0)

    def chain(Jpix, Jz):
        return (dD_coef[:, None] * (dDx[:, None] * Jpix[:, 0, :]
                                    + dDy[:, None] * Jpix[:, 1, :])
                + dz_coef[:, None] * Jz)

    J_pose = chain(Jpix_e, Jz_e)
    rows = (jnp.concatenate([chain(Jpix_p, Jz_p), J_pose], -1)
            if optimize_intrinsics else J_pose)
    # invalid points carry zero weight but may hold non-finite J entries
    rows = jnp.where(ok[:, None], rows, 0.0)
    V = rows.shape[-1]
    sw = jnp.sqrt(wfull)
    rows_w = rows * sw[:, None]
    r_w = jnp.where(ok, r0, 0.0) * sw
    H = jax.lax.dot_general(
        rows_w, rows_w, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    b = jnp.sum(rows_w * r_w[:, None], 0)
    cost = jnp.sum(jnp.where(ok, rho, 0.0))
    count = jnp.sum(ok)
    return H, b, cost, count


@partial(jax.jit, static_argnames=("scale_count", "optimize_intrinsics"))
def _hb_depth_one(camera: cm.Camera, params, pose_q, pose_t, level_points,
                  depth_pyr, obs_scale, contrib_mask,
                  scale_count: int, optimize_intrinsics: bool):
    return _hb_depth_core(camera, params, pose_q, pose_t, level_points,
                          depth_pyr, obs_scale, contrib_mask,
                          optimize_intrinsics)


@partial(jax.jit, static_argnames=("scale_count",))
def _cost_depth_one(camera: cm.Camera, params, pose_q, pose_t, level_points,
                    depth_pyr, obs_scale, contrib_mask, scale_count: int):
    from dataset_pipeline_tpu.ops.robust import DEFAULT_DEPTH_TUKEY, tukey_rho

    pose = SE3(pose_q, pose_t)
    p_cam = pose.apply(level_points)
    z = p_cam[:, 2]
    c2 = camera.with_params(params)
    pix, valid = cm.project(c2, p_cam)
    D, okD = _sample_pyramid(depth_pyr, pix, obs_scale)
    ok = valid & okD & (D > 0) & contrib_mask
    inv_D = jnp.where(D > 0, 1.0 / jnp.maximum(D, 1e-9), 0.0)
    inv_z = jnp.where(z != 0, 1.0 / jnp.where(z == 0, 1.0, z), 0.0)
    r = inv_D - inv_z
    rho = tukey_rho(r, DEFAULT_DEPTH_TUKEY)
    return jnp.sum(jnp.where(ok, rho, 0.0)), jnp.sum(ok)


def _hb_rig_core(camera, params, extr_q, extr_t, ref_q, ref_t,
                 points, neighbors, desc, image_pyr, obs_scale,
                 contrib_mask, radius, optimize_intrinsics: bool,
                 dynamic_scale: bool):
    """H,b for a rig-DEPENDENT image: pose = image_T_rig . ref_pose.

    Returned block layout: [P intrinsics | 6 rig extrinsics | 6 ref pose]
    (``intrinsics_and_pose_optimizer.cc:624-720`` rig branch).
    """

    def geom(eps_e, eps_r, prm):
        extr = SE3.exp(eps_e).compose(SE3(extr_q, extr_t))
        ref = SE3.exp(eps_r).compose(SE3(ref_q, ref_t))
        pose = extr.compose(ref)
        p_cam = pose.apply(points)
        pix, _ = _project_full(camera, prm, p_cam)
        if dynamic_scale:
            fp = _footprint_scale(camera, prm, pose, points, radius)
        else:
            fp = jnp.zeros(points.shape[0], pix.dtype)
        return pix, fp

    z6 = jnp.zeros(6, jnp.float32)
    pix, _ = geom(z6, z6, params)
    pose0 = SE3.exp(z6).compose(SE3(extr_q, extr_t)).compose(
        SE3.exp(z6).compose(SE3(ref_q, ref_t)))
    _, valid = _project_full(camera, params, pose0.apply(points))
    inten, dpx, dpy, dvds, okS = _sample_pyramid_with_derivs(
        image_pyr, pix, obs_scale)
    ok = valid & okS

    (Jpix_e, Jpix_r, Jpix_p), (Jfp_e, Jfp_r, Jfp_p) = jax.jacfwd(
        geom, argnums=(0, 1, 2))(z6, z6, params)

    def chain(Jpix, Jfp):
        Jb = dpx[:, None] * Jpix[:, 0, :] + dpy[:, None] * Jpix[:, 1, :]
        if dynamic_scale:
            Jb = Jb + dvds[:, None] * Jfp
        return Jb

    blocks = [chain(Jpix_e, Jfp_e), chain(Jpix_r, Jfp_r)]
    if optimize_intrinsics:
        blocks.insert(0, chain(Jpix_p, Jfp_p))
    J = jnp.concatenate(blocks, -1)
    return _gram_assemble(J, inten, ok, neighbors, desc, contrib_mask)


@partial(jax.jit, static_argnames=("scale_count", "optimize_intrinsics",
                                   "dynamic_scale"))
def _hb_one_rig(camera: cm.Camera, params, extr_q, extr_t, ref_q, ref_t,
                level_points, level_neighbors, level_desc, image_pyr, obs_scale,
                contrib_mask, scale_count: int, optimize_intrinsics: bool,
                radius=0.0, dynamic_scale: bool = False):
    """Single-image wrapper over ``_hb_rig_core`` (kept for tests / tools)."""
    return _hb_rig_core(camera, params, extr_q, extr_t, ref_q, ref_t,
                        level_points, level_neighbors, level_desc, image_pyr,
                        obs_scale, contrib_mask, radius, optimize_intrinsics,
                        dynamic_scale)


# ---------------------------------------------------------------------------
# Batched (vmapped-over-images) dispatch layer
#
# The reference's hot loop iterates images one by one on the CPU
# (``intrinsics_and_pose_optimizer.cc:624-720``); here images of a group
# share shapes, so visibility / cost / H,b run as ONE dispatch per
# (image-chunk, level, residual-type) — vmapped over the image axis, which
# is also the natural axis to shard over a device mesh (each device owns a
# slice of the chunk; per-image H blocks never need a collective, the
# shared intrinsics block is reduced on the host or via psum).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("scale_count", "width", "height",
                                   "geom_batched"))
def _visibility_batch(camera: cm.Camera, pose_q, pose_t, points, radius,
                      occl_depth, current_scale, scale_count: int,
                      width: int, height: int, depth_slack, min_depth,
                      geom_batched: bool = False):
    """(mask (nb,M), obs_scale (nb,M)) for an image chunk."""
    ga = 0 if geom_batched else None
    fn = jax.vmap(
        lambda q, t, pts, od: _visibility_core(
            camera, q, t, pts, radius, od, current_scale, scale_count,
            width, height, depth_slack, min_depth),
        in_axes=(0, 0, ga, 0))
    return fn(pose_q, pose_t, points, occl_depth)


@partial(jax.jit, static_argnames=("geom_batched",))
def _mask_filter_batch(camera: cm.Camera, pose_q, pose_t, points, obs_scale,
                       valid, image_pyr, mask_pyr, max_valid_intensity,
                       geom_batched: bool = False):
    ga = 0 if geom_batched else None
    fn = jax.vmap(
        lambda q, t, pts, s, v, pyr, mpyr: _mask_filter_core(
            camera, q, t, pts, s, v, pyr, mpyr, max_valid_intensity),
        in_axes=(0, 0, ga, 0, 0, 0, 0))
    return fn(pose_q, pose_t, points, obs_scale, valid, image_pyr, mask_pyr)


@partial(jax.jit, static_argnames=("geom_batched",))
def _cost_batch(camera: cm.Camera, params, pose_q, pose_t, points, neighbors,
                desc, image_pyr, obs_scale, contrib,
                geom_batched: bool = False):
    """Summed (cost, count) of a chunk of images on one level."""
    ga = 0 if geom_batched else None

    def one(q, t, pts, nbr, d, pyr, s, m):
        inten, ok = _point_intensities(camera, params, q, t, pts, pyr, s)
        nbr_inten, nbr_ok = _nbr_inten_ok(inten, ok, nbr)
        all_ok = ok & jnp.all(nbr_ok, -1) & m
        r = (nbr_inten - inten[:, None]) - d
        r = jnp.where(all_ok[:, None], r, 0.0)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(r * r, -1), 1e-20))
        rho = huber_rho(norm, DEFAULT_COLOR_HUBER)
        return jnp.sum(jnp.where(all_ok, rho, 0.0)), jnp.sum(all_ok)

    fn = jax.vmap(one, in_axes=(0, 0, ga, ga, ga, 0, 0, 0))
    cost, count = fn(pose_q, pose_t, points, neighbors, desc, image_pyr,
                     obs_scale, contrib)
    return jnp.sum(cost), jnp.sum(count)


@partial(jax.jit, static_argnames=("geom_batched",))
def _imgdesc_batch(camera: cm.Camera, params, pose_q, pose_t, points,
                   neighbors, image_pyr, obs_scale, contrib,
                   geom_batched: bool = False):
    """Chunk contribution to the variable-descriptor mean
    (``opt/color_optimizer.cc:40-123``). Shared geometry: returns the summed
    (desc_sum (N,K), count (N,)); batched geometry: per-image (nb,M,K) /
    (nb,M) for the caller to scatter into the level arrays."""
    ga = 0 if geom_batched else None

    def one(q, t, pts, nbr, pyr, s, m):
        inten, ok = _point_intensities(camera, params, q, t, pts, pyr, s)
        nbr_inten, nbr_ok = _nbr_inten_ok(inten, ok, nbr)
        all_ok = ok & jnp.all(nbr_ok, -1) & m
        d = nbr_inten - inten[:, None]
        return jnp.where(all_ok[:, None], d, 0.0), all_ok

    fn = jax.vmap(one, in_axes=(0, 0, ga, ga, 0, 0, 0))
    d, ok = fn(pose_q, pose_t, points, neighbors, image_pyr, obs_scale, contrib)
    if geom_batched:
        return d, ok
    return jnp.sum(d, 0), jnp.sum(ok.astype(jnp.int32), 0)


@jax.jit
def _scatter_view_desc(desc_sum, count, d, ok, scatter_idx):
    """Scatter a view chunk's per-image descriptors back to the dense level
    arrays (drop-mode: padding rows carry scatter index N)."""
    k = d.shape[-1]
    flat = scatter_idx.reshape(-1)
    desc_sum = desc_sum.at[flat].add(d.reshape(-1, k), mode="drop")
    count = count.at[flat].add(ok.reshape(-1).astype(jnp.int32), mode="drop")
    return desc_sum, count


@partial(jax.jit, static_argnames=("optimize_intrinsics", "dynamic_scale",
                                   "geom_batched"))
def _hb_batch(camera: cm.Camera, params, pose_q, pose_t, points, neighbors,
              desc, image_pyr, obs_scale, contrib, radius,
              optimize_intrinsics: bool, dynamic_scale: bool,
              geom_batched: bool = False):
    """Per-image H (nb,V,V), b (nb,V) + summed cost/count for a chunk."""
    ga = 0 if geom_batched else None
    fn = jax.vmap(
        lambda q, t, pts, nbr, d, pyr, s, m: _hb_core(
            camera, params, q, t, pts, nbr, d, pyr, s, m, radius,
            optimize_intrinsics, dynamic_scale),
        in_axes=(0, 0, ga, ga, ga, 0, 0, 0))
    H, b, cost, count = fn(pose_q, pose_t, points, neighbors, desc,
                           image_pyr, obs_scale, contrib)
    return H, b, jnp.sum(cost), jnp.sum(count)


@partial(jax.jit, static_argnames=("optimize_intrinsics", "dynamic_scale",
                                   "geom_batched"))
def _hb_rig_batch(camera: cm.Camera, params, extr_q, extr_t, ref_q, ref_t,
                  points, neighbors, desc, image_pyr, obs_scale, contrib,
                  radius, optimize_intrinsics: bool, dynamic_scale: bool,
                  geom_batched: bool = False):
    """Rig-dependent chunk: extrinsics shared, reference pose per image."""
    ga = 0 if geom_batched else None
    fn = jax.vmap(
        lambda rq, rt, pts, nbr, d, pyr, s, m: _hb_rig_core(
            camera, params, extr_q, extr_t, rq, rt, pts, nbr, d, pyr, s, m,
            radius, optimize_intrinsics, dynamic_scale),
        in_axes=(0, 0, ga, ga, ga, 0, 0, 0))
    H, b, cost, count = fn(ref_q, ref_t, points, neighbors, desc,
                           image_pyr, obs_scale, contrib)
    return H, b, jnp.sum(cost), jnp.sum(count)


@partial(jax.jit, static_argnames=("optimize_intrinsics", "geom_batched"))
def _hb_depth_batch(camera: cm.Camera, params, pose_q, pose_t, points,
                    depth_pyr, obs_scale, contrib,
                    optimize_intrinsics: bool, geom_batched: bool = False):
    ga = 0 if geom_batched else None
    fn = jax.vmap(
        lambda q, t, pts, pyr, s, m: _hb_depth_core(
            camera, params, q, t, pts, pyr, s, m, optimize_intrinsics),
        in_axes=(0, 0, ga, 0, 0, 0))
    H, b, cost, count = fn(pose_q, pose_t, points, depth_pyr, obs_scale,
                           contrib)
    return H, b, jnp.sum(cost), jnp.sum(count)


# ---------------------------------------------------------------------------
# Dispatch fusion: through the remote relay EVERY dispatch costs ~0.2 s, so
# per-(level, residual-type) calls dominate the DSLR engine iteration (the
# device work is ~2 s). These wrappers trace the per-level jitted kernels
# into ONE program (nested jit inlines), turning 3 levels x types x
# (vis+mask) calls into one dispatch each. Structure (entry count) is part
# of the jit key via the pytree; statics via static_argnames.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("scale_count", "width", "height",
                                   "geom_batched"))
def _visibility_mask_levels(camera: cm.Camera, pose_q, pose_t, occl,
                            level_args, current_scale, scale_count: int,
                            width: int, height: int, depth_slack, min_depth,
                            max_valid_intensity, row_valid,
                            geom_batched: bool = False):
    """All levels' visibility + mask filter for one image chunk in ONE
    dispatch. ``level_args``: tuple of (points, radius, core_or_None,
    image_pyr, mask_pyr) per level. Returns tuple of (mask, obs_scale)."""
    outs = []
    for (points, radius, core, pyr, mask_pyr) in level_args:
        m, sc = _visibility_batch(camera, pose_q, pose_t, points, radius,
                                  occl, current_scale, scale_count, width,
                                  height, depth_slack, min_depth,
                                  geom_batched=geom_batched)
        if core is not None:
            m = m & core
        m = m & row_valid[:, None]
        m = _mask_filter_batch(camera, pose_q, pose_t, points, sc, m, pyr,
                               mask_pyr, max_valid_intensity,
                               geom_batched=geom_batched)
        outs.append((m, sc))
    return tuple(outs)


@partial(jax.jit, static_argnames=("optimize_intrinsics", "dynamic_scale",
                                   "geom_batched"))
def _hb_batch_levels(camera: cm.Camera, params, pose_q, pose_t, entries,
                     optimize_intrinsics: bool, dynamic_scale: bool,
                     geom_batched: bool = False):
    """One dispatch for a chunk's FULL set of (level, residual-type) H,b
    accumulations. ``entries``: tuple of (points, neighbors, desc, pyr,
    obs_scale, contrib, radius)."""
    return tuple(
        _hb_batch(camera, params, pose_q, pose_t, pts, nbr, d, pyr, sc, m,
                  rad, optimize_intrinsics, dynamic_scale, geom_batched)
        for (pts, nbr, d, pyr, sc, m, rad) in entries)


@partial(jax.jit, static_argnames=("geom_batched",))
def _cost_batch_levels(camera: cm.Camera, params, pose_q, pose_t, entries,
                       geom_batched: bool = False):
    """One dispatch for a chunk's full set of cost evaluations."""
    return tuple(
        _cost_batch(camera, params, pose_q, pose_t, pts, nbr, d, pyr, sc, m,
                    geom_batched=geom_batched)
        for (pts, nbr, d, pyr, sc, m) in entries)


@partial(jax.jit, static_argnames=("geom_batched",))
def _cost_depth_batch(camera: cm.Camera, params, pose_q, pose_t, points,
                      depth_pyr, obs_scale, contrib,
                      geom_batched: bool = False):
    from dataset_pipeline_tpu.ops.robust import DEFAULT_DEPTH_TUKEY, tukey_rho

    ga = 0 if geom_batched else None

    def one(q, t, pts, pyr, s, m):
        pose = SE3(q, t)
        p_cam = pose.apply(pts)
        z = p_cam[:, 2]
        c2 = camera.with_params(params)
        pix, valid = cm.project(c2, p_cam)
        D, okD = _sample_pyramid(pyr, pix, s)
        ok = valid & okD & (D > 0) & m
        inv_D = jnp.where(D > 0, 1.0 / jnp.maximum(D, 1e-9), 0.0)
        inv_z = jnp.where(z != 0, 1.0 / jnp.where(z == 0, 1.0, z), 0.0)
        r = inv_D - inv_z
        rho = tukey_rho(r, DEFAULT_DEPTH_TUKEY)
        return jnp.sum(jnp.where(ok, rho, 0.0)), jnp.sum(ok)

    fn = jax.vmap(one, in_axes=(0, 0, ga, 0, 0, 0))
    cost, count = fn(pose_q, pose_t, points, depth_pyr, obs_scale, contrib)
    return jnp.sum(cost), jnp.sum(count)


@partial(jax.jit, static_argnames=("width", "height", "max_radius_px"))
def _occl_splat_batch(pose_q, pose_t, points, radii, width: int, height: int,
                      fx, fy, cx, cy, max_radius_px: int):
    """Splat occlusion depth for a chunk of images in one dispatch."""

    def one(q, t):
        p_cam = SE3(q, t).apply(points)
        return render_splats_depth(p_cam, radii, width, height, fx, fy, cx, cy,
                                   max_radius_px=max_radius_px)

    return jax.vmap(one)(pose_q, pose_t)


def _chunk_indices(n: int, chunk: int, min_bucket: int = 1):
    """Split range(n) into chunks of ``chunk`` plus a power-of-two padded
    remainder: [(idx (nb,), valid (nb,) bool)], keeping the number of
    distinct compiled shapes O(log chunk)."""
    out = []
    start = 0
    while start + chunk <= n:
        idx = np.arange(start, start + chunk)
        out.append((idx, np.ones(chunk, bool)))
        start += chunk
    rem = n - start
    if rem > 0:
        nb = min_bucket
        while nb < rem:
            nb *= 2
        nb = min(nb, chunk)
        idx = np.concatenate([np.arange(start, n),
                              np.full(nb - rem, n - 1, np.int64)])
        valid = np.zeros(nb, bool)
        valid[:rem] = True
        out.append((idx, valid))
    return out


@dataclass
class ImageBatch:
    """One image chunk of one (group, level): pre-gathered static inputs.

    Geometry is the full level's (shared across the chunk) without the
    observations cache, or the stacked per-image compacted views with it.
    """

    idx: np.ndarray  # (nb,) image indices within the group
    valid: np.ndarray  # (nb,) False for padding rows
    row_valid_dev: jnp.ndarray  # (nb,) device copy
    geom_batched: bool
    points: jnp.ndarray  # (M,3) or (nb,M,3)
    neighbors: jnp.ndarray  # (M,K) or (nb,M,K)
    fixed_desc: jnp.ndarray  # (M,K) or (nb,M,K)
    pyr: tuple  # per group scale (nb,H_s,W_s)
    mask_pyr: tuple  # () or per scale (nb,H_s,W_s)
    depth_pyr: Optional[tuple]  # None or per scale (nb,H_s,W_s)
    core: Optional[jnp.ndarray] = None  # (nb,M) candidate rows (views only)
    gather_idx: Optional[jnp.ndarray] = None  # (nb,M) view -> level index
    scatter_idx: Optional[jnp.ndarray] = None  # (nb,M) padded with N
    idx_dev: Optional[jnp.ndarray] = None  # (nb,) device copy of ``idx``

    @property
    def nb(self) -> int:
        return len(self.idx)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


@dataclass
class OptimizerReport:
    iterations: int
    optimum_cost: float
    converged: bool


class PhotometricOptimizer:
    """Coarse-to-fine scale-schedule driver over image groups
    (``opt/optimizer.cc:49-190``).

    Variable layout (``CountAndIndexVariables``, ``.cc:442-473``): one
    intrinsics block per group first, then 6 pose dofs per image, ordered by
    group then image.
    """

    def __init__(self, problem: PhotoProblem, optimize_intrinsics: bool = True,
                 max_radius_px: int = 3, fixed_weight: float = 1.0,
                 variable_weight: float = 0.0, depth_weight: float = 0.0,
                 image_chunk: int = 8, scale_jacobian: bool = True,
                 mesh=None):
        self.depth_weight = depth_weight
        # reference defaults enable BOTH residual types (opt/parameters.h:50-51)
        # but variable colors require the alternation; pass variable_weight=1.0
        # to match the reference's default configuration.
        self.fixed_weight = fixed_weight
        self.variable_weight = variable_weight
        self._var_desc = None
        # image-scale Jacobian chain row (``.cc:1026-1070``)
        self.scale_jacobian = scale_jacobian
        # images per dispatch: bounds both per-dispatch memory (O(chunk*N*V)
        # J storage) and the dispatch count (the remote-relay latency axis)
        self.image_chunk = image_chunk
        # optional device mesh: the H,b accumulation shard_maps the image
        # axis of every chunk over it (parallel/photometric.py); chunks are
        # padded to a multiple of the mesh size
        self.mesh = mesh
        self._kernels = None
        self._chunk_min_bucket = 1
        if mesh is not None:
            from dataset_pipeline_tpu.parallel.photometric import (
                ShardedPhotometricKernels,
            )

            # a multi-axis mesh (e.g. ("hosts","devices"), SURVEY §5)
            # shards the image axis over ALL axes and psums over the tuple
            names = tuple(mesh.axis_names)
            axis = names[0] if len(names) == 1 else names
            self._kernels = ShardedPhotometricKernels(mesh, axis=axis)
            nd = self._kernels.n_devices
            self._chunk_min_bucket = nd
            self.image_chunk = max(nd, (image_chunk + nd - 1) // nd * nd)
        self.__init_rest(problem, optimize_intrinsics, max_radius_px)

    def __init_rest(self, problem: PhotoProblem, optimize_intrinsics: bool,
                    max_radius_px: int):
        self.p = problem
        self.optimize_intrinsics = optimize_intrinsics
        self.max_radius_px = max_radius_px
        self.current_scale = problem.scale_count - 1
        self.lam = 64.0
        self._frozen_vis = None
        self.obs_cache = None
        # drift guardrail (see ``obs_cache_hit_rate``)
        self.obs_cache_min_hit_rate = 0.98
        self.obs_cache_check_interval = 10
        self.obs_cache_hit_log: List[float] = []
        self._obs_cache_save_path = None
        self._sync_dependent_poses()
        self._build_batches()

    # -- image chunking --------------------------------------------------------

    def _make_batch(self, gi: int, g, l: int, idx: np.ndarray,
                    valid: np.ndarray, views) -> ImageBatch:
        level = self.p.levels[l]
        idx_dev = jnp.asarray(idx.astype(np.int32))
        pyr = tuple(g.pyramid[s][idx_dev] for s in range(g.level_count))
        mask_pyr = ()
        if getattr(g, "mask_pyramid", None):
            mask_pyr = tuple(mp[idx_dev] for mp in g.mask_pyramid)
        depth_pyr = None
        if self.p.depth_map_pyramids is not None:
            depth_pyr = tuple(self.p.depth_map_pyramids[gi][s][idx_dev]
                              for s in range(g.level_count))
        if views is None:
            batch = ImageBatch(idx, valid, jnp.asarray(valid), False,
                               level.points, level.neighbors,
                               level.fixed_descriptors, pyr, mask_pyr,
                               depth_pyr)
        else:
            batch = ImageBatch(
                idx, valid, jnp.asarray(valid), True,
                jnp.stack([v.points for v in views]),
                jnp.stack([v.neighbors for v in views]),
                jnp.stack([v.fixed_descriptors for v in views]),
                pyr, mask_pyr, depth_pyr,
                core=jnp.stack([v.core for v in views]),
                gather_idx=jnp.stack([v.gather_idx for v in views]),
                scatter_idx=jnp.stack([v.scatter_idx for v in views]),
            )
        batch.idx_dev = idx_dev
        return batch

    def _build_batches(self):
        """Pre-gather per-(group, level) image chunks — the static inputs of
        the batched dispatch layer. Rebuilt when the observations cache is
        (re)built, since the cache swaps geometry for compacted views."""
        self._batches = {}
        self._batch_row = {}
        for gi, g in enumerate(self.p.groups):
            for l in range(len(self.p.levels)):
                batches = []
                if self.obs_cache is None:
                    for idx, valid in _chunk_indices(g.num_images,
                                                     self.image_chunk,
                                                     self._chunk_min_bucket):
                        batches.append(self._make_batch(gi, g, l, idx, valid,
                                                        None))
                else:
                    # images with equal view bucket sizes share shapes
                    by_size = {}
                    for b in range(g.num_images):
                        v = self.obs_cache.view(gi, b, l)
                        by_size.setdefault(v.size, []).append(b)
                    for size in sorted(by_size):
                        imgs = np.asarray(by_size[size])
                        for rel, valid in _chunk_indices(len(imgs),
                                                         self.image_chunk,
                                                         self._chunk_min_bucket):
                            idx = imgs[rel]
                            views = [self.obs_cache.view(gi, int(b), l)
                                     for b in idx]
                            batches.append(self._make_batch(gi, g, l, idx,
                                                            valid, views))
                rowmap = {}
                for bi, batch in enumerate(batches):
                    for j in range(batch.nb):
                        if batch.valid[j]:
                            rowmap[int(batch.idx[j])] = (bi, j)
                self._batches[(gi, l)] = batches
                self._batch_row[(gi, l)] = rowmap

    # -- observations cache ----------------------------------------------------

    def build_observations_cache(self, save_path: str = None,
                                 load_path: str = None):
        """Compute (or load) per-image candidate-point views and use them for
        all subsequent iterations (``opt/observations_cache.cc``; enabled
        after the first scale by ``exe/image_registrator.cc:230-235``).

        Candidates come from the LOOSEST gate of the schedule
        (``current_scale = 0``) with doubled occlusion slack and no mask
        filter, so they are a superset of later observations up to pose
        drift — the approximation the reference makes too.
        """
        from dataset_pipeline_tpu.photometric.obs_cache import ObservationsCache

        if load_path is not None:
            cache = ObservationsCache.load(load_path, self.p.levels)
            if cache is not None:
                # remember where the cache lives so a drift-triggered rebuild
                # (_check_obs_cache_drift) overwrites the stale file on disk
                self._obs_cache_save_path = save_path or load_path
                self.obs_cache = cache
                self._frozen_vis = None
                self._build_batches()
                return cache
        self._obs_cache_save_path = save_path
        cache = ObservationsCache()
        occl = self._occlusion_depths()
        for gi, g in enumerate(self.p.groups):
            cam = g.camera
            for l, level in enumerate(self.p.levels):
                for idx, valid in _chunk_indices(g.num_images,
                                                 self.image_chunk):
                    idxd = jnp.asarray(idx.astype(np.int32))
                    m, _ = _visibility_batch(
                        cam, g.poses.q[idxd], g.poses.t[idxd], level.points,
                        jnp.asarray(level.radius, jnp.float32),
                        occl[gi][idxd],
                        jnp.asarray(0.0, jnp.float32),
                        g.level_count, cam.width, cam.height,
                        jnp.asarray(2.0 * self.p.occlusion_depth_threshold,
                                    jnp.float32),
                        jnp.asarray(0.05, jnp.float32),
                        geom_batched=False,
                    )
                    m_np = np.asarray(m)
                    for j in np.flatnonzero(valid):
                        cache.set_candidates(gi, int(idx[j]), l, level,
                                             m_np[j])
        self.obs_cache = cache
        self._frozen_vis = None
        self._build_batches()
        if save_path is not None:
            cache.save(save_path, self.p.levels)
        return cache

    def obs_cache_hit_rate(self) -> float:
        """Core hit rate of the observations cache: the fraction of points
        passing a FRESH full-level visibility test (same loose gate the cache
        was built with) that are still inside the cached candidate sets.

        This is the drift guardrail the reference lacks: its cache silently
        assumes poses never move points into view
        (``opt/observations_cache.cc:84-88`` only FATALs on parameter
        mismatch). The scale driver logs this rate periodically and rebuilds
        the cache when it drops below ``obs_cache_min_hit_rate``.
        """
        if self.obs_cache is None:
            return 1.0
        occl = self._occlusion_depths()
        hit = 0
        tot = 0
        for gi, g in enumerate(self.p.groups):
            cam = g.camera
            for l, level in enumerate(self.p.levels):
                for idx, valid in _chunk_indices(g.num_images,
                                                 self.image_chunk):
                    idxd = jnp.asarray(idx.astype(np.int32))
                    m, _ = _visibility_batch(
                        cam, g.poses.q[idxd], g.poses.t[idxd], level.points,
                        jnp.asarray(level.radius, jnp.float32),
                        occl[gi][idxd],
                        jnp.asarray(0.0, jnp.float32),
                        g.level_count, cam.width, cam.height,
                        jnp.asarray(2.0 * self.p.occlusion_depth_threshold,
                                    jnp.float32),
                        jnp.asarray(0.05, jnp.float32),
                        geom_batched=False,
                    )
                    m_np = np.asarray(m)
                    for j in np.flatnonzero(valid):
                        cand = self.obs_cache.candidates(gi, int(idx[j]), l)
                        if cand is None:
                            continue
                        fresh = m_np[j]
                        tot += int(fresh.sum())
                        hit += int((fresh & cand).sum())
        return hit / tot if tot else 1.0

    def _check_obs_cache_drift(self, print_progress: bool = False) -> None:
        """Log the hit rate; rebuild the cache if pose drift invalidated it."""
        rate = self.obs_cache_hit_rate()
        self.obs_cache_hit_log.append(rate)
        if print_progress:
            print(f"  obs-cache core hit rate: {rate:.4f}")
        if rate < self.obs_cache_min_hit_rate:
            if print_progress:
                print(f"  obs-cache hit rate {rate:.4f} < "
                      f"{self.obs_cache_min_hit_rate} — rebuilding cache")
            self.build_observations_cache(save_path=self._obs_cache_save_path)

    def _view(self, gi: int, b: int, l: int):
        if self.obs_cache is None:
            return None
        return self.obs_cache.view(gi, b, l)

    def _geom(self, gi: int, b: int, l: int):
        """(points, neighbors, fixed_descriptors) — the compacted view's when
        the observations cache is active, the full level's otherwise."""
        view = self._view(gi, b, l)
        if view is None:
            level = self.p.levels[l]
            return level.points, level.neighbors, level.fixed_descriptors
        return view.points, view.neighbors, view.fixed_descriptors

    # -- variable indexing ---------------------------------------------------

    def _var_layout(self):
        """[intrinsics blocks][per-rig (ncams-1)*6 extrinsics][per
        non-dependent image 6] — dependent groups own no pose variables."""
        offsets_int = []
        off = 0
        if self.optimize_intrinsics:
            for g in self.p.groups:
                offsets_int.append(off)
                off += int(g.camera.params.shape[0])
        else:
            offsets_int = [None] * len(self.p.groups)
        offsets_rig = []
        for extr in self.p.rig_extrinsics:
            offsets_rig.append(off)
            off += 6 * (int(extr.q.shape[0]) - 1)
        offsets_pose = []
        for g in self.p.groups:
            if g.rig_cam_index > 0:
                offsets_pose.append(None)
            else:
                offsets_pose.append(off)
                off += 6 * g.num_images
        return offsets_int, offsets_rig, offsets_pose, off

    def _sync_dependent_poses(self):
        """Derive dependent groups' poses from extrinsics + reference poses."""
        for g in self.p.groups:
            if g.rig_cam_index > 0:
                ref_g = self.p.groups[g.ref_group]
                extr = self.p.rig_extrinsics[g.rig_id]
                e = SE3(extr.q[g.rig_cam_index], extr.t[g.rig_cam_index])
                slots = jnp.asarray(np.asarray(g.ref_slots, np.int32))
                ref = SE3(ref_g.poses.q[slots], ref_g.poses.t[slots])
                g.poses = e.compose(ref)

    # -- occlusion ----------------------------------------------------------

    def _occlusion_depths(self):
        """Occlusion depth per group, stacked (B,H,W) at the group's full
        resolution: the occlusion mesh (with boundary masking) when present,
        else point splats (``opt/occlusion_geometry.cc`` mesh vs splat
        paths). The splat path renders ``image_chunk`` images per dispatch."""
        out = []
        for g in self.p.groups:
            cam = g.camera
            if self.p.occlusion_mesh is not None:
                from dataset_pipeline_tpu.ops.mesh_raster import (
                    render_occlusion_mesh_depth_batch,
                )

                chunks = []
                for idx, valid in _chunk_indices(g.num_images,
                                                 self.image_chunk):
                    idxd = jnp.asarray(idx.astype(np.int32))
                    d = render_occlusion_mesh_depth_batch(
                        cam, g.poses.q[idxd], g.poses.t[idxd],
                        self.p.occlusion_mesh,
                        splat_radius=self.p.occlusion_radius,
                    )
                    chunks.append(d[: int(valid.sum())])
                out.append(jnp.concatenate(chunks, 0))
                continue
            radii = jnp.full((self.p.occlusion_points.shape[0],),
                             self.p.occlusion_radius, jnp.float32)
            chunks = []
            for idx, valid in _chunk_indices(g.num_images, self.image_chunk):
                idxd = jnp.asarray(idx.astype(np.int32))
                d = _occl_splat_batch(
                    g.poses.q[idxd], g.poses.t[idxd],
                    self.p.occlusion_points, radii,
                    cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy,
                    self.max_radius_px,
                )
                chunks.append(d[: int(valid.sum())])
            out.append(jnp.concatenate(chunks, 0))
        return out

    # -- visibility ----------------------------------------------------------

    def _visibility(self, occl):
        """vis[gi][l][batch_index] = (mask (nb,M), obs_scale (nb,M)) aligned
        with ``self._batches[(gi, l)]``."""
        if self._kernels is None and self.obs_cache is None:
            # all levels of a chunk in ONE dispatch (relay dispatch
            # overhead ~0.2 s dominates the per-level calls)
            return self._visibility_fused(occl)
        vis = []
        for gi, g in enumerate(self.p.groups):
            cam = g.camera
            local_current = max(self.current_scale - g.min_image_scale, 0)
            per_level = []
            for l, level in enumerate(self.p.levels):
                per_batch = []
                for batch in self._batches[(gi, l)]:
                    q = g.poses.q[batch.idx_dev]
                    t = g.poses.t[batch.idx_dev]
                    m, s = _visibility_batch(
                        cam, q, t, batch.points,
                        jnp.asarray(level.radius, jnp.float32),
                        occl[gi][batch.idx_dev],
                        jnp.asarray(local_current, jnp.float32),
                        g.level_count, cam.width, cam.height,
                        jnp.asarray(self.p.occlusion_depth_threshold,
                                    jnp.float32),
                        jnp.asarray(0.05, jnp.float32),
                        geom_batched=batch.geom_batched,
                    )
                    if batch.core is not None:
                        m = m & batch.core
                    m = m & batch.row_valid_dev[:, None]
                    m = _mask_filter_batch(
                        cam, q, t, batch.points, s, m, batch.pyr,
                        batch.mask_pyr,
                        jnp.asarray(self.p.max_valid_intensity, jnp.float32),
                        geom_batched=batch.geom_batched,
                    )
                    per_batch.append((m, s))
                per_level.append(per_batch)
            vis.append(per_level)
        return vis

    def _visibility_fused(self, occl):
        vis = []
        for gi, g in enumerate(self.p.groups):
            cam = g.camera
            local_current = max(self.current_scale - g.min_image_scale, 0)
            n_levels = len(self.p.levels)
            per_level = [[] for _ in range(n_levels)]
            for bi in range(len(self._batches[(gi, 0)])):
                b0 = self._batches[(gi, 0)][bi]
                q = g.poses.q[b0.idx_dev]
                t = g.poses.t[b0.idx_dev]
                level_args = []
                for l, level in enumerate(self.p.levels):
                    batch = self._batches[(gi, l)][bi]
                    level_args.append((
                        batch.points,
                        jnp.asarray(level.radius, jnp.float32),
                        batch.core, batch.pyr, batch.mask_pyr))
                outs = _visibility_mask_levels(
                    cam, q, t, occl[gi][b0.idx_dev], tuple(level_args),
                    jnp.asarray(local_current, jnp.float32),
                    g.level_count, cam.width, cam.height,
                    jnp.asarray(self.p.occlusion_depth_threshold,
                                jnp.float32),
                    jnp.asarray(0.05, jnp.float32),
                    jnp.asarray(self.p.max_valid_intensity, jnp.float32),
                    b0.row_valid_dev,
                )
                for l in range(n_levels):
                    per_level[l].append(outs[l])
            vis.append(per_level)
        return vis

    def _image_pyr(self, gi, b):
        return [self.p.groups[gi].pyramid[s][b]
                for s in range(self.p.groups[gi].level_count)]

    # -- variable descriptors (ColorOptimizer alternation) --------------------

    def _compute_variable_descriptors(self, vis):
        """Mean image-space descriptor per point-neighbor edge over all images
        that fully observe the point (``opt/color_optimizer.cc:40-123``).
        Returns per level (desc (N,K), contributing_mask (N,): obs count>=2)."""
        out = []
        for l, level in enumerate(self.p.levels):
            n, k = level.fixed_descriptors.shape
            desc_sum = jnp.zeros((n, k), jnp.float32)
            count = jnp.zeros((n,), jnp.int32)
            for gi, g in enumerate(self.p.groups):
                for bi, batch in enumerate(self._batches[(gi, l)]):
                    mask, s = vis[gi][l][bi]
                    d, ok = _imgdesc_batch(
                        g.camera, g.camera.params, g.poses.q[batch.idx_dev],
                        g.poses.t[batch.idx_dev], batch.points,
                        batch.neighbors, batch.pyr, s, mask,
                        geom_batched=batch.geom_batched,
                    )
                    if batch.geom_batched:
                        desc_sum, count = _scatter_view_desc(
                            desc_sum, count, d, ok, batch.scatter_idx)
                    else:
                        desc_sum = desc_sum + d
                        count = count + ok
            desc = desc_sum / jnp.maximum(count, 1)[:, None]
            out.append((desc, count >= 2))
        return out

    def _residual_weights(self):
        """Static weights of the active residual types, in set order."""
        weights = []
        if self.fixed_weight > 0:
            weights.append(self.fixed_weight)
        if self.variable_weight > 0 and self._var_desc is not None:
            weights.append(self.variable_weight)
        return weights

    def _batch_residual_sets(self, level_idx: int, batch: ImageBatch):
        """[(descriptors, extra_mask_or_None, static_weight)] per active
        type, on the batch's geometry (stacked views or the shared level)."""
        sets = []
        if self.fixed_weight > 0:
            sets.append((batch.fixed_desc, None, self.fixed_weight))
        if self.variable_weight > 0 and self._var_desc is not None:
            desc, mask2 = self._var_desc[level_idx]
            if batch.geom_batched:
                desc = desc[batch.gather_idx]
                mask2 = mask2[batch.gather_idx]
            else:
                mask2 = mask2[None, :]
            sets.append((desc, mask2, self.variable_weight))
        return sets

    # -- cost -----------------------------------------------------------------

    def _total_cost(self, group_params, group_poses, vis) -> float:
        # weighted mean per residual type (problem.cc:602-631); all terms are
        # dispatched first and fetched in ONE device_get (no per-term sync)
        pend = []
        for gi, g in enumerate(self.p.groups):
            if (self._kernels is None and not self._depth_active(g)
                    and self.obs_cache is None):
                # fused: every (level, type) cost of a chunk in ONE dispatch
                for bi in range(len(self._batches[(gi, 0)])):
                    b0 = self._batches[(gi, 0)][bi]
                    q = group_poses[gi].q[b0.idx_dev]
                    t = group_poses[gi].t[b0.idx_dev]
                    entries = []
                    keys = []
                    for l in range(len(self.p.levels)):
                        batch = self._batches[(gi, l)][bi]
                        mask, sc = vis[gi][l][bi]
                        for ti, (desc, extra, _) in enumerate(
                                self._batch_residual_sets(l, batch)):
                            m = mask if extra is None else (mask & extra)
                            entries.append((batch.points, batch.neighbors,
                                            desc, batch.pyr, sc, m))
                            keys.append(ti)
                    outs = _cost_batch_levels(g.camera, group_params[gi],
                                              q, t, tuple(entries))
                    for k, (c, n) in zip(keys, outs):
                        pend.append((k, c, n))
                continue
            for l in range(len(self.p.levels)):
                for bi, batch in enumerate(self._batches[(gi, l)]):
                    mask, s = vis[gi][l][bi]
                    q = group_poses[gi].q[batch.idx_dev]
                    t = group_poses[gi].t[batch.idx_dev]
                    for ti, (desc, extra, _) in enumerate(
                            self._batch_residual_sets(l, batch)):
                        m = mask if extra is None else (mask & extra)
                        c, n = _cost_batch(
                            g.camera, group_params[gi], q, t, batch.points,
                            batch.neighbors, desc, batch.pyr, s, m,
                            geom_batched=batch.geom_batched,
                        )
                        pend.append((ti, c, n))
                    if self._depth_active(g):
                        c, n = _cost_depth_batch(
                            g.camera, group_params[gi], q, t, batch.points,
                            batch.depth_pyr, s, mask,
                            geom_batched=batch.geom_batched,
                        )
                        pend.append(("depth", c, n))
        fetched = jax.device_get([(c, n) for _, c, n in pend])
        sums, counts = {}, {}
        for (key, _, _), (c, n) in zip(pend, fetched):
            sums[key] = sums.get(key, 0.0) + float(c)
            counts[key] = counts.get(key, 0) + int(n)
        total = 0.0
        weights = self._residual_weights() if self.p.levels else []
        for ti in sums:
            w = self.depth_weight if ti == "depth" else weights[ti]
            total += w * sums[ti] / max(counts[ti], 1)
        return total

    def _depth_active(self, g) -> bool:
        return (self.depth_weight > 0 and self.p.depth_map_pyramids is not None
                and g.rig_cam_index == 0)

    # -- LM step --------------------------------------------------------------

    def _candidate_state(self, x, offsets_int, offsets_rig, offsets_pose):
        """State after applying the (inverted) update vector ``x``
        (``CreateDeltaState``, ``intrinsics_and_pose_optimizer.cc``): new
        per-group intrinsics params, rig extrinsics, and poses (dependent
        groups derived from the candidate extrinsics + reference poses)."""
        new_params = []
        new_extr = []
        for ri, extr in enumerate(self.p.rig_extrinsics):
            orr = offsets_rig[ri]
            ncams = int(extr.q.shape[0])
            deltas = np.zeros((ncams, 6), np.float32)
            deltas[1:] = -x[orr:orr + 6 * (ncams - 1)].reshape(ncams - 1, 6)
            new_extr.append(SE3.exp(jnp.asarray(deltas)).compose(extr))
        new_poses = []
        for gi, g in enumerate(self.p.groups):
            P = int(g.camera.params.shape[0])
            prm = g.camera.params
            if self.optimize_intrinsics:
                oi = offsets_int[gi]
                prm = prm - jnp.asarray(x[oi:oi + P], jnp.float32)
            new_params.append(prm)
            if g.rig_cam_index > 0:
                new_poses.append(None)  # derived below
            else:
                op = offsets_pose[gi]
                deltas = -x[op:op + 6 * g.num_images].reshape(g.num_images, 6)
                dT = SE3.exp(jnp.asarray(deltas.astype(np.float32)))
                new_poses.append(dT.compose(g.poses))
        for gi, g in enumerate(self.p.groups):
            if g.rig_cam_index > 0:
                extr = new_extr[g.rig_id]
                e = SE3(extr.q[g.rig_cam_index], extr.t[g.rig_cam_index])
                slots = jnp.asarray(np.asarray(g.ref_slots, np.int32))
                refp = new_poses[g.ref_group]
                new_poses[gi] = e.compose(SE3(refp.q[slots], refp.t[slots]))
        return new_params, new_extr, new_poses

    def _component_deltas(self, offsets_int, offsets_rig, offsets_pose, V):
        """Per-variable perturbation magnitudes of the numerical validator
        (``CheckForOptimumNumerically``, ``.cc:295-331``): 0.1 for the first
        four intrinsics components, 0.01 for distortion, 1e-3 for
        translations, 5e-4 for rotations."""
        deltas = np.zeros(V, np.float64)
        if self.optimize_intrinsics:
            for gi, g in enumerate(self.p.groups):
                P = int(g.camera.params.shape[0])
                oi = offsets_int[gi]
                deltas[oi:oi + P] = 0.01
                deltas[oi:oi + min(4, P)] = 0.1
        for ri, extr in enumerate(self.p.rig_extrinsics):
            orr = offsets_rig[ri]
            for c in range(int(extr.q.shape[0]) - 1):
                deltas[orr + 6 * c: orr + 6 * c + 3] = 1e-3
                deltas[orr + 6 * c + 3: orr + 6 * c + 6] = 5e-4
        for gi, g in enumerate(self.p.groups):
            if offsets_pose[gi] is None:
                continue
            op = offsets_pose[gi]
            for b in range(g.num_images):
                deltas[op + 6 * b: op + 6 * b + 3] = 1e-3
                deltas[op + 6 * b + 3: op + 6 * b + 6] = 5e-4
        return deltas

    def check_for_optimum_numerically(self, go_to_optimum: bool = False,
                                      immediate_step_threshold: float = 0.05,
                                      print_errors: bool = True) -> bool:
        """Perturb every variable by its validator delta in both directions
        and verify none decreases the cost (``CheckForOptimumNumerically``,
        ``intrinsics_and_pose_optimizer.cc:261-383``). With ``go_to_optimum``
        the best (or first large-step) improving state is applied and False
        returned. Observations stay frozen, as in the reference."""
        offsets_int, offsets_rig, offsets_pose, V = self._var_layout()
        if self._frozen_vis is None:
            self._frozen_vis = self._visibility(self._occlusion_depths())
        vis = self._frozen_vis
        initial = self._total_cost([g.camera.params for g in self.p.groups],
                                   [g.poses for g in self.p.groups], vis)
        deltas = self._component_deltas(offsets_int, offsets_rig, offsets_pose, V)

        def apply_state(x):
            prm, extr, poses = self._candidate_state(
                x, offsets_int, offsets_rig, offsets_pose)
            for gi, g in enumerate(self.p.groups):
                g.camera = g.camera.with_params(prm[gi])
                g.poses = poses[gi]
            self.p.rig_extrinsics = extr

        best_step, best_x = 0.0, None
        for comp in range(V):
            for direction in (-1.0, 1.0):
                x = np.zeros(V, np.float64)
                x[comp] = deltas[comp] * direction
                prm, _, poses = self._candidate_state(
                    x, offsets_int, offsets_rig, offsets_pose)
                cost = self._total_cost(prm, poses, vis)
                if cost < initial:
                    step = initial - cost
                    if print_errors:
                        print(f"not at optimum: component {comp} direction "
                              f"{direction:+.0f} improves cost by {step:.6g}")
                    if go_to_optimum and step >= immediate_step_threshold:
                        apply_state(x)
                        return False
                    if step > best_step:
                        best_step, best_x = step, x
        if go_to_optimum and best_x is not None:
            apply_state(best_x)
        return best_x is None

    def _lm_step(self, vis):
        """One full LM step (accumulate + damped ladder), kept as the
        composition of the two phases for tools/tests."""
        H, bb, initial, offsets = self._lm_accumulate(vis)
        return self._lm_solve_apply(H, bb, initial, offsets, vis)

    def _lm_accumulate(self, vis):
        """Phases 1-2 of the LM step: dispatch every (chunk, level, type)
        H,b accumulation, assemble the big f64 system, and return the
        weighted-mean ENTRY cost — the same quantity ``_total_cost``
        computes, obtained from the same dispatches for free (the schedule
        loop uses it for optimum tracking instead of a separate cost
        pass)."""
        offsets_int, offsets_rig, offsets_pose, V = self._var_layout()
        H = np.zeros((V, V), np.float64)
        bb = np.zeros(V, np.float64)
        self._lm_cost_sums = [(0.0, 0) for _ in self._residual_weights()]
        self._lm_depth_sums = (0.0, 0)

        def scatter(Hb, bvec, col_slices):
            """Accumulate a small symmetric block into the big system.
            ``col_slices``: list of (big_slice, small_start, small_len)."""
            for (sa, a0, la) in col_slices:
                bb[sa] += bvec[a0:a0 + la]
                for (sb, b0, lb) in col_slices:
                    H[sa, sb] += Hb[a0:a0 + la, b0:b0 + lb]

        # phase 1: dispatch every (chunk, level, type) accumulation; results
        # stay on device (one _hb_batch per chunk instead of one _hb_one per
        # image — the reference's per-image CPU loop,
        # ``intrinsics_and_pose_optimizer.cc:624-720``, turned into a vmapped
        # dispatch whose image axis is also the mesh-sharding axis)
        pend = []
        for gi, g in enumerate(self.p.groups):
            P = int(g.camera.params.shape[0])
            nint = P if self.optimize_intrinsics else 0
            dependent = g.rig_cam_index > 0
            if (self._kernels is None and not dependent
                    and not self._depth_active(g)
                    and self.obs_cache is None):
                # all (level, type) accumulations of a chunk in ONE
                # dispatch (each relay dispatch costs ~0.2 s)
                for bi in range(len(self._batches[(gi, 0)])):
                    b0 = self._batches[(gi, 0)][bi]
                    q = g.poses.q[b0.idx_dev]
                    t = g.poses.t[b0.idx_dev]
                    entries = []
                    metas = []
                    for l, level in enumerate(self.p.levels):
                        batch = self._batches[(gi, l)][bi]
                        mask, sc = vis[gi][l][bi]
                        radius = jnp.asarray(level.radius, jnp.float32)
                        for ti, (desc, extra, w_t) in enumerate(
                                self._batch_residual_sets(l, batch)):
                            m = mask if extra is None else (mask & extra)
                            entries.append((batch.points, batch.neighbors,
                                            desc, batch.pyr, sc, m, radius))
                            metas.append(dict(kind="plain", gi=gi, ti=ti,
                                              w=w_t, batch=batch, nint=nint,
                                              P=P))
                    outs = _hb_batch_levels(
                        g.camera, g.camera.params, q, t, tuple(entries),
                        self.optimize_intrinsics, self.scale_jacobian)
                    pend.extend(zip(metas, outs))
                continue
            for l, level in enumerate(self.p.levels):
                radius = jnp.asarray(level.radius, jnp.float32)
                for bi, batch in enumerate(self._batches[(gi, l)]):
                    mask, s = vis[gi][l][bi]
                    for ti, (desc, extra, w_t) in enumerate(
                            self._batch_residual_sets(l, batch)):
                        m = mask if extra is None else (mask & extra)
                        if dependent:
                            ref_g = self.p.groups[g.ref_group]
                            extr = self.p.rig_extrinsics[g.rig_id]
                            slots = np.asarray(g.ref_slots)[batch.idx]
                            slots_dev = jnp.asarray(slots.astype(np.int32))
                            hb_rig = (self._kernels.hb_rig_batch
                                      if self._kernels else _hb_rig_batch)
                            out = hb_rig(
                                g.camera, g.camera.params,
                                extr.q[g.rig_cam_index],
                                extr.t[g.rig_cam_index],
                                ref_g.poses.q[slots_dev],
                                ref_g.poses.t[slots_dev],
                                batch.points, batch.neighbors, desc,
                                batch.pyr, s, m, radius,
                                self.optimize_intrinsics, self.scale_jacobian,
                                geom_batched=batch.geom_batched,
                            )
                            meta = dict(kind="rig", gi=gi, ti=ti, w=w_t,
                                        slots=slots, batch=batch, nint=nint,
                                        P=P)
                        else:
                            hb = (self._kernels.hb_batch
                                  if self._kernels else _hb_batch)
                            out = hb(
                                g.camera, g.camera.params,
                                g.poses.q[batch.idx_dev],
                                g.poses.t[batch.idx_dev],
                                batch.points, batch.neighbors, desc,
                                batch.pyr, s, m, radius,
                                self.optimize_intrinsics, self.scale_jacobian,
                                geom_batched=batch.geom_batched,
                            )
                            meta = dict(kind="plain", gi=gi, ti=ti, w=w_t,
                                        batch=batch, nint=nint, P=P)
                        pend.append((meta, out))
                    if self._depth_active(g):
                        hb_depth = (self._kernels.hb_depth_batch
                                    if self._kernels else _hb_depth_batch)
                        out = hb_depth(
                            g.camera, g.camera.params,
                            g.poses.q[batch.idx_dev],
                            g.poses.t[batch.idx_dev],
                            batch.points, batch.depth_pyr, s, mask,
                            self.optimize_intrinsics,
                            geom_batched=batch.geom_batched,
                        )
                        meta = dict(kind="plain", gi=gi, ti="depth",
                                    w=self.depth_weight, batch=batch,
                                    nint=nint, P=P)
                        pend.append((meta, out))

        # phase 2: ONE host fetch, then assemble the big system in numpy
        fetched = jax.device_get([out for _, out in pend])
        for (meta, _), (Hc, bc, c, n) in zip(pend, fetched):
            gi = meta["gi"]
            g = self.p.groups[gi]
            batch = meta["batch"]
            nint, P, w_t = meta["nint"], meta["P"], meta["w"]
            oi = offsets_int[gi]
            Hc = np.asarray(Hc, np.float64)
            bc = np.asarray(bc, np.float64)
            for j in range(batch.nb):
                if not batch.valid[j]:
                    continue
                slices = []
                if nint:
                    slices.append((slice(oi, oi + P), 0, P))
                if meta["kind"] == "rig":
                    oe = offsets_rig[g.rig_id] + 6 * (g.rig_cam_index - 1)
                    orf = offsets_pose[g.ref_group] + 6 * int(meta["slots"][j])
                    slices.append((slice(oe, oe + 6), nint, 6))
                    slices.append((slice(orf, orf + 6), nint + 6, 6))
                else:
                    op = offsets_pose[gi] + 6 * int(batch.idx[j])
                    slices.append((slice(op, op + 6), nint, 6))
                scatter(w_t * Hc[j], w_t * bc[j], slices)
            if meta["ti"] == "depth":
                self._lm_depth_sums = (self._lm_depth_sums[0] + float(c),
                                       self._lm_depth_sums[1] + int(n))
            else:
                ti = meta["ti"]
                self._lm_cost_sums[ti] = (self._lm_cost_sums[ti][0] + float(c),
                                          self._lm_cost_sums[ti][1] + int(n))
        weights = self._residual_weights()
        initial = sum(
            w * s_ / max(n_, 1)
            for w, (s_, n_) in zip(weights, self._lm_cost_sums)
        )
        if self._lm_depth_sums[1] > 0:
            initial += self.depth_weight * self._lm_depth_sums[0] / self._lm_depth_sums[1]
        return H, bb, initial, (offsets_int, offsets_rig, offsets_pose)

    def _lm_solve_apply(self, H, bb, initial, offsets, vis):
        """Phase 3: the damped accept/reject ladder
        (``.cc:197-258`` semantics) over the assembled system."""
        offsets_int, offsets_rig, offsets_pose = offsets
        applied = False
        max_change = 0.0
        for lm_try in range(10):
            Hlm = H.copy()
            d = np.diag(Hlm).copy()
            np.fill_diagonal(Hlm, d * (1.0 + self.lam))
            try:
                x = np.linalg.solve(Hlm, bb)
            except np.linalg.LinAlgError:
                self.lam *= 2.0
                continue
            new_params, new_extr, new_poses = self._candidate_state(
                x, offsets_int, offsets_rig, offsets_pose)
            cand_cost = self._total_cost(new_params, new_poses, vis)
            if cand_cost < initial or lm_try == 9:  # force-apply last try
                for gi, g in enumerate(self.p.groups):
                    g.camera = g.camera.with_params(new_params[gi])
                    g.poses = new_poses[gi]
                self.p.rig_extrinsics = new_extr
                self.lam *= 0.5
                applied = True
                max_change = float(np.max(np.abs(x))) if len(x) else 0.0
                break
            self.lam *= 2.0
        return applied, max_change

    # -- schedule --------------------------------------------------------------

    def run_on_current_scale(self, max_iterations: int = 100,
                             max_change_threshold: float = 1e-6,
                             iterations_without_new_optimum_threshold: int = 15,
                             print_progress: bool = False) -> OptimizerReport:
        # never use the highest image scale (optimizer.cc:59-62)
        self.current_scale = max(0, min(self.current_scale, self.p.scale_count - 2))
        self.lam = 64.0
        optimum_cost = math.inf
        optimum_state = None
        without_new = 0
        converged = False
        it = 0

        def snapshot():
            return ([(g.camera.params, g.poses) for g in self.p.groups],
                    list(self.p.rig_extrinsics))

        def refresh():
            occl = self._occlusion_depths()
            self._frozen_vis = self._visibility(occl)
            if self.variable_weight > 0:
                self._var_desc = self._compute_variable_descriptors(
                    self._frozen_vis)

        # Loop structure (reference ``opt/optimizer.cc:49-182`` semantics,
        # reordered so the H,b accumulation's own cost sums provide the
        # per-iteration tracking cost — the observations are refreshed at
        # the END of each iteration, so the accumulation at the TOP of the
        # next one evaluates exactly what the reference's CostCalculator
        # pass did, without a separate full cost dispatch):
        #   refresh -> [accumulate(H,b,cost) -> track optimum -> ladder ->
        #   refresh]* -> final-state cost -> restore optimum
        refresh()
        state_dirty = False
        applied = True
        max_change = math.inf
        for it in range(max_iterations):
            H, bb, cost, offsets = self._lm_accumulate(self._frozen_vis)
            state_dirty = False
            if print_progress:
                print(f"  scale {self.current_scale} iter {it}: cost {cost:.6f}"
                      f" lam {self.lam:.3g} max_change {max_change:.3g}")
            if cost < optimum_cost:
                optimum_cost = cost
                optimum_state = snapshot()
                without_new = 0
            else:
                without_new += 1
            if without_new >= iterations_without_new_optimum_threshold:
                converged = True
                break
            applied, max_change = self._lm_solve_apply(
                H, bb, cost, offsets, self._frozen_vis)
            state_dirty = applied
            if (self.obs_cache is not None
                    and (it + 1) % self.obs_cache_check_interval == 0):
                self._check_obs_cache_drift(print_progress)
            refresh()
            if (not applied) or max_change < max_change_threshold:
                converged = True
                break
        if state_dirty:
            # the final applied state has not been cost-evaluated yet;
            # include it in the optimum tracking (the old loop shape did)
            cost = self._total_cost(
                [g.camera.params for g in self.p.groups],
                [g.poses for g in self.p.groups],
                self._frozen_vis,
            )
            if print_progress:
                print(f"  scale {self.current_scale} final: cost {cost:.6f}")
            if cost < optimum_cost:
                optimum_cost = cost
                optimum_state = snapshot()
        if optimum_state is not None:
            group_state, rig_state = optimum_state
            for gi, g in enumerate(self.p.groups):
                g.camera = g.camera.with_params(group_state[gi][0])
                g.poses = group_state[gi][1]
            self.p.rig_extrinsics = rig_state
        return OptimizerReport(it + 1, optimum_cost, converged)

    def next_scale(self) -> bool:
        if self.current_scale == 0:
            return False
        self.current_scale -= 1
        return True

    def run(self, max_iterations_per_scale: int = 100, print_progress: bool = False,
            on_scale_done=None):
        """Full coarse-to-fine schedule down to scale 0."""
        self.current_scale = self.p.scale_count - 2
        while True:
            report = self.run_on_current_scale(max_iterations_per_scale,
                                               print_progress=print_progress)
            if on_scale_done is not None:
                on_scale_done(self, report)
            if not self.next_scale():
                break
        return self.p

    # -- diagnostics ---------------------------------------------------------

    def render_cost_image(self, gi: int, b: int, which: str = "fixed",
                          vis=None) -> np.ndarray:
        """Per-pixel point-cost visualization: the GUI's cost fixed /
        variable / combined display modes
        (``dataset_inspector/gui_main_window.h:47-61``). Every fully observed
        point's robust residual rho is written at its projected full-res
        pixel, nearest point winning the z-test; NaN where no point lands.
        """
        if which not in ("fixed", "variable", "combined"):
            raise ValueError(f"unknown cost mode: {which}")
        if vis is None:
            vis = self._visibility(self._occlusion_depths())
        var_desc = None
        if which in ("variable", "combined"):
            if self._var_desc is not None:
                var_desc = self._var_desc
            else:
                var_desc = self._compute_variable_descriptors(vis)
        g = self.p.groups[gi]
        cam = g.camera
        pyr = self._image_pyr(gi, b)
        cost_img = np.full((cam.height, cam.width), np.nan, np.float32)
        depth_img = np.full((cam.height, cam.width), np.inf, np.float32)
        pose = SE3(g.poses.q[b], g.poses.t[b])
        for l in range(len(self.p.levels)):
            bi, j = self._batch_row[(gi, l)][b]
            m_rows, s_rows = vis[gi][l][bi]
            mask, s = m_rows[j], s_rows[j]
            pts, nbr, fixed_desc = self._geom(gi, b, l)
            rho = jnp.zeros(pts.shape[0], jnp.float32)
            ok = None
            # each component is masked individually: a point valid in only
            # one residual type must not pick up the other's clamped-sample
            # garbage (interpolate.py computes values from clamped indices)
            if which in ("fixed", "combined"):
                r_f, ok_f = _point_costs_one(
                    cam, cam.params, g.poses.q[b], g.poses.t[b], pts, nbr,
                    fixed_desc, pyr, s, mask, g.level_count)
                rho = rho + self.fixed_weight * jnp.where(ok_f, r_f, 0.0)
                ok = ok_f
            if which in ("variable", "combined"):
                desc, mask2 = var_desc[l]
                view = self._view(gi, b, l)
                if view is not None:
                    desc = desc[view.gather_idx]
                    mask2 = mask2[view.gather_idx]
                r_v, ok_v = _point_costs_one(
                    cam, cam.params, g.poses.q[b], g.poses.t[b], pts, nbr,
                    desc, pyr, s, mask & mask2, g.level_count)
                w_v = (self.variable_weight
                       if (which == "combined" and self.variable_weight > 0)
                       else 1.0)
                rho = rho + w_v * jnp.where(ok_v, r_v, 0.0)
                ok = ok_v if ok is None else (ok | ok_v)
            p_cam = np.asarray(pose.apply(pts))
            pix, pv = cm.project(cam, jnp.asarray(p_cam))
            pix, pv = np.asarray(pix), np.asarray(pv)
            sel = np.asarray(ok) & pv
            ix = np.floor(pix[:, 0] + 0.5).astype(np.int64)
            iy = np.floor(pix[:, 1] + 0.5).astype(np.int64)
            sel &= (ix >= 0) & (iy >= 0) & (ix < cam.width) & (iy < cam.height)
            z = p_cam[:, 2]
            order = np.argsort(-z[sel])  # nearest assigned last -> wins
            ixs, iys = ix[sel][order], iy[sel][order]
            closer = z[sel][order] <= depth_img[iys, ixs]
            cost_img[iys[closer], ixs[closer]] = np.asarray(rho)[sel][order][closer]
            depth_img[iys[closer], ixs[closer]] = z[sel][order][closer]
        return cost_img
