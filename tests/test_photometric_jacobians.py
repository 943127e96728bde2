"""Photometric optimizer Jacobian numerical-twin tests.

Mirror of the reference's ``Test_IntrinsicsAndPoseOptimizer`` binary
(``opt/test/test_intrinsics_and_pose_optimizer.cc:101,338``): the analytic
(here: forward-mode autodiff) Jacobians of the full residual chain —
sample(pyramid, project(intrinsics, exp(eps) * pose * point)) — are checked
against central differences, for plain and rig-dependent images, and the
assembled H,b of ``_hb_one`` is reconstructed from the numerical Jacobians.

Accesses module-private helpers directly, the equivalent of the reference's
friend/test-helper hooks (SURVEY.md §4 pattern v).
"""

import numpy as np
import jax
import jax.numpy as jnp

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.ops.robust import DEFAULT_COLOR_HUBER, huber_rho, huber_weight
from dataset_pipeline_tpu.photometric.problem import build_image_pyramid
from dataset_pipeline_tpu.photometric.optimizer import (
    _hb_one,
    _hb_one_rig,
    _point_intensities,
)

W, H, SCALES = 64, 48, 3
PARAMS = np.asarray([60.0, 60.0, 31.5, 23.5], np.float32)


def _scene(image_fn, n=40, seed=0, pose_mag=0.01):
    """Synthetic scene: camera, per-plane pyramid, global points whose
    camera-frame projections are well inside the image, a near-identity pose."""
    rng = np.random.RandomState(seed)
    cam = cm.make_camera("PINHOLE", W, H, PARAMS)
    y, x = np.mgrid[0:H, 0:W]
    img = image_fn(x.astype(np.float32), y.astype(np.float32)).astype(np.float32)
    # pass float intensities straight through (uint8 quantization would put
    # kinks into the "linear image" cases)
    pyr_b = build_image_pyramid(img[None], SCALES)
    pyr = [p[0] for p in pyr_b]

    u = rng.uniform(10, W - 10, n)
    v = rng.uniform(8, H - 8, n)
    z = rng.uniform(2.0, 6.0, n)
    p_cam = np.stack([(u - PARAMS[2]) / PARAMS[0] * z,
                      (v - PARAMS[3]) / PARAMS[1] * z, z], -1).astype(np.float32)
    eps_true = (pose_mag * rng.randn(6)).astype(np.float32)
    pose = SE3.exp(jnp.asarray(eps_true))
    pts = pose.inverse().apply(jnp.asarray(p_cam))
    obs_scale = jnp.asarray(rng.uniform(0.2, 0.8, n).astype(np.float32))
    nbr = jnp.asarray(np.stack([(np.arange(n) + 1) % n, (np.arange(n) + 2) % n], -1)
                      .astype(np.int32))
    desc = jnp.zeros((n, 2), jnp.float32)
    return cam, pyr, pts, pose, obs_scale, nbr, desc


def _residual_fn(cam, pyr, pts, pose, obs_scale, nbr, desc):
    q0, t0 = pose.q, pose.t

    def res(eps, prm):
        p2 = SE3.exp(eps).compose(SE3(q0, t0))
        inten, _ = _point_intensities(cam, prm, p2.q, p2.t, pts, pyr, obs_scale)
        return (inten[nbr] - inten[:, None]) - desc

    return res


def _numeric_jac(f, x0, h_each):
    cols = []
    x0 = np.asarray(x0, np.float32)
    for d in range(len(x0)):
        e = x0.copy()
        e[d] += h_each[d]
        rp = np.asarray(f(jnp.asarray(e)), np.float64)
        e[d] -= 2 * h_each[d]
        rm = np.asarray(f(jnp.asarray(e)), np.float64)
        cols.append((rp - rm) / (2 * h_each[d]))
    return np.stack(cols, -1)


def test_pose_and_intrinsics_jacobians_linear_image():
    """On a globally linear image the sampled intensity is an exactly smooth
    function of the projection, so central differences must match tightly."""
    cam, pyr, pts, pose, obs, nbr, desc = _scene(
        lambda x, y: 60 + 0.8 * x + 0.5 * y)
    res = _residual_fn(cam, pyr, pts, pose, obs, nbr, desc)
    params = jnp.asarray(PARAMS)

    J_pose, J_int = jax.jacfwd(res, argnums=(0, 1))(jnp.zeros(6, jnp.float32), params)

    Jn_pose = _numeric_jac(lambda e: res(e, params), np.zeros(6), [1e-3] * 6)
    Jn_int = _numeric_jac(lambda p: res(jnp.zeros(6, jnp.float32), p),
                          PARAMS, [1e-2] * 4)
    a = np.asarray(J_pose, np.float64).reshape(-1, 6)
    b = Jn_pose.reshape(-1, 6)
    assert np.abs(a - b).max() < 0.05 + 0.01 * np.abs(b).max()
    a = np.asarray(J_int, np.float64).reshape(-1, 4)
    b = Jn_int.reshape(-1, 4)
    assert np.abs(a - b).max() < 0.05 + 0.01 * np.abs(b).max()


def test_jacobians_textured_image_mostly_match():
    """Generic texture: trilinear sampling is piecewise smooth, so a few
    samples straddle lattice kinks; require the bulk to match (the reference
    checks each component at eps=1e-3 on its own synthetic textures)."""
    cam, pyr, pts, pose, obs, nbr, desc = _scene(
        lambda x, y: 128 + 60 * np.sin(x / 5.0) * np.cos(y / 4.0), seed=1)
    res = _residual_fn(cam, pyr, pts, pose, obs, nbr, desc)
    params = jnp.asarray(PARAMS)
    J_pose = jax.jacfwd(res, argnums=0)(jnp.zeros(6, jnp.float32), params)
    Jn_pose = _numeric_jac(lambda e: res(e, params), np.zeros(6), [1e-3] * 6)
    a = np.asarray(J_pose, np.float64).reshape(-1)
    b = Jn_pose.reshape(-1)
    rel = np.abs(a - b) / (np.abs(b) + 1.0)
    assert np.percentile(rel, 90) < 0.05
    assert np.median(rel) < 0.01


def test_rig_dependent_jacobians():
    """Rig-dependent image: pose = extr . ref; check both tangent blocks
    (``test_intrinsics_and_pose_optimizer.cc:338`` rig case)."""
    cam, pyr, pts, pose, obs, nbr, desc = _scene(
        lambda x, y: 60 + 0.8 * x + 0.5 * y, seed=2)
    rng = np.random.RandomState(4)
    e_extr = jnp.asarray((0.005 * rng.randn(6)).astype(np.float32))
    extr = SE3.exp(e_extr)
    ref = extr.inverse().compose(pose)  # so extr . ref == pose (points stay visible)

    def res(eps_e, eps_r, prm):
        ex = SE3.exp(eps_e).compose(SE3(extr.q, extr.t))
        rf = SE3.exp(eps_r).compose(SE3(ref.q, ref.t))
        p2 = ex.compose(rf)
        inten, _ = _point_intensities(cam, prm, p2.q, p2.t, pts, pyr, obs)
        return (inten[nbr] - inten[:, None]) - desc

    z6 = jnp.zeros(6, jnp.float32)
    params = jnp.asarray(PARAMS)
    J_e, J_r = jax.jacfwd(res, argnums=(0, 1))(z6, z6, params)
    Jn_e = _numeric_jac(lambda e: res(e, z6, params), np.zeros(6), [1e-3] * 6)
    Jn_r = _numeric_jac(lambda e: res(z6, e, params), np.zeros(6), [1e-3] * 6)
    for a, b in ((J_e, Jn_e), (J_r, Jn_r)):
        a = np.asarray(a, np.float64).reshape(-1, 6)
        b = b.reshape(-1, 6)
        assert np.abs(a - b).max() < 0.05 + 0.01 * np.abs(b).max()


def test_hb_assembly_matches_numeric_reconstruction():
    """H = sum_i w_i J_i^T J_i and b = sum_i w_i J_i^T r_i with Huber weights
    on the per-point descriptor norm (``AccumulateOnHAndB``, ``.cc:1219-1296``)."""
    cam, pyr, pts, pose, obs, nbr, desc = _scene(
        lambda x, y: 60 + 0.8 * x + 0.5 * y, seed=3)
    n = pts.shape[0]
    params = jnp.asarray(PARAMS)
    mask = jnp.ones(n, bool)
    Hm, bm, cost, count = _hb_one(cam, params, pose.q, pose.t, pts, nbr, desc,
                                  pyr, obs, mask, scale_count=SCALES,
                                  optimize_intrinsics=True)
    assert int(count) == n  # all points interior by construction

    res = _residual_fn(cam, pyr, pts, pose, obs, nbr, desc)
    r0 = np.asarray(res(jnp.zeros(6, jnp.float32), params), np.float64)
    Jn_pose = _numeric_jac(lambda e: res(e, params), np.zeros(6), [1e-3] * 6)
    Jn_int = _numeric_jac(lambda p: res(jnp.zeros(6, jnp.float32), p),
                          PARAMS, [1e-2] * 4)
    rows = np.concatenate([Jn_int, Jn_pose], -1).reshape(n * 2, 10)

    norm = np.sqrt(np.maximum((r0 ** 2).sum(-1), 1e-20))
    w = np.asarray(huber_weight(jnp.asarray(norm), DEFAULT_COLOR_HUBER), np.float64)
    sw = np.sqrt(np.repeat(w, 2))
    rows_w = rows * sw[:, None]
    r_w = r0.reshape(-1) * sw
    Hn = rows_w.T @ rows_w
    bn = rows_w.T @ r_w
    rhon = np.asarray(huber_rho(jnp.asarray(norm), DEFAULT_COLOR_HUBER)).sum()

    scale = np.abs(Hn).max()
    assert np.abs(np.asarray(Hm, np.float64) - Hn).max() < 0.02 * scale
    assert np.abs(np.asarray(bm, np.float64) - bn).max() < 0.02 * max(np.abs(bn).max(), 1.0)
    assert abs(float(cost) - rhon) < 0.01 * max(abs(rhon), 1.0)


def _linear_scale_pyramid(A=60.0, B=0.8, C=0.5, D=12.0):
    """Hand-built pyramid where level l equals A + B*x0 + C*y0 + D*l in
    BASE-level coordinates (x0 = 2^l x_l + (2^l-1)/2, the ``x1=2(x0+0.5)-0.5``
    convention, ``interpolate_trilinear.h``). Trilinear sampling of it is
    EXACTLY A + B*x0 + C*y0 + D*s — linear in the scale — so central
    differences of the scale-carrying chain are exact."""
    pyr = []
    for l in range(SCALES):
        h, w = H >> l, W >> l
        yl, xl = np.mgrid[0:h, 0:w].astype(np.float32)
        x0 = (2 ** l) * xl + (2 ** l - 1) * 0.5
        y0 = (2 ** l) * yl + (2 ** l - 1) * 0.5
        pyr.append(jnp.asarray(A + B * x0 + C * y0 + D * l))
    return pyr


def test_dynamic_scale_jacobian_numerical_twin():
    """The image-scale Jacobian row (``dynamic_scale=True``): the analytic
    derivative of ``_intensity_ok`` — which anchors the VALUE at the frozen
    observation scale but carries d(intensity)/d(scale) * d(scale)/d(state)
    through the footprint chain — must match central differences of the
    explicitly scale-carrying evaluation (the reference's third chain-rule
    term, ``intrinsics_and_pose_optimizer.cc:1026-1070``)."""
    from dataset_pipeline_tpu.photometric.optimizer import (
        _footprint_scale,
        _intensity_ok,
    )

    cam, _, pts, pose, obs, nbr, desc = _scene(
        lambda x, y: 60 + 0.8 * x + 0.5 * y, seed=5)
    pyr = _linear_scale_pyramid()
    params = jnp.asarray(PARAMS)
    radius = 0.05

    def inten_dyn(eps, prm):
        p2 = SE3.exp(eps).compose(SE3(pose.q, pose.t))
        val, _ = _intensity_ok(cam, prm, p2, pts, pyr, obs, radius,
                               dynamic_scale=True)
        return val

    z6 = jnp.zeros(6, jnp.float32)
    J_pose, J_int = jax.jacfwd(inten_dyn, argnums=(0, 1))(z6, params)

    # numeric twin: intensity sampled at the scale the footprint formula
    # assigns under the PERTURBED state (value-anchored at obs)
    fp0 = _footprint_scale(cam, params, pose, pts, radius)

    def f(eps, prm):
        p2 = SE3.exp(eps).compose(SE3(pose.q, pose.t))
        s = obs + _footprint_scale(cam, prm, p2, pts, radius) - fp0
        from dataset_pipeline_tpu.photometric.optimizer import (
            _point_intensities,
        )
        inten, _ = _point_intensities(cam, prm, p2.q, p2.t, pts, pyr, s)
        return inten

    # larger steps than the static tests: the footprint probe's pixel
    # difference is cancellation-prone in f32, so central-difference noise
    # scales like 1/h (truncation stays tiny on the linear pyramid)
    Jn_pose = _numeric_jac(lambda e: f(e, params), np.zeros(6), [8e-3] * 6)
    Jn_int = _numeric_jac(lambda p: f(z6, p), PARAMS, [3e-2] * 4)
    a = np.asarray(J_pose, np.float64)
    assert np.abs(a - Jn_pose).max() < 0.05 + 0.01 * np.abs(Jn_pose).max()
    a = np.asarray(J_int, np.float64)
    assert np.abs(a - Jn_int).max() < 0.05 + 0.01 * np.abs(Jn_int).max()

    # the scale row genuinely contributes: with the static chain the pose
    # Jacobian must differ (translation along z changes the footprint)
    def inten_static(eps, prm):
        p2 = SE3.exp(eps).compose(SE3(pose.q, pose.t))
        val, _ = _intensity_ok(cam, prm, p2, pts, pyr, obs, radius,
                               dynamic_scale=False)
        return val

    J_static = jax.jacfwd(inten_static, argnums=0)(z6, params)
    diff = np.abs(np.asarray(J_pose) - np.asarray(J_static)).max()
    assert diff > 1.0, f"scale row contributed nothing: {diff}"


def test_hb_dynamic_scale_matches_numeric_reconstruction():
    """``_hb_one(..., dynamic_scale=True)`` — the production default path —
    reconstructed from numerical Jacobians of the scale-carrying residual
    chain (closing the r2 blind spot: the twin sees the scale row)."""
    from dataset_pipeline_tpu.photometric.optimizer import _footprint_scale

    cam, _, pts, pose, obs, nbr, desc = _scene(
        lambda x, y: 60 + 0.8 * x + 0.5 * y, seed=6)
    pyr = _linear_scale_pyramid()
    n = pts.shape[0]
    params = jnp.asarray(PARAMS)
    mask = jnp.ones(n, bool)
    radius = 0.05
    Hm, bm, cost, count = _hb_one(cam, params, pose.q, pose.t, pts, nbr, desc,
                                  pyr, obs, mask, scale_count=SCALES,
                                  optimize_intrinsics=True, radius=radius,
                                  dynamic_scale=True)
    assert int(count) == n

    fp0 = _footprint_scale(cam, params, pose, pts, radius)

    def res(eps, prm):
        p2 = SE3.exp(eps).compose(SE3(pose.q, pose.t))
        s = obs + _footprint_scale(cam, prm, p2, pts, radius) - fp0
        inten, _ = _point_intensities(cam, prm, p2.q, p2.t, pts, pyr, s)
        return (inten[nbr] - inten[:, None]) - desc

    z6 = jnp.zeros(6, jnp.float32)
    r0 = np.asarray(res(z6, params), np.float64)
    Jn_pose = _numeric_jac(lambda e: res(e, params), np.zeros(6), [8e-3] * 6)
    Jn_int = _numeric_jac(lambda p: res(z6, p), PARAMS, [3e-2] * 4)
    rows = np.concatenate([Jn_int, Jn_pose], -1).reshape(n * 2, 10)

    norm = np.sqrt(np.maximum((r0 ** 2).sum(-1), 1e-20))
    w = np.asarray(huber_weight(jnp.asarray(norm), DEFAULT_COLOR_HUBER), np.float64)
    sw = np.sqrt(np.repeat(w, 2))
    rows_w = rows * sw[:, None]
    Hn = rows_w.T @ rows_w
    bn = rows_w.T @ (r0.reshape(-1) * sw)

    scale = np.abs(Hn).max()
    assert np.abs(np.asarray(Hm, np.float64) - Hn).max() < 0.02 * scale
    assert np.abs(np.asarray(bm, np.float64) - bn).max() < 0.02 * max(np.abs(bn).max(), 1.0)


def test_check_for_optimum_numerically():
    """Runtime validator (``CheckForOptimumNumerically``, ``.cc:261-383``):
    at a perturbed state it must flag an improving direction, and with
    ``go_to_optimum`` applying it must reduce the frozen-visibility cost."""
    from dataset_pipeline_tpu.photometric.optimizer import PhotometricOptimizer
    from scenes import synthetic_two_frame_problem

    problem = synthetic_two_frame_problem()
    opt = PhotometricOptimizer(problem, optimize_intrinsics=False)
    opt.current_scale = 0
    # perturb image 1's pose well beyond the validator deltas
    g = problem.groups[0]
    d = np.zeros((2, 6), np.float32)
    d[1] = [0.01, -0.008, 0.006, 0.004, -0.003, 0.005]
    g.poses = SE3.exp(jnp.asarray(d)).compose(g.poses)
    opt._frozen_vis = opt._visibility(opt._occlusion_depths())

    vis = opt._frozen_vis
    params = [gg.camera.params for gg in problem.groups]
    before = opt._total_cost(params, [gg.poses for gg in problem.groups], vis)
    at_opt = opt.check_for_optimum_numerically(go_to_optimum=True,
                                               immediate_step_threshold=np.inf,
                                               print_errors=False)
    assert not at_opt
    after = opt._total_cost(params, [gg.poses for gg in problem.groups], vis)
    assert after < before
