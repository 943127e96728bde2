"""Camera model tests: distort/undistort round-trips and Jacobian twins.

Mirrors the reference test strategy (``src/camera/test/test_camera.cc``): for
every model, (a) project/unproject round-trips at sample points, (b) autodiff
Jacobians vs central finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dataset_pipeline_tpu.models import cameras as cm

W, H = 640, 480

# params chosen mild enough that the distortion is invertible over the image
MODEL_PARAMS = {
    "PINHOLE": [340.0, 341.0, 320.0, 240.5],
    "SIMPLE_PINHOLE": [340.0, 320.0, 240.5],
    "POLYNOMIAL_3": [340.0, 341.0, 320.0, 240.5, 0.05, -0.02, 0.002],
    "POLYNOMIAL_4": [340.0, 341.0, 320.0, 240.5, 0.05, -0.02, 0.002, -0.0001],
    "OPENCV": [340.0, 341.0, 320.0, 240.5, 0.05, -0.02, 0.001, -0.0005],
    "FULL_OPENCV": [340.0, 341.0, 320.0, 240.5, 0.05, -0.02, 0.001, -0.0005, 0.002, 0.01, -0.005, 0.001],
    "OPENCV_FISHEYE": [340.0, 341.0, 320.0, 240.5, 0.05, -0.02, 0.002, -0.0001],
    "FISHEYE_POLYNOMIAL_2_TANGENTIAL_2": [340.0, 341.0, 320.0, 240.5, 0.05, -0.02, 0.001, -0.0005],
    "FOV": [340.0, 341.0, 320.0, 240.5, 0.9],
    "RADIAL": [340.0, 320.0, 240.5, 0.05, -0.02],
    "SIMPLE_RADIAL": [340.0, 320.0, 240.5, 0.05],
    "RADIAL_FISHEYE": [340.0, 320.0, 240.5, 0.05, -0.02],
    "SIMPLE_RADIAL_FISHEYE": [340.0, 320.0, 240.5, 0.05],
    "THIN_PRISM_FISHEYE": [340.0, 341.0, 320.0, 240.5, 0.05, -0.02, 0.001, -0.0005, 0.002, -0.0001, 0.0005, -0.0002],
}

assert set(MODEL_PARAMS) == set(cm.CAMERA_MODELS)


def sample_pixels():
    # interior pixels incl. near-corners (reference tests corners + samples)
    xs = np.array([10.0, 100.0, 320.0, 550.0, 630.0])
    ys = np.array([10.0, 120.0, 240.0, 400.0, 470.0])
    gx, gy = np.meshgrid(xs, ys)
    return jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1), jnp.float32)


@pytest.mark.parametrize("model", sorted(MODEL_PARAMS))
def test_undistort_distort_roundtrip(model):
    cam = cm.make_camera(model, W, H, MODEL_PARAMS[model])
    pix = sample_pixels()
    n = cm.image_to_normalized(cam, pix)
    pix2 = cm.normalized_to_image(cam, n)
    mask = np.all(np.isfinite(np.asarray(pix2)), -1)
    assert mask.mean() > 0.9, f"{model}: too many invalid unprojections"
    np.testing.assert_allclose(
        np.asarray(pix2)[mask], np.asarray(pix)[mask], atol=2e-2, err_msg=model
    )


@pytest.mark.parametrize("model", sorted(MODEL_PARAMS))
def test_distort_undistort_roundtrip(model):
    cam = cm.make_camera(model, W, H, MODEL_PARAMS[model])
    rng = np.random.RandomState(3)
    n = jnp.asarray(rng.uniform(-0.45, 0.45, (64, 2)).astype(np.float32))
    d = cm.distort(cam, n)
    n2 = cm.undistort(cam, d)
    np.testing.assert_allclose(np.asarray(n2), np.asarray(n), atol=1e-4, err_msg=model)


@pytest.mark.parametrize("model", sorted(MODEL_PARAMS))
def test_project_unproject_roundtrip(model):
    cam = cm.make_camera(model, W, H, MODEL_PARAMS[model])
    rng = np.random.RandomState(4)
    depth = jnp.asarray(rng.uniform(0.5, 5.0, (25,)).astype(np.float32))
    pix = sample_pixels()
    pts = cm.unproject(cam, pix, depth)
    pix2, valid = cm.project(cam, pts)
    v = np.asarray(valid)
    assert v.mean() > 0.9, model
    np.testing.assert_allclose(
        np.asarray(pix2)[v], np.asarray(pix)[v], atol=2e-2, err_msg=model
    )


def _numerical_jac(f, x, eps):
    x = np.asarray(x, np.float64)
    out0 = np.asarray(f(jnp.asarray(x, jnp.float32)), np.float64)
    J = np.zeros(out0.shape + (x.shape[-1],))
    for i in range(x.shape[-1]):
        dx = np.zeros_like(x)
        dx[i] = eps
        hi = np.asarray(f(jnp.asarray(x + dx, jnp.float32)), np.float64)
        lo = np.asarray(f(jnp.asarray(x - dx, jnp.float32)), np.float64)
        J[..., i] = (hi - lo) / (2 * eps)
    return J


@pytest.mark.parametrize("model", sorted(MODEL_PARAMS))
def test_jacobian_wrt_point_numeric_twin(model):
    cam = cm.make_camera(model, W, H, MODEL_PARAMS[model])
    pts = np.array(
        [[0.1, -0.05, 1.2], [0.4, 0.3, 2.0], [-0.2, 0.25, 0.8]], np.float32
    )
    J = np.asarray(cm.image_jacobian_wrt_point(cam, jnp.asarray(pts)))
    for i, p in enumerate(pts):
        f = lambda q: cm.project(cam, q[None])[0][0]
        Jn = _numerical_jac(f, p, 1e-3)  # eps large enough to beat f32 rounding of ~100px outputs
        np.testing.assert_allclose(J[i], Jn, atol=5e-2, rtol=2e-2, err_msg=model)


@pytest.mark.parametrize("model", sorted(MODEL_PARAMS))
def test_jacobian_wrt_params_numeric_twin(model):
    cam = cm.make_camera(model, W, H, MODEL_PARAMS[model])
    p = jnp.asarray([0.15, -0.1, 1.3], jnp.float32)
    J = np.asarray(cm.image_jacobian_wrt_params(cam, p[None]))[0]

    def f(params):
        c2 = cam.with_params(params)
        return cm.project(c2, p[None])[0][0]

    Jn = _numerical_jac(f, np.asarray(cam.params), 1e-3)
    np.testing.assert_allclose(J, Jn, atol=5e-2, rtol=2e-2, err_msg=model)


def test_scaled_by_halves_projection():
    cam = cm.make_camera("OPENCV", W, H, MODEL_PARAMS["OPENCV"])
    half = cm.scaled_by(cam, 0.5)
    assert half.width == W // 2 and half.height == H // 2
    p = jnp.asarray([[0.2, 0.1, 1.5]], jnp.float32)
    pix, _ = cm.project(cam, p)
    pix_half, _ = cm.project(half, p)
    # center-of-pixel convention: x_half = (x + 0.5)/2 - 0.5
    np.testing.assert_allclose(
        np.asarray(pix_half), (np.asarray(pix) + 0.5) * 0.5 - 0.5, atol=1e-3
    )


def test_cutoff_blocks_far_points():
    cam = cm.make_camera("SIMPLE_RADIAL", W, H, [340.0, 320.0, 240.5, -0.08])
    assert float(cam.radius_cutoff_sq) < np.inf
    # a point far outside the valid radius must be invalid
    far = jnp.asarray([[5.0, 5.0, 1.0]], jnp.float32)
    _, valid = cm.project(cam, far)
    assert not bool(valid[0])


def test_vmap_over_cameras():
    cams = [
        cm.make_camera("PINHOLE", W, H, [340.0, 341.0, 320.0, 240.0]),
        cm.make_camera("PINHOLE", W, H, [300.0, 301.0, 319.0, 239.0]),
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    p = jnp.asarray([[0.1, 0.2, 1.0]], jnp.float32)
    pix = jax.vmap(lambda c: cm.project(c, p)[0])(stacked)
    assert pix.shape == (2, 1, 2)
    assert not np.allclose(pix[0], pix[1])


def test_undistortion_lut_matches_iterative():
    """LUT-served unprojection (``camera_base_impl.h:255-273``) must agree
    with the full iterative GN undistortion across the image for a heavily
    distorted model, and be exact at grid nodes."""
    import jax.numpy as jnp

    cam = cm.make_camera(
        "OPENCV", 128, 96,
        [100.0, 100.0, 63.5, 47.5, 0.2, -0.05, 0.001, -0.002])
    lut = cm.build_undistortion_lut(cam)
    rng = np.random.RandomState(0)
    pix = jnp.asarray(
        np.stack([rng.uniform(2, 125, 500), rng.uniform(2, 93, 500)], -1),
        jnp.float32)
    n_lut = np.asarray(cm.image_to_normalized_lut(cam, lut, pix))
    n_ref = np.asarray(cm.image_to_normalized(cam, pix))
    np.testing.assert_allclose(n_lut, n_ref, atol=2e-5)
    # exact at grid nodes
    nodes = jnp.asarray([[0.0, 0.0], [64.0, 48.0], [127.0, 95.0]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(cm.image_to_normalized_lut(cam, lut, nodes)),
        np.asarray(cm.image_to_normalized(cam, nodes)), atol=1e-6)
    # unproject_lut round-trips through project
    d = jnp.asarray(rng.uniform(1.0, 5.0, 500).astype(np.float32))
    pts = cm.unproject_lut(cam, lut, pix, d)
    pix2, ok = cm.project(cam, pts)
    assert bool(ok.all())
    np.testing.assert_allclose(np.asarray(pix2), np.asarray(pix), atol=5e-3)
