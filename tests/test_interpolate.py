"""Interpolation unit tests.

Mirror of the reference's ``Test_Interpolation`` binary
(``opt/test/test_interpolation.cc:39,88``): bilinear/trilinear values and
analytic derivatives checked on tiny synthetic images, including the pyramid
coordinate convention ``x1 = 2*(x0+0.5)-0.5`` and validity bounds.
"""

import numpy as np
import jax.numpy as jnp

from dataset_pipeline_tpu.ops.interpolate import (
    bilinear,
    bilinear_with_derivatives,
    trilinear,
    trilinear_with_derivatives,
)


def _img(h, w, fn):
    y, x = np.mgrid[0:h, 0:w]
    return jnp.asarray(fn(x, y).astype(np.float32))


def test_bilinear_exact_at_pixel_centers():
    img = _img(4, 5, lambda x, y: 10 * y + x)
    for yy in range(3):
        for xx in range(4):
            v, ok = bilinear(img, jnp.float32(xx), jnp.float32(yy))
            assert bool(ok)
            assert float(v) == 10 * yy + xx


def test_bilinear_midpoint_average():
    img = _img(3, 3, lambda x, y: 4.0 * x + 2.0 * y)
    v, ok = bilinear(img, jnp.float32(0.5), jnp.float32(0.5))
    assert bool(ok)
    # mean of the 4 corner values
    assert abs(float(v) - np.mean([0, 4, 2, 6])) < 1e-6


def test_bilinear_validity_bounds():
    """x<0 | y<0 | floor(x)>=W-1 | floor(y)>=H-1 -> invalid
    (``interpolate_bilinear.h:98-107``)."""
    img = _img(4, 4, lambda x, y: x + y)
    assert not bool(bilinear(img, jnp.float32(-0.01), jnp.float32(1.0))[1])
    assert not bool(bilinear(img, jnp.float32(1.0), jnp.float32(-0.01))[1])
    assert not bool(bilinear(img, jnp.float32(3.0), jnp.float32(1.0))[1])
    assert not bool(bilinear(img, jnp.float32(1.0), jnp.float32(3.0))[1])
    assert bool(bilinear(img, jnp.float32(2.99), jnp.float32(2.99))[1])
    assert bool(bilinear(img, jnp.float32(0.0), jnp.float32(0.0))[1])


def test_bilinear_derivatives_numeric_twin():
    rng = np.random.RandomState(3)
    img = _img(8, 8, lambda x, y: np.sin(0.7 * x) * 10 + np.cos(0.5 * y) * 7 + x * y * 0.3)
    h = 1e-3
    for _ in range(20):
        # generic interior points, away from the integer lattice (bilinear
        # derivatives are discontinuous there by construction)
        x = rng.uniform(0.6, 6.4)
        x = np.floor(x) + np.clip(x - np.floor(x), 0.1, 0.9)
        y = rng.uniform(0.6, 6.4)
        y = np.floor(y) + np.clip(y - np.floor(y), 0.1, 0.9)
        v, dx, dy, ok = bilinear_with_derivatives(img, jnp.float32(x), jnp.float32(y))
        assert bool(ok)
        vx1, _ = bilinear(img, jnp.float32(x + h), jnp.float32(y))
        vx0, _ = bilinear(img, jnp.float32(x - h), jnp.float32(y))
        vy1, _ = bilinear(img, jnp.float32(x), jnp.float32(y + h))
        vy0, _ = bilinear(img, jnp.float32(x), jnp.float32(y - h))
        assert abs(float(dx) - (float(vx1) - float(vx0)) / (2 * h)) < 2e-2
        assert abs(float(dy) - (float(vy1) - float(vy0)) / (2 * h)) < 2e-2
        v2, _ = bilinear(img, jnp.float32(x), jnp.float32(y))
        assert abs(float(v) - float(v2)) < 1e-6


def test_trilinear_endpoints_match_bilinear_levels():
    """z=0 samples image0 at (x0,y0); z=1 samples image1 at 2(x0+0.5)-0.5."""
    rng = np.random.RandomState(5)
    img1 = _img(8, 8, lambda x, y: 3.0 * x + 1.0 * y)  # fine level (2x size)
    img0 = _img(4, 4, lambda x, y: 5.0 * x - 2.0 * y)  # coarse level
    for _ in range(10):
        x0 = rng.uniform(0.2, 2.5)
        y0 = rng.uniform(0.2, 2.5)
        v0, ok0 = trilinear(img0, img1, jnp.float32(x0), jnp.float32(y0), jnp.float32(0.0))
        b0, _ = bilinear(img0, jnp.float32(x0), jnp.float32(y0))
        assert bool(ok0)
        assert abs(float(v0) - float(b0)) < 1e-5
        v1, _ = trilinear(img0, img1, jnp.float32(x0), jnp.float32(y0), jnp.float32(1.0))
        x1 = 2 * (x0 + 0.5) - 0.5
        y1 = 2 * (y0 + 0.5) - 0.5
        b1, _ = bilinear(img1, jnp.float32(x1), jnp.float32(y1))
        assert abs(float(v1) - float(b1)) < 1e-5


def test_trilinear_derivatives_numeric_twin():
    rng = np.random.RandomState(7)
    img1 = _img(12, 12, lambda x, y: np.sin(0.6 * x) * 9 + 0.4 * x * y)
    img0 = _img(6, 6, lambda x, y: np.cos(0.5 * y) * 11 + 0.7 * x)
    h = 1e-3
    for _ in range(15):
        x0 = rng.uniform(0.6, 3.9)
        x0 = np.floor(x0) + np.clip(x0 - np.floor(x0), 0.15, 0.85)
        y0 = rng.uniform(0.6, 3.9)
        y0 = np.floor(y0) + np.clip(y0 - np.floor(y0), 0.15, 0.85)
        z = rng.uniform(0.1, 0.9)
        v, dx, dy, dz, ok = trilinear_with_derivatives(
            img0, img1, jnp.float32(x0), jnp.float32(y0), jnp.float32(z))
        assert bool(ok)

        def f(xx, yy, zz):
            return float(trilinear(img0, img1, jnp.float32(xx), jnp.float32(yy),
                                   jnp.float32(zz))[0])

        # the fine-level coordinate moves at 2x, so its lattice kinks land at
        # x1 half-integers; skip samples whose +-h window crosses one
        x1 = 2 * (x0 + 0.5) - 0.5
        y1 = 2 * (y0 + 0.5) - 0.5
        if abs(x1 - round(x1)) > 4 * h and abs(y1 - round(y1)) > 4 * h:
            assert abs(float(dx) - (f(x0 + h, y0, z) - f(x0 - h, y0, z)) / (2 * h)) < 3e-2
            assert abs(float(dy) - (f(x0, y0 + h, z) - f(x0, y0 - h, z)) / (2 * h)) < 3e-2
        assert abs(float(dz) - (f(x0, y0, z + h) - f(x0, y0, z - h)) / (2 * h)) < 3e-2


def test_trilinear_batched():
    img1 = _img(8, 8, lambda x, y: 1.0 * x + 2.0 * y)
    img0 = _img(4, 4, lambda x, y: 3.0 * x + 4.0 * y)
    xs = jnp.asarray([0.5, 1.0, 2.0], jnp.float32)
    ys = jnp.asarray([0.5, 1.5, 1.0], jnp.float32)
    zs = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)
    v, ok = trilinear(img0, img1, xs, ys, zs)
    assert v.shape == (3,)
    for i in range(3):
        vi, oki = trilinear(img0, img1, xs[i], ys[i], zs[i])
        assert abs(float(v[i]) - float(vi)) < 1e-6
        assert bool(ok[i]) == bool(oki)
