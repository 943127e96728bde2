"""Brick (blocked-row) pyramid sampler: equality twins vs the flat-pyramid
sampler of ``photometric/optimizer.py`` and the Pallas extract kernel vs its
XLA twin."""

import numpy as np
import pytest

import jax.numpy as jnp

from dataset_pipeline_tpu.ops.brick import (
    _extract_pallas,
    _extract_xla,
    brick_sample,
    brick_sample_with_derivs,
    build_brick_level,
    build_brick_pyramid,
)
from dataset_pipeline_tpu.photometric.optimizer import (
    _sample_pyramid,
    _sample_pyramid_with_derivs,
)

RNG = np.random.RandomState(7)


def _pyramid(H=97, W=131, L=4):
    pyr = []
    h, w = H, W
    for _ in range(L):
        pyr.append(jnp.asarray(RNG.rand(h, w).astype(np.float32) * 255))
        h = max(2, int(h * 0.5 + 0.5))
        w = max(2, int(w * 0.5 + 0.5))
    return pyr


def test_brick_level_layout():
    img = jnp.asarray(RNG.rand(13, 40).astype(np.float32))
    table = np.asarray(build_brick_level(img))
    imn = np.asarray(img)
    H, W = imn.shape
    # every valid footprint's 4 taps are at (l, l+1, l+32, l+33)
    for y0 in range(H - 1):
        for x0 in range(W - 1):
            r, c = y0 // 3, x0 // 31
            C = (W - 2) // 31 + 1
            lane = (y0 - 3 * r) * 32 + (x0 - 31 * c)
            row = table[r * C + c]
            assert row[lane] == imn[y0, x0]
            assert row[lane + 1] == imn[y0, x0 + 1]
            assert row[lane + 32] == imn[y0 + 1, x0]
            assert row[lane + 33] == imn[y0 + 1, x0 + 1]


@pytest.mark.parametrize("L", [1, 4])
def test_brick_sampler_matches_flat(L):
    pyr = _pyramid(L=L)
    brick = build_brick_pyramid(pyr)
    N = 3000
    H, W = pyr[0].shape
    pix = jnp.asarray(
        np.stack([RNG.rand(N) * (W + 8) - 4, RNG.rand(N) * (H + 8) - 4], -1)
        .astype(np.float32))
    scale = jnp.asarray((RNG.rand(N) * (L - 0.001)).astype(np.float32))

    v0, dx0, dy0, ds0, ok0 = _sample_pyramid_with_derivs(pyr, pix, scale)
    v1, dx1, dy1, ds1, ok1 = brick_sample_with_derivs(
        brick, L, pix, scale, extract=_extract_xla)
    np.testing.assert_array_equal(np.asarray(ok0), np.asarray(ok1))
    m = np.asarray(ok0)
    for a, b in ((v0, v1), (dx0, dx1), (dy0, dy1), (ds0, ds1)):
        np.testing.assert_allclose(np.asarray(a)[m], np.asarray(b)[m],
                                   rtol=1e-6, atol=1e-4)

    s0, k0 = _sample_pyramid(pyr, pix, scale)
    s1, k1 = brick_sample(brick, L, pix, scale, extract=_extract_xla)
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    np.testing.assert_allclose(np.asarray(s0)[m], np.asarray(s1)[m],
                               rtol=1e-6, atol=1e-4)


def test_extract_pallas_interpret_matches_xla():
    N = 2500
    rows = jnp.asarray(RNG.rand(N, 128).astype(np.float32))
    lane = jnp.asarray(RNG.randint(0, 95, N), jnp.int32)
    fx = jnp.asarray(RNG.rand(N).astype(np.float32))
    fy = jnp.asarray(RNG.rand(N).astype(np.float32))
    f = jnp.asarray(np.exp2(-RNG.randint(0, 4, N)).astype(np.float32))
    a = _extract_xla(rows, lane, fx, fy, f)
    b = _extract_pallas(rows, lane, fx, fy, f, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-5)


def test_hb_one_brick_matches_flat():
    """Full H,b accumulation equality: brick sampler vs flat sampler."""
    import dataset_pipeline_tpu.photometric.optimizer as po
    from dataset_pipeline_tpu.models import cameras as cm

    cam = cm.make_camera("PINHOLE", 64, 48, [50.0, 50.0, 31.5, 23.5])
    N, K, L = 400, 3, 3
    pts = np.stack([RNG.rand(N) * 1.2 - 0.6, RNG.rand(N) * 0.9 - 0.45,
                    RNG.rand(N) * 0.5 + 1.5], -1).astype(np.float32)
    nbr = RNG.randint(0, N, (N, K)).astype(np.int32)
    desc = (RNG.rand(N, K) * 4 - 2).astype(np.float32)
    pyr = []
    h, w = 48, 64
    base = RNG.rand(h, w).astype(np.float32) * 255
    for s in range(L):
        pyr.append(jnp.asarray(base[: max(h >> s, 2) * (1 << s): 1 << s,
                                    : max(w >> s, 2) * (1 << s): 1 << s]))
    obs_scale = jnp.asarray((RNG.rand(N) * (L - 1.01)).astype(np.float32))
    contrib = jnp.asarray(RNG.rand(N) > 0.1)
    q = jnp.asarray([0.999, 0.02, -0.03, 0.01], jnp.float32)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray([0.02, -0.01, 0.05], jnp.float32)

    outs = {}
    for flag in (False, True):
        po.USE_BRICK = flag
        # USE_BRICK is not part of the jit key (it is fixed per process in
        # production); drop cached executables so both paths really trace
        import jax

        jax.clear_caches()
        try:
            outs[flag] = [np.asarray(x) for x in po._hb_one(
                cam, jnp.asarray(cam.params), q, t, jnp.asarray(pts),
                jnp.asarray(nbr), jnp.asarray(desc), tuple(pyr), obs_scale,
                contrib, L, True, radius=0.01, dynamic_scale=True)]
        finally:
            po.USE_BRICK = None
    jax.clear_caches()
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-3)


def test_fused_dispatch_wrappers_match_per_call():
    """The fused per-chunk wrappers (_visibility_mask_levels,
    _hb_batch_levels, _cost_batch_levels — one relay dispatch for all
    (level, type) kernels of a chunk) return exactly what the individual
    jitted calls return."""
    import dataset_pipeline_tpu.photometric.optimizer as po
    from dataset_pipeline_tpu.models import cameras as cm

    rng = np.random.RandomState(9)
    W, H, L, nb = 64, 48, 3, 2
    cam = cm.make_camera("PINHOLE", W, H, [50.0, 50.0, 31.5, 23.5])
    params = jnp.asarray(cam.params)
    pose_q = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (nb, 1))
    pose_t = jnp.asarray(0.01 * rng.randn(nb, 3), jnp.float32)
    occl = jnp.full((nb, H, W), 10.0, jnp.float32)
    pyr = []
    h, w = H, W
    for s in range(L):
        pyr.append(jnp.asarray(rng.uniform(5, 200, (nb, h, w)).astype(np.float32)))
        h, w = max(2, round(h / 2)), max(2, round(w / 2))
    pyr = tuple(pyr)

    level_args = []
    entries_hb = []
    entries_cost = []
    per_level = []
    for li, n in enumerate((500, 200)):
        pts = np.stack([rng.rand(n) * 1.2 - 0.6, rng.rand(n) * 0.9 - 0.45,
                        rng.rand(n) * 0.5 + 1.5], -1).astype(np.float32)
        nbr = rng.randint(0, n, (n, 3)).astype(np.int32)
        desc = (rng.rand(n, 3) * 4 - 2).astype(np.float32)
        radius = jnp.asarray(0.006 * (1 + li), jnp.float32)
        sc = jnp.asarray(rng.uniform(0.1, L - 1.1, (nb, n)).astype(np.float32))
        m = jnp.asarray(rng.rand(nb, n) > 0.1)
        level_args.append((jnp.asarray(pts), radius, None, pyr, ()))
        entries_hb.append((jnp.asarray(pts), jnp.asarray(nbr),
                           jnp.asarray(desc), pyr, sc, m, radius))
        entries_cost.append((jnp.asarray(pts), jnp.asarray(nbr),
                             jnp.asarray(desc), pyr, sc, m))
        per_level.append((pts, nbr, desc, radius, sc, m))

    row_valid = jnp.asarray([True, True])
    fused_vis = po._visibility_mask_levels(
        cam, pose_q, pose_t, occl, tuple(level_args),
        jnp.asarray(0.0, jnp.float32), L, W, H,
        jnp.asarray(0.01, jnp.float32), jnp.asarray(0.05, jnp.float32),
        jnp.asarray(252.0, jnp.float32), row_valid)
    for li, (pts, nbr, desc, radius, sc, m) in enumerate(per_level):
        mv, sv = po._visibility_batch(
            cam, pose_q, pose_t, jnp.asarray(pts), radius, occl,
            jnp.asarray(0.0, jnp.float32), L, W, H,
            jnp.asarray(0.01, jnp.float32), jnp.asarray(0.05, jnp.float32))
        mv = mv & row_valid[:, None]
        mv = po._mask_filter_batch(cam, pose_q, pose_t, jnp.asarray(pts), sv,
                                   mv, pyr, (),
                                   jnp.asarray(252.0, jnp.float32))
        np.testing.assert_array_equal(np.asarray(fused_vis[li][0]),
                                      np.asarray(mv))
        np.testing.assert_allclose(np.asarray(fused_vis[li][1]),
                                   np.asarray(sv), rtol=1e-6)

    fused_hb = po._hb_batch_levels(cam, params, pose_q, pose_t,
                                   tuple(entries_hb), True, True)
    fused_cost = po._cost_batch_levels(cam, params, pose_q, pose_t,
                                       tuple(entries_cost))
    for li, (pts, nbr, desc, radius, sc, m) in enumerate(per_level):
        ref = po._hb_batch(cam, params, pose_q, pose_t, jnp.asarray(pts),
                           jnp.asarray(nbr), jnp.asarray(desc), pyr, sc, m,
                           radius, True, True)
        for a, b in zip(fused_hb[li], ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-5)
        refc = po._cost_batch(cam, params, pose_q, pose_t, jnp.asarray(pts),
                              jnp.asarray(nbr), jnp.asarray(desc), pyr, sc, m)
        for a, b in zip(fused_cost[li], refc):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)
