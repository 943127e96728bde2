"""Splat z-buffer renderer and cube-map fill tests."""

import jax.numpy as jnp
import numpy as np

from dataset_pipeline_tpu.ops.splat import (
    CUBE_FACE_NAMES,
    CUBE_FACE_ROTATIONS,
    fill_color_from_depth,
    fill_depth_holes,
    flood_fill_colors,
    render_points_depth,
    render_points_depth_color,
    render_splats_depth,
)

RNG = np.random.RandomState(9)


def test_single_point_lands_on_pixel():
    # point projecting exactly to pixel (10.2, 5.7) -> truncated (10,5)
    fx = fy = 50.0
    cx = cy = 16.0
    z = 2.0
    x = (10.2 - cx) * z / fx
    y = (5.7 - cy) * z / fy
    depth = render_points_depth(jnp.asarray([[x, y, z]], jnp.float32), 32, 32, fx, fy, cx, cy)
    d = np.asarray(depth)
    assert d[5, 10] == 2.0
    assert np.isinf(np.delete(d.reshape(-1), 5 * 32 + 10)).all()


def test_zbuffer_keeps_nearest():
    fx = fy = 50.0
    cx = cy = 16.0
    pts = []
    for z in (5.0, 2.0, 3.0):
        pts.append([(10.0 - cx) * z / fx, (10.0 - cy) * z / fy, z])
    depth, color = render_points_depth_color(
        jnp.asarray(pts, jnp.float32),
        jnp.asarray([[255, 0, 0], [0, 255, 0], [0, 0, 255]], jnp.uint8),
        32, 32, fx, fy, cx, cy,
    )
    assert np.asarray(depth)[10, 10] == 2.0
    np.testing.assert_array_equal(np.asarray(color)[10, 10], [0, 255, 0])


def test_points_behind_camera_dropped():
    depth = render_points_depth(
        jnp.asarray([[0.0, 0.0, -1.0], [0.1, 0.1, 0.0]], jnp.float32),
        16, 16, 8.0, 8.0, 8.0, 8.0,
    )
    assert np.isinf(np.asarray(depth)).all()


def test_splat_radius_covers_square():
    fx = fy = 100.0
    cx = cy = 16.0
    # r_px = 100 * 0.04 / 2 = 2 -> 5x5 square
    depth = render_splats_depth(
        jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32),
        jnp.asarray([0.04], jnp.float32),
        32, 32, fx, fy, cx, cy, max_radius_px=3,
    )
    d = np.asarray(depth)
    assert (d[14:19, 14:19] == 2.0).all()
    assert np.isinf(d[10, 10])


def test_fill_depth_holes_median():
    depth = np.full((8, 8), np.inf, np.float32)
    # surround (4,4) with 8 valid neighbors
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    i = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            depth[4 + dy, 4 + dx] = vals[i]
            i += 1
    filled = np.asarray(fill_depth_holes(jnp.asarray(depth)))
    # count==8 -> median of first 7 scan-order values = median(1..7) = 4
    assert filled[4, 4] == 4.0
    # valid pixels unchanged
    assert filled[3, 3] == 1.0


def test_fill_two_neighbors_takes_min():
    depth = np.full((8, 8), np.inf, np.float32)
    depth[3, 3] = 5.0
    depth[3, 5] = 2.0
    filled = np.asarray(fill_depth_holes(jnp.asarray(depth)))
    assert filled[3, 4] == 2.0
    # pixel with one valid neighbor stays inf
    assert np.isinf(filled[4, 2]) or filled[4, 2] > 0


def test_color_flood_fill_completes():
    color = np.zeros((16, 16, 3), np.uint8)
    valid = np.zeros((16, 16), bool)
    color[0, 0] = [100, 150, 200]
    valid[0, 0] = True
    out = flood_fill_colors(jnp.asarray(color), jnp.asarray(valid))
    out = np.asarray(out)
    assert (out[:, :, 0] == 100).all() and (out[:, :, 2] == 200).all()


def test_cube_faces_cover_sphere():
    # random unit directions; every point must be visible in exactly one face
    # interior (faces overlap only at borders)
    dirs = RNG.randn(5000, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = dirs * 5.0
    size = 64
    f = size / 2.0
    c = size // 2
    seen = np.zeros(len(pts), np.int32)
    for face in range(6):
        R = CUBE_FACE_ROTATIONS[face]
        p = pts @ R.T
        z = p[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            x = f * p[:, 0] / z + c
            y = f * p[:, 1] / z + c
        seen += ((z > 0) & (x >= 0) & (y >= 0) & (x < size) & (y < size)).astype(np.int32)
    assert (seen >= 1).all()


def test_splats_tiered_matches_bruteforce_passes():
    """The single-scatter + tiered-erosion splat render must equal the
    (2R+1)^2 scatter-pass reference formulation exactly, including off-image
    centers whose squares reach into the image."""
    rng = np.random.RandomState(5)
    W, H, R = 64, 48, 3
    n = 4000
    pts = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.1, 1.1, n),
                    rng.uniform(0.5, 6.0, n)], -1).astype(np.float32)
    radii = rng.uniform(0.0, 0.25, n).astype(np.float32)
    fx = fy = 40.0
    cx, cy = 31.5, 23.5

    got = np.asarray(render_splats_depth(
        jnp.asarray(pts), jnp.asarray(radii), W, H, fx, fy, cx, cy,
        max_radius_px=R))

    # brute-force reference (the original pass-per-offset formulation)
    z = pts[:, 2]
    x = fx * pts[:, 0] / z + cx
    y = fy * pts[:, 1] / z + cy
    r_px = np.clip(0.5 * (fx + fy) * radii / z, 0.0, float(R))
    ix = np.floor(x).astype(int)
    iy = np.floor(y).astype(int)
    exp = np.full((H, W), np.inf, np.float32)
    for i in range(n):
        k = int(np.ceil(r_px[i]))
        for dy in range(-k, k + 1):
            for dx in range(-k, k + 1):
                jx, jy = ix[i] + dx, iy[i] + dy
                if 0 <= jx < W and 0 <= jy < H:
                    exp[jy, jx] = min(exp[jy, jx], z[i])
    np.testing.assert_array_equal(got, exp)


def test_cubemap_pipelined_matches_dense():
    """The pipelined per-face path (async dispatch + u16 log-depth wire
    encoding) must match the one-dispatch path: colors exactly, depth to
    the documented 2.5e-4 relative wire quantization, infinities aligned."""
    import numpy as np

    from dataset_pipeline_tpu.tools.cube_map_renderer import render_cube_map

    rng = np.random.RandomState(0)
    d = rng.uniform(1.0, 20.0, 4000).astype(np.float32)
    v = rng.randn(4000, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pos = v * d[:, None]
    cols = rng.randint(0, 255, (4000, 3)).astype(np.uint8)

    dense = render_cube_map(pos, cols, 64, pipelined=False)
    piped = render_cube_map(pos, cols, 64, pipelined=True)
    for name in dense:
        dd, cd = dense[name]
        dp, cp = piped[name]
        np.testing.assert_array_equal(cp, cd)
        fin = np.isfinite(dd)
        assert (np.isfinite(dp) == fin).all()
        np.testing.assert_allclose(dp[fin], dd[fin], rtol=3e-4)


def test_zbuffer_min_sorted_matches_scatter():
    """The TPU sort-based z-buffer (one multi-key sort + unique-index
    scatter) equals the colliding scatter-min path, including min-index
    z-tie resolution and the aux (winner color) channel."""
    import jax.numpy as jnp

    from dataset_pipeline_tpu.ops.splat import zbuffer_min

    rng = np.random.RandomState(21)
    n, n_px = 20000, 512
    flat = rng.randint(-3, n_px + 3, n).astype(np.int32)
    z = rng.rand(n).astype(np.float32) * 10
    # force exact z-ties to exercise the min-index rule
    z[rng.rand(n) < 0.3] = 2.5
    aux = rng.randint(0, 1 << 24, n).astype(np.int32)

    d0, a0 = zbuffer_min(jnp.asarray(flat), jnp.asarray(z), n_px,
                         aux=jnp.asarray(aux), use_sorted=False)
    d1, a1 = zbuffer_min(jnp.asarray(flat), jnp.asarray(z), n_px,
                         aux=jnp.asarray(aux), use_sorted=True)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))

    d0 = zbuffer_min(jnp.asarray(flat), jnp.asarray(z), n_px,
                     use_sorted=False)
    d1 = zbuffer_min(jnp.asarray(flat), jnp.asarray(z), n_px,
                     use_sorted=True)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
