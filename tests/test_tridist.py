"""Point-triangle distance and splat creation tests."""

import jax.numpy as jnp
import numpy as np

from dataset_pipeline_tpu.ops.tridist import (
    build_triangle_grid,
    min_dist_sq_within,
    point_triangle_dist_sq,
)
from dataset_pipeline_tpu.tools.splat_creator import create_splats, unit_orthogonal

RNG = np.random.RandomState(13)


def test_point_triangle_distance_regions():
    a = jnp.asarray([0.0, 0.0, 0.0])
    b = jnp.asarray([1.0, 0.0, 0.0])
    c = jnp.asarray([0.0, 1.0, 0.0])
    cases = [
        ([0.25, 0.25, 1.0], 1.0),  # above the face
        ([-1.0, -1.0, 0.0], 2.0),  # vertex a region
        ([2.0, 0.0, 0.0], 1.0),  # vertex b region
        ([0.5, -1.0, 0.0], 1.0),  # edge ab region
        ([1.0, 1.0, 0.0], 0.5),  # edge bc region
        ([0.2, 0.3, 0.0], 0.0),  # inside
    ]
    for p, expected in cases:
        d2 = float(point_triangle_dist_sq(jnp.asarray(p), a, b, c))
        np.testing.assert_allclose(d2, expected, atol=1e-5, err_msg=str(p))


def test_point_triangle_distance_random_vs_bruteforce():
    # random triangles and points; compare with dense barycentric sampling
    for _ in range(20):
        tri = RNG.randn(3, 3).astype(np.float32)
        p = RNG.randn(3).astype(np.float32)
        d2 = float(point_triangle_dist_sq(jnp.asarray(p), *map(jnp.asarray, tri)))
        # dense sample of the triangle
        u, v = np.meshgrid(np.linspace(0, 1, 60), np.linspace(0, 1, 60))
        mask = u + v <= 1
        u, v = u[mask], v[mask]
        samples = (1 - u - v)[:, None] * tri[0] + u[:, None] * tri[1] + v[:, None] * tri[2]
        d2_ref = ((samples - p) ** 2).sum(1).min()
        assert d2 <= d2_ref + 1e-5
        assert d2 >= d2_ref - 0.01  # dense sampling overestimates slightly


def test_grid_distance_query():
    # unit square mesh in z=0 plane, 2 triangles
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    grid = build_triangle_grid(verts, faces, 0.05)
    pts = np.asarray(
        [[0.5, 0.5, 0.02], [0.5, 0.5, 0.2], [0.2, 0.8, 0.04], [5.0, 5.0, 5.0]],
        np.float32,
    )
    d2 = np.asarray(min_dist_sq_within(grid, jnp.asarray(pts)))
    np.testing.assert_allclose(d2[0], 0.02**2, atol=1e-6)
    assert np.isinf(d2[1])  # farther than cell neighborhood -> inf (i.e. "far")
    np.testing.assert_allclose(d2[2], 0.04**2, atol=1e-6)
    assert np.isinf(d2[3])


def test_unit_orthogonal():
    n = RNG.randn(100, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    r = unit_orthogonal(n)
    np.testing.assert_allclose((n * r).sum(1), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(r, axis=1), 1, atol=1e-5)
    # z-axis special case
    rz = unit_orthogonal(np.asarray([[0, 0, 1]], np.float32))
    np.testing.assert_allclose(np.abs(rz), [[0, 1, 0]], atol=1e-6)


def test_create_splats_covers_hole():
    # mesh: plane with a missing central region; points: full plane
    xs, ys = np.meshgrid(np.linspace(0, 1, 21), np.linspace(0, 1, 21))
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], -1).astype(np.float32)
    normals = np.tile(np.asarray([[0, 0, 1]], np.float32), (len(pts), 1))
    # mesh covers only x < 0.4
    verts = np.asarray([[0, 0, 0], [0.4, 0, 0], [0.4, 1, 0], [0, 1, 0]], np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    v, f, count = create_splats(pts, normals, verts, faces, 0.02, 0.25)
    assert count > 0
    # splats sit where the mesh is absent, plus mesh-BORDER points whose
    # corners poke past the threshold (center-or-any-corner rule); points
    # well inside the mesh interior must not splat
    centers = v.reshape(-1, 4, 3).mean(1)
    interior = (
        (centers[:, 0] > 0.08) & (centers[:, 0] < 0.32)
        & (centers[:, 1] > 0.08) & (centers[:, 1] < 0.92)
    )
    assert not interior.any()
    assert (centers[:, 0] > 0.38).mean() > 0.6
    # every point beyond x > 0.45 must have produced a splat
    expected = ((pts[:, 0] > 0.45)).sum()
    assert count >= expected
