"""Mesh rasterizer tests, mirroring the reference Test_Renderer pattern:
mesh vertices placed exactly on unprojected pixel rays at known depths,
rendered, and compared per pixel; plus occlusion-boundary masking checks."""

import numpy as np
import pytest

import jax.numpy as jnp

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.ops.mesh_raster import (
    build_occlusion_mesh,
    render_occlusion_mesh_depth,
)

RNG = np.random.RandomState(17)


def _grid_mesh_on_rays(cam, step, depth_fn):
    """Vertices on exact pixel rays (reference test_renderer.cc:43-148)."""
    xs = np.arange(0, cam.width, step)
    ys = np.arange(0, cam.height, step)
    nx, ny = len(xs), len(ys)
    gx, gy = np.meshgrid(xs, ys)
    pix = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1), jnp.float32)
    depths = np.asarray([depth_fn(x, y) for y in ys for x in xs], np.float32)
    pts = np.asarray(cm.unproject(cam, pix, jnp.asarray(depths)))
    faces = []
    for j in range(ny - 1):
        for i in range(nx - 1):
            v = j * nx + i
            faces.append([v, v + 1, v + nx])
            faces.append([v + 1, v + nx + 1, v + nx])
    return pts, np.asarray(faces, np.int32), depths.reshape(ny, nx)


def test_planar_mesh_depth_exact():
    cam = cm.make_camera("PINHOLE", 64, 48, [50.0, 50.0, 31.5, 23.5])
    pts, faces, _ = _grid_mesh_on_rays(cam, 4, lambda x, y: 2.0)
    mesh = build_occlusion_mesh(pts, faces)
    depth = np.asarray(render_occlusion_mesh_depth(
        cam, SE3.identity(), mesh, edge_splats=False))
    # interior pixels must be exactly 2.0 (flat plane -> 1/z interp exact)
    interior = depth[5:-5, 5:-5]
    covered = interior > 0
    assert covered.mean() > 0.95
    np.testing.assert_allclose(interior[covered], 2.0, atol=1e-3)
    # background (beyond the last vertex row/col) is 0
    assert depth[47, 63] == 0.0


def test_slanted_mesh_depth():
    cam = cm.make_camera("PINHOLE", 64, 48, [50.0, 50.0, 31.5, 23.5])
    depth_fn = lambda x, y: 2.0 + 0.01 * x
    pts, faces, _ = _grid_mesh_on_rays(cam, 4, depth_fn)
    mesh = build_occlusion_mesh(pts, faces)
    depth = np.asarray(render_occlusion_mesh_depth(
        cam, SE3.identity(), mesh, edge_splats=False))
    ys, xs = np.mgrid[8:40, 8:56]
    expected = 2.0 + 0.01 * xs
    got = depth[8:40, 8:56]
    covered = got > 0
    assert covered.mean() > 0.95
    # perspective-correct interpolation across faces; small px-quantization slack
    np.testing.assert_allclose(got[covered], expected[covered], atol=0.02)


def test_distorted_camera_vertices():
    cam = cm.make_camera("SIMPLE_RADIAL", 64, 48, [50.0, 31.5, 23.5, 0.08])
    pts, faces, _ = _grid_mesh_on_rays(cam, 2, lambda x, y: 1.5)
    mesh = build_occlusion_mesh(pts, faces)
    depth = np.asarray(render_occlusion_mesh_depth(
        cam, SE3.identity(), mesh, edge_splats=False))
    interior = depth[10:-10, 10:-10]
    covered = interior > 0
    assert covered.mean() > 0.9
    np.testing.assert_allclose(interior[covered], 1.5, atol=2e-3)


from test_cameras import MODEL_PARAMS


@pytest.mark.parametrize("model", sorted(MODEL_PARAMS))
def test_all_camera_models_vertex_distortion(model):
    """Per-model renderer validation (reference Test_Renderer runs one case
    per camera model, ``opt/test/test_renderer.cc:43-148``): vertices on
    exact pixel rays of the distorted camera at constant depth must render
    back to that depth."""
    full = cm.make_camera(model, 640, 480, MODEL_PARAMS[model])
    cam = cm.scaled_by(full, 0.1)  # 64x48, same distortion field
    pts, faces, _ = _grid_mesh_on_rays(cam, 4, lambda x, y: 1.5)
    keep = np.isfinite(pts).all(1)
    assert keep.mean() > 0.9, "unprojection failed over the image"
    mesh = build_occlusion_mesh(pts, faces)
    depth = np.asarray(render_occlusion_mesh_depth(
        cam, SE3.identity(), mesh, edge_splats=False))
    interior = depth[8:-8, 8:-8]
    covered = interior > 0
    assert covered.mean() > 0.8, model
    np.testing.assert_allclose(interior[covered], 1.5, atol=5e-3)


def test_occlusion_boundary_masking():
    cam = cm.make_camera("PINHOLE", 64, 48, [50.0, 50.0, 31.5, 23.5])
    # background plane covering everything at z=3
    pts_bg, faces_bg, _ = _grid_mesh_on_rays(cam, 4, lambda x, y: 3.0)
    # foreground square covering left half at z=1.5 with a silhouette edge
    xs = np.linspace(-0.8, 0.0, 9)
    ys = np.linspace(-0.5, 0.5, 9)
    gx, gy = np.meshgrid(xs, ys)
    pts_fg = np.stack([gx.ravel() * 1.5, gy.ravel() * 1.5,
                       np.full(gx.size, 1.5)], -1).astype(np.float32)
    faces_fg = []
    for j in range(8):
        for i in range(8):
            v = j * 9 + i
            faces_fg.append([v, v + 1, v + 9])
            faces_fg.append([v + 1, v + 10, v + 9])
    pts = np.concatenate([pts_bg, pts_fg])
    faces = np.concatenate([faces_bg, np.asarray(faces_fg, np.int32) + len(pts_bg)])
    mesh = build_occlusion_mesh(pts, faces)
    depth = np.asarray(render_occlusion_mesh_depth(
        cam, SE3.identity(), mesh, splat_radius=0.03, edge_splats=True))
    # foreground visible at its depth in the middle-left
    assert abs(depth[24, 10] - 1.5) < 0.01
    # background visible on the right
    assert abs(depth[24, 55] - 3.0) < 0.01
    # the foreground square's right boundary projects to x = 31.5; a -1 band
    # must appear just right of it (on the background side)
    band = depth[10:38, 30:36]
    assert (band == -1.0).any()


def test_boundary_edges_always_splat():
    cam = cm.make_camera("PINHOLE", 64, 48, [50.0, 50.0, 31.5, 23.5])
    # single open triangle in front of nothing: boundary edges splat over
    # background
    pts = np.asarray([[-0.2, -0.2, 1.0], [0.2, -0.2, 1.0], [0.0, 0.2, 1.0]], np.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    mesh = build_occlusion_mesh(pts, faces)
    assert int((np.asarray(mesh.edge_faces)[:, 1] < 0).sum()) == 3
    depth = np.asarray(render_occlusion_mesh_depth(
        cam, SE3.identity(), mesh, splat_radius=0.05, edge_splats=True))
    assert (depth == -1.0).any()


def test_mesh_color_raster():
    """Color readback parity (``opengl/renderer.h:319-321``): vertex colors
    on exact pixel rays reproduce at their pixels; a linear color ramp
    across a planar mesh interpolates exactly (perspective-correct)."""
    from dataset_pipeline_tpu.ops.mesh_raster import render_mesh_depth_color

    cam = cm.make_camera("PINHOLE", 64, 48, [50.0, 50.0, 31.5, 23.5])
    pts, faces, _ = _grid_mesh_on_rays(cam, 4, lambda x, y: 2.0)
    # color ramp linear in x,y: barycentric interpolation is exact on a plane
    cols = np.stack([pts[:, 0] * 10 + 100, pts[:, 1] * 10 + 100,
                     np.full(len(pts), 55.0)], -1).astype(np.float32)
    depth, color = render_mesh_depth_color(cam, SE3.identity(),
                                           build_occlusion_mesh(pts, faces),
                                           cols)
    depth, color = np.asarray(depth), np.asarray(color)
    covered = depth[5:-5, 5:-5] > 0
    assert covered.mean() > 0.95
    # expected color at pixel (x,y): the plane point is on the pixel ray
    ys, xs = np.mgrid[5:43, 5:59]
    pix = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    p = np.asarray(cm.unproject(cam, pix, jnp.full(pix.shape[0], 2.0)))
    exp_r = (p[:, 0] * 10 + 100).reshape(ys.shape)
    got_r = color[5:-5, 5:-5, 0]
    np.testing.assert_allclose(got_r[covered], exp_r[covered], atol=0.1)
    np.testing.assert_allclose(color[5:-5, 5:-5, 2][covered], 55.0, atol=0.1)
    # background color is 0
    assert color[47, 63].max() == 0.0


def test_mesh_depth_batch_matches_single():
    from dataset_pipeline_tpu.ops.mesh_raster import (
        render_occlusion_mesh_depth_batch,
    )

    cam = cm.make_camera("PINHOLE", 64, 48, [50.0, 50.0, 31.5, 23.5])
    pts, faces, _ = _grid_mesh_on_rays(cam, 4, lambda x, y: 2.0 + 0.01 * x)
    mesh = build_occlusion_mesh(pts, faces)
    qs, ts = [], []
    rng = np.random.RandomState(3)
    for _ in range(3):
        q = np.asarray([1.0, *(0.01 * rng.randn(3))])
        q /= np.linalg.norm(q)
        qs.append(q)
        ts.append(0.02 * rng.randn(3))
    pose_q = jnp.asarray(np.stack(qs), jnp.float32)
    pose_t = jnp.asarray(np.stack(ts), jnp.float32)
    batch = np.asarray(render_occlusion_mesh_depth_batch(
        cam, pose_q, pose_t, mesh, splat_radius=0.01))
    for i in range(3):
        single = np.asarray(render_occlusion_mesh_depth(
            cam, SE3(pose_q[i], pose_t[i]), mesh, splat_radius=0.01))
        np.testing.assert_allclose(batch[i], single, atol=1e-5)
