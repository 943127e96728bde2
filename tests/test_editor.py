"""Editor operations + label sidecar tests."""

import numpy as np

from dataset_pipeline_tpu.editor import (
    apply_up_direction,
    clip_mesh_to_box,
    crop_mesh_to_box,
    csg_box,
    delete_points,
    move_points,
    read_label_definitions,
    read_labels,
    select_beyond_plane,
    select_lasso,
    write_labels,
)
from dataset_pipeline_tpu.models import cameras as cm

RNG = np.random.RandomState(31)


def test_lasso_selection():
    cam = cm.make_camera("PINHOLE", 64, 48, [50.0, 50.0, 31.5, 23.5])
    pts = np.zeros((100, 3), np.float32)
    pts[:, 2] = 2.0
    pts[:50, 0] = -0.5  # projects left
    pts[50:, 0] = 0.5  # projects right
    T = np.eye(4)
    # lasso around the left half of the image
    poly = np.asarray([[0, 0], [31, 0], [31, 47], [0, 47]], np.float64)
    mask = select_lasso(pts, cam, T, poly)
    assert mask[:50].all()
    assert not mask[50:].any()


def test_beyond_plane():
    pts = RNG.randn(200, 3)
    mask = select_beyond_plane(pts, [0, 0, 0], [1, 0, 0], [0, 1, 0])  # z=0 plane, n=+z
    np.testing.assert_array_equal(mask, pts[:, 2] > 0)


def test_up_direction():
    pts = RNG.randn(50, 3).astype(np.float32)
    up = np.asarray([1.0, 1.0, 1.0])
    rotated, R = apply_up_direction(pts, up)
    np.testing.assert_allclose(R @ (up / np.linalg.norm(up)), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(rotated, pts @ R.T, atol=1e-6)


def test_crop_mesh():
    verts = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5], [6, 5, 5], [5, 6, 5]], np.float32
    )
    faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    v2, f2 = crop_mesh_to_box(verts, faces, [-1, -1, -1], [2, 2, 2])
    assert len(f2) == 1 and len(v2) == 3
    np.testing.assert_allclose(v2[f2[0]], verts[:3])
    v3, f3 = crop_mesh_to_box(verts, faces, [-1, -1, -1], [2, 2, 2], keep_inside=False)
    assert len(f3) == 1
    np.testing.assert_allclose(v3[f3[0]], verts[3:])


def _mesh_area(verts, faces):
    if len(faces) == 0:
        return 0.0
    tri = verts[faces].astype(np.float64)
    return 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
    ).sum()


def test_clip_mesh_exact_partition():
    """Straddling triangles are clipped exactly: inside + outside areas sum
    to the original, cut vertices land on the box surface."""
    # random triangle soup around the box [0,1]^3
    verts = (RNG.rand(60, 3) * 3.0 - 1.0).astype(np.float64)
    faces = np.arange(60, dtype=np.int32).reshape(20, 3)
    bmin, bmax = [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]
    vi, fi = clip_mesh_to_box(verts, faces, bmin, bmax, keep_inside=True)
    vo, fo = clip_mesh_to_box(verts, faces, bmin, bmax, keep_inside=False)
    total = _mesh_area(verts, faces)
    got = _mesh_area(vi, fi) + _mesh_area(vo, fo)
    np.testing.assert_allclose(got, total, rtol=1e-5)
    # every inside-part vertex lies in the (slightly padded) box
    if len(vi):
        assert (vi >= -1e-5).all() and (vi <= 1 + 1e-5).all()


def test_clip_single_straddling_triangle():
    # triangle crossing the x=1 plane of box [0,1]^3
    verts = np.asarray(
        [[0.5, 0.2, 0.5], [2.0, 0.2, 0.5], [0.5, 0.8, 0.5]], np.float64
    )
    faces = np.asarray([[0, 1, 2]], np.int32)
    vi, fi = clip_mesh_to_box(verts, faces, [0, 0, 0], [1, 1, 1], True)
    vo, fo = clip_mesh_to_box(verts, faces, [0, 0, 0], [1, 1, 1], False)
    assert len(fi) >= 1 and len(fo) >= 1
    assert vi[:, 0].max() <= 1 + 1e-9
    assert vo[:, 0].min() >= 1 - 1e-9
    np.testing.assert_allclose(
        _mesh_area(vi, fi) + _mesh_area(vo, fo), _mesh_area(verts, faces),
        rtol=1e-9,
    )


def test_csg_union_adds_box_surface():
    verts = np.asarray(
        [[-2, -2, 0.5], [2, -2, 0.5], [0, 2, 0.5]], np.float32
    )
    faces = np.asarray([[0, 1, 2]], np.int32)
    v, f = csg_box(verts, faces, [0, 0, 0], [1, 1, 1], "union")
    # area = clipped plane part + 6 unit box faces
    plane_in = _mesh_area(*clip_mesh_to_box(verts, faces, [0, 0, 0],
                                            [1, 1, 1], True))
    np.testing.assert_allclose(
        _mesh_area(v, f), _mesh_area(verts, faces) - plane_in + 6.0,
        rtol=1e-5,
    )


def test_move_delete_points():
    pts = RNG.randn(10, 3).astype(np.float32)
    colors = RNG.randint(0, 255, (10, 3)).astype(np.uint8)
    mask = np.zeros(10, bool)
    mask[[1, 4]] = True
    rem, moved = move_points(pts, np.zeros((2, 3), np.float32), mask)
    assert len(rem) == 8 and len(moved) == 4
    np.testing.assert_allclose(moved[2:], pts[[1, 4]])
    kept, kept_colors = delete_points(pts, mask, colors)
    assert len(kept) == 8
    np.testing.assert_array_equal(kept_colors, colors[~mask])


def test_labels_roundtrip(tmp_path):
    defs_path = str(tmp_path / "labels.txt")
    with open(defs_path, "w") as f:
        f.write("# comment\n0 unlabeled 70 70 70\n2 building 200 0 0\n")
    defs = read_label_definitions(defs_path)
    assert defs[2].name == "building"
    np.testing.assert_array_equal(defs[0].color, [70, 70, 70])

    labels = RNG.randint(0, 3, 500).astype(np.uint8)
    p = str(tmp_path / "cloud.labels")
    write_labels(p, labels)
    np.testing.assert_array_equal(read_labels(p, 500), labels)
