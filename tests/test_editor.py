"""Editor operations + label sidecar tests."""

import numpy as np

from dataset_pipeline_tpu.editor import (
    apply_up_direction,
    crop_mesh_to_box,
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
