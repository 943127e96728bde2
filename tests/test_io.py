"""I/O codec round-trip tests (PLY, .mlp, COLMAP model, depth maps)."""

import os

import numpy as np

from dataset_pipeline_tpu.io import (
    MeshInfo,
    PointCloud,
    colmap,
    read_depth_raw,
    read_meshlab_project,
    read_ply,
    write_depth_raw,
    write_meshlab_project,
    write_ply,
)
from dataset_pipeline_tpu.io.depthmap import read_cube_intrinsics, write_cube_intrinsics

RNG = np.random.RandomState(11)


def _cloud(n=100, normals=True, colors=True, faces=False):
    pc = PointCloud(
        RNG.randn(n, 3).astype(np.float32),
        RNG.randn(n, 3).astype(np.float32) if normals else None,
        RNG.randint(0, 256, (n, 3)).astype(np.uint8) if colors else None,
        RNG.randint(0, n, (20, 3)).astype(np.int32) if faces else None,
    )
    return pc


def test_ply_binary_roundtrip(tmp_path):
    pc = _cloud(faces=True)
    p = str(tmp_path / "c.ply")
    write_ply(p, pc, binary=True)
    pc2 = read_ply(p)
    np.testing.assert_array_equal(pc.positions, pc2.positions)
    np.testing.assert_array_equal(pc.normals, pc2.normals)
    np.testing.assert_array_equal(pc.colors, pc2.colors)
    np.testing.assert_array_equal(pc.faces, pc2.faces)


def test_ply_ascii_roundtrip(tmp_path):
    pc = _cloud(n=20, normals=False)
    p = str(tmp_path / "c.ply")
    write_ply(p, pc, binary=False)
    pc2 = read_ply(p)
    np.testing.assert_allclose(pc.positions, pc2.positions, rtol=1e-6)
    np.testing.assert_array_equal(pc.colors, pc2.colors)
    assert pc2.normals is None


def test_ply_extras_roundtrip(tmp_path):
    pc = _cloud(n=30, normals=False, colors=False)
    pc.extras["intensity"] = RNG.rand(30).astype(np.float32)
    p = str(tmp_path / "c.ply")
    write_ply(p, pc)
    pc2 = read_ply(p)
    np.testing.assert_array_equal(pc.extras["intensity"], pc2.extras["intensity"])


def test_meshlab_roundtrip(tmp_path):
    M = np.eye(4)
    M[:3, :3] = 1.5 * np.asarray(
        [[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64
    )
    M[:3, 3] = [1.0, -2.0, 3.0]
    meshes = [
        MeshInfo("scan1", "scan1.ply", M),
        MeshInfo("scan2", "sub/scan2.ply", np.eye(4)),
    ]
    p = str(tmp_path / "proj.mlp")
    write_meshlab_project(p, meshes)
    meshes2 = read_meshlab_project(p)
    assert [m.label for m in meshes2] == ["scan1", "scan2"]
    assert [m.filename for m in meshes2] == ["scan1.ply", "sub/scan2.ply"]
    np.testing.assert_allclose(meshes2[0].global_T_mesh, M, rtol=1e-6)
    assert meshes2[1].resolved_path(p) == str(tmp_path / "sub/scan2.ply")


def test_colmap_model_roundtrip(tmp_path):
    cams = {
        1: colmap.ColmapCamera(1, "PINHOLE", 640, 480, np.asarray([340.0, 341.0, 320.0, 240.0])),
        2: colmap.ColmapCamera(2, "THIN_PRISM_FISHEYE", 800, 600,
                               np.asarray([3e2, 3e2, 4e2, 3e2, 0.1, -0.05, 1e-3, -1e-3, 0.0, 0.0, 1e-4, 2e-4])),
    }
    q = np.asarray([0.9238795, 0.0, 0.3826834, 0.0])
    imgs = {
        5: colmap.ColmapImage(5, q, np.asarray([0.5, -1.0, 2.0]), 1, "dslr/img1.jpg",
                              np.asarray([[10.5, 20.5], [30.0, 40.0]]),
                              np.asarray([7, -1], np.int64)),
        6: colmap.ColmapImage(6, np.asarray([1.0, 0, 0, 0]), np.zeros(3), 2, "rig/img2.jpg"),
    }
    pts = {7: colmap.ColmapPoint3D(7, np.asarray([1.0, 2.0, 3.0]),
                                   np.asarray([10, 20, 30], np.uint8), 0.5, [(5, 0)])}
    folder = str(tmp_path / "model")
    colmap.write_model(folder, colmap.ColmapModel(cams, imgs, pts))
    m = colmap.read_model(folder, read_points=True)
    assert set(m.cameras) == {1, 2}
    assert m.cameras[2].model == "THIN_PRISM_FISHEYE"
    np.testing.assert_allclose(m.cameras[2].params, cams[2].params, rtol=1e-6)
    np.testing.assert_allclose(m.images[5].qvec, q, rtol=1e-6)
    np.testing.assert_allclose(m.images[5].xys, imgs[5].xys)
    np.testing.assert_array_equal(m.images[5].point3d_ids, imgs[5].point3d_ids)
    assert m.images[6].name == "rig/img2.jpg"
    assert len(m.images[6].xys) == 0
    assert m.points[7].track == [(5, 0)]


def test_rigs_json_roundtrip(tmp_path):
    rigs = [colmap.ColmapRig(1, [colmap.ColmapRigCamera(1, "cam0/"),
                                 colmap.ColmapRigCamera(2, "cam1/")])]
    p = str(tmp_path / "rigs.json")
    colmap.write_rigs_json(p, rigs)
    rigs2 = colmap.read_rigs_json(p)
    assert rigs2[0].ref_camera_id == 1
    assert [c.image_prefix for c in rigs2[0].cameras] == ["cam0/", "cam1/"]


def test_depth_raw_roundtrip(tmp_path):
    d = RNG.rand(48, 64).astype(np.float32)
    p1 = write_depth_raw(str(tmp_path / "a.depth"), d, compress=False)
    p2 = write_depth_raw(str(tmp_path / "b.depth"), d, compress=True)
    assert p2.endswith(".gz")
    np.testing.assert_array_equal(read_depth_raw(p1, 48, 64), d)
    np.testing.assert_array_equal(read_depth_raw(p2, 48, 64), d)


def test_cube_intrinsics_roundtrip(tmp_path):
    p = str(tmp_path / "cube.intrinsics.txt")
    write_cube_intrinsics(p, 2048, 2048, 1024.0, 1024.0, 1024.0, 1024.0)
    w, h, fx, fy, cx, cy = read_cube_intrinsics(p)
    assert (w, h) == (2048, 2048)
    assert fx == 1024.0 and cy == 1024.0
