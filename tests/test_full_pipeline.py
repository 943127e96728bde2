"""End-to-end pipeline smoke test: every CLI tool in the reference order.

PointCloudCleaner → CubeMapRenderer → SfMScaleEstimator → ICPScanAligner →
NormalEstimator → SplatCreator → ImageRegistrator → GroundTruthCreator
(README.md:20-35 pipeline), all on one synthetic scene, asserting each
stage's outputs feed the next.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from dataset_pipeline_tpu.io import colmap as cio
from dataset_pipeline_tpu.io.depthmap import read_depth_raw
from dataset_pipeline_tpu.io.meshlab import MeshInfo, read_meshlab_project, write_meshlab_project
from dataset_pipeline_tpu.io.ply import PointCloud, read_ply, write_ply
from dataset_pipeline_tpu.ops.splat import (
    fill_color_from_depth,
    flood_fill_colors,
    render_points_depth_color,
)

RNG = np.random.RandomState(77)


def _scene(n=30000):
    u = RNG.rand(n)
    v = RNG.rand(n)
    x, y = u * 2, v * 2
    z = 0.12 * np.sin(3 * x) * np.cos(2.5 * y)
    pts = np.stack([x, y, z], -1).astype(np.float32)
    tex = (128 + 60 * np.sin(7 * x) * np.cos(9 * y) + 40 * np.sin(19 * x + 11 * y)).clip(0, 252)
    cols = np.stack([tex] * 3, -1).astype(np.uint8)
    return pts, cols


def _look_at(eye, target, up=np.asarray([0.0, 1.0, 0.0])):
    f = target - eye
    f /= np.linalg.norm(f)
    r = np.cross(f, up)
    r /= np.linalg.norm(r)
    d = np.cross(f, r)
    R = np.stack([r, d, f])
    return R, -R @ eye


def _quat(R):
    w = np.sqrt(max(0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    return np.asarray([w, (R[2, 1] - R[1, 2]) / (4 * w),
                       (R[0, 2] - R[2, 0]) / (4 * w), (R[1, 0] - R[0, 1]) / (4 * w)])


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    root = str(tmp_path)
    pts, cols = _scene()

    # --- 1. PointCloudCleaner ---
    outliers = (RNG.rand(40, 3).astype(np.float32) - 0.5) * 60 + np.asarray([30, 0, 0], np.float32)
    dirty = np.concatenate([pts, outliers])
    dirty_cols = np.concatenate([cols, np.zeros((40, 3), np.uint8)])
    write_ply(f"{root}/scan0.ply", PointCloud(dirty, None, dirty_cols))
    from dataset_pipeline_tpu.tools.point_cloud_cleaner import main as cleaner_main

    assert cleaner_main(["--in", f"{root}/scan0.ply", "--filter", "24,1.3"]) == 0
    cleaned = read_ply(f"{root}/scan0.inliers.ply")
    assert len(cleaned) < len(dirty)
    assert len(cleaned) >= len(pts) * 0.95

    # --- 2. CubeMapRenderer ---
    from dataset_pipeline_tpu.tools.cube_map_renderer import main as cube_main

    assert cube_main(["-c", f"{root}/scan0.inliers.ply", "-o",
                      f"{root}/scan0.ply", "--size", "128"]) == 0
    assert os.path.exists(f"{root}/scan0.ply.front.depth")
    assert os.path.exists(f"{root}/scan0.ply.intrinsics.txt")

    # --- 3. SfMScaleEstimator (synthetic SfM model at 1/2 metric scale) ---
    from dataset_pipeline_tpu.tools.sfm_scale_estimator import main as sfm_main

    # the scene (x,y in [0,2], z~0) is visible in the "right" (+X) face
    from dataset_pipeline_tpu.ops.splat import CUBE_FACE_ROTATIONS

    depth = read_depth_raw(f"{root}/scan0.ply.right.depth", 128, 128)
    ys, xs = np.nonzero(np.isfinite(depth))
    assert len(ys) > 100
    sel = RNG.choice(len(ys), size=min(60, len(ys)), replace=False)
    keyp = np.stack([xs[sel], ys[sel]], -1).astype(np.float64)
    f = c = 64.0
    zs = depth[ys[sel], xs[sel]]
    pts3_face = np.stack(
        [(keyp[:, 0] - c) / f * zs, (keyp[:, 1] - c) / f * zs, zs], -1)
    R_right = CUBE_FACE_ROTATIONS[3]  # world->face
    pts3_global = pts3_face @ R_right  # R^T applied rowwise
    TRUE_SCALE = 2.0
    os.makedirs(f"{root}/sfm", exist_ok=True)
    cams = {1: cio.ColmapCamera(1, "PINHOLE", 128, 128, np.asarray([f, f, c, c]))}
    imgs = {1: cio.ColmapImage(1, _quat(R_right), np.zeros(3), 1,
                               "scan0.ply.right.png", keyp,
                               np.arange(len(sel), dtype=np.int64))}
    points = {i: cio.ColmapPoint3D(i, pts3_global[i] / TRUE_SCALE,
                                   np.zeros(3, np.uint8), 0.1, [(1, i)])
              for i in range(len(sel))}
    cio.write_model(f"{root}/sfm", cio.ColmapModel(cams, imgs, points))
    assert sfm_main(["-s", f"{root}/sfm", "-si", root, "-i", root,
                     "-o", f"{root}/scaled"]) == 0
    m = read_meshlab_project(f"{root}/scaled/meshlab_project.mlp")
    assert len(m) == 1

    # --- 4. ICPScanAligner (second scan with a small offset) ---
    pts2, cols2 = _scene()
    write_ply(f"{root}/scan1.ply", PointCloud(pts2, None, cols2))
    M0, M1 = np.eye(4), np.eye(4)
    M1[:3, 3] = [0.02, -0.015, 0.01]
    write_meshlab_project(f"{root}/align_in.mlp",
                          [MeshInfo("scan0", "scan0.inliers.ply", M0),
                           MeshInfo("scan1", "scan1.ply", M1)])
    from dataset_pipeline_tpu.tools.icp_scan_aligner import main as icp_main

    assert icp_main(["-i", f"{root}/align_in.mlp", "-o", f"{root}/aligned.mlp",
                     "-d", "0.05", "--max_iterations", "20"]) == 0
    aligned = read_meshlab_project(f"{root}/aligned.mlp")
    assert np.linalg.norm(aligned[1].global_T_mesh[:3, 3]) < 5e-3  # offset removed

    # --- 5. NormalEstimator ---
    from dataset_pipeline_tpu.tools.normal_estimator import main as normals_main

    assert normals_main(["-i", f"{root}/aligned.mlp", "-o", f"{root}/merged.ply",
                         "--neighbor_count", "8"]) == 0
    merged = read_ply(f"{root}/merged.ply")
    assert merged.normals is not None

    # --- 6. SplatCreator (mesh covering only x<1; splats must fill the rest) ---
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [1, 2, 0], [0, 2, 0]], np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    write_ply(f"{root}/mesh.ply", PointCloud(verts, faces=faces))
    from dataset_pipeline_tpu.tools.splat_creator import main as splat_main

    assert splat_main(["--point_normal_cloud_path", f"{root}/merged.ply",
                       "--mesh_path", f"{root}/mesh.ply",
                       "--output_path", f"{root}/splats.ply",
                       "--distance_threshold", "0.05"]) == 0
    splats = read_ply(f"{root}/splats.ply")
    assert splats.faces is not None and len(splats.faces) > 0

    # --- 7. ImageRegistrator (2 rendered views, perturbed poses) ---
    W, H, fx, cx, cy = 200, 150, 170.0, 99.5, 74.5
    os.makedirs(f"{root}/images/dslr", exist_ok=True)
    from PIL import Image

    gt_poses = []
    imgs2 = {}
    for i, eye in enumerate([np.asarray([1.0, 1.0, -1.3]), np.asarray([1.2, 0.9, -1.25])]):
        R, t = _look_at(eye, np.asarray([1.0, 1.0, 0.0]))
        p_cam = pts @ R.T + t
        d, cimg = render_points_depth_color(jnp.asarray(p_cam), jnp.asarray(cols),
                                            W, H, fx, fx, cx, cy)
        cf, v = fill_color_from_depth(d, cimg)
        img = flood_fill_colors(cf, v)
        Image.fromarray(np.asarray(img)).convert("L").convert("RGB").save(
            f"{root}/images/dslr/v{i}.png")
        gt_poses.append((R, t))
        w_ = RNG.randn(3) * 0.003
        K = np.asarray([[0, -w_[2], w_[1]], [w_[2], 0, -w_[0]], [-w_[1], w_[0], 0]])
        Rp = (np.eye(3) + K) @ R
        u_, _, vt_ = np.linalg.svd(Rp)
        imgs2[i + 1] = cio.ColmapImage(i + 1, _quat(u_ @ vt_), t + RNG.randn(3) * 0.008,
                                       1, f"dslr/v{i}.png")
    cams2 = {1: cio.ColmapCamera(1, "PINHOLE", W, H,
                                 np.asarray([fx, fx, cx + 0.5, cy + 0.5]))}
    cio.write_model(f"{root}/state", cio.ColmapModel(cams2, imgs2, {}))
    write_meshlab_project(f"{root}/scene.mlp",
                          [MeshInfo("scene", "scan0.inliers.ply", np.eye(4))])
    from dataset_pipeline_tpu.tools.image_registrator import main as reg_main

    # --devices 8: the registrator shard_maps its photometric kernels over
    # the forced-8-device CPU mesh — the flagship multi-chip path reachable
    # from the CLI (r2 weak item)
    assert reg_main(["--scan_alignment_path", f"{root}/scene.mlp",
                     "--image_base_path", f"{root}/images",
                     "--state_path", f"{root}/state",
                     "--output_folder_path", f"{root}/reg",
                     "--max_iterations", "15", "--fix_intrinsics",
                     "--devices", "8",
                     "--write_debug_point_clouds"]) == 0
    dbg = read_ply(f"{root}/reg/initial_point_cloud.ply")
    assert dbg.colors is not None and (dbg.colors.sum(1) > 0).sum() > 1000
    refined = cio.read_model(f"{root}/reg/scale_1_state")
    for i, (R, t) in enumerate(gt_poses):
        init_err = np.linalg.norm(imgs2[i + 1].tvec - t)
        fin_err = np.linalg.norm(refined.images[i + 1].tvec - t)
        assert fin_err < max(init_err, 5e-3)

    # --- 8. GroundTruthCreator ---
    from dataset_pipeline_tpu.tools.ground_truth_creator import main as gt_main

    assert gt_main(["--scan_alignment_path", f"{root}/scene.mlp",
                    "--state_path", f"{root}/reg/scale_1_state",
                    "--output_folder_path", f"{root}/gt",
                    "--splat_radius", "0.01"]) == 0
    gt_depth = read_depth_raw(f"{root}/gt/ground_truth_depth/dslr/v0.png", H, W)
    valid = np.isfinite(gt_depth)
    assert valid.sum() > 500
    assert 0.3 < gt_depth[valid].min() < gt_depth[valid].max() < 10.0
    assert os.path.exists(f"{root}/gt/scan_alignment.mlp")

    # --- 9. DatasetInspector: renderings, mask draw + label transfer,
    #         localize-image (the GUI tools, headless) ---
    from dataset_pipeline_tpu.photometric.masks import (
        MASK_OBS, draw_mask_polygons, image_mask_path, load_mask, save_mask)
    from dataset_pipeline_tpu.tools.dataset_inspector import main as insp_main

    poly = np.asarray([[30, 30], [170, 30], [170, 120], [30, 120]], np.float64)
    mask = draw_mask_polygons((H, W), [(poly, MASK_OBS)])
    save_mask(image_mask_path(f"{root}/images", "dslr/v0.png"), mask)
    assert insp_main(["--scan_alignment_path", f"{root}/scene.mlp",
                      "--state_path", f"{root}/reg/scale_1_state",
                      "--image_base_path", f"{root}/images",
                      "--output_folder_path", f"{root}/inspect",
                      "--modes", "depth,scan,cost,cost_combined,points",
                      "--splat_radius", "0.01",
                      "--transfer_source", "dslr/v0.png",
                      "--transfer_target", "dslr/v1.png"]) == 0
    assert os.path.exists(f"{root}/inspect/v0.depth.png")
    assert os.path.exists(f"{root}/inspect/v1.scan.png")
    assert os.path.exists(f"{root}/inspect/v0.cost.png")
    assert os.path.exists(f"{root}/inspect/v0.points.png")
    pimg = np.asarray(__import__("PIL.Image", fromlist=["open"]).open(
        f"{root}/inspect/v0.points.png"))
    assert (pimg.max(-1) > 0).sum() > 100  # visible optimization points drawn
    assert os.path.exists(f"{root}/inspect/v1.cost_combined.png")
    tmask = load_mask(image_mask_path(f"{root}/images", "dslr/v1.png"))
    assert tmask is not None and (tmask == MASK_OBS).sum() > 100

    # localize: perturb v0's pose in a copy of the state, then recover it
    # from 2D-3D correspondences generated with the refined pose
    import shutil

    from dataset_pipeline_tpu.models import cameras as cmod
    from dataset_pipeline_tpu.models.lie import quat_to_matrix

    shutil.copytree(f"{root}/reg/scale_1_state", f"{root}/loc_state")
    model_loc = cio.read_model(f"{root}/loc_state")
    im0 = model_loc.images[1]
    R0 = np.asarray(quat_to_matrix(jnp.asarray(im0.qvec, jnp.float32)))
    cam0 = cmod.make_camera("PINHOLE", W, H, np.asarray([fx, fx, cx, cy]))
    sel9 = RNG.choice(len(pts), 40, replace=False)
    p_cam0 = pts[sel9] @ R0.T + im0.tvec
    pix0, v0ok = cmod.project(cam0, jnp.asarray(p_cam0, jnp.float32))
    pix0, v0ok = np.asarray(pix0), np.asarray(v0ok)
    corr = np.concatenate([pix0[v0ok], pts[sel9][v0ok]], -1)
    assert len(corr) >= 6
    np.savetxt(f"{root}/corr.txt", corr)
    true_tvec = im0.tvec.copy()
    im0.tvec = im0.tvec + np.asarray([0.02, -0.015, 0.01])
    cio.write_model(f"{root}/loc_state", model_loc)
    assert insp_main(["--scan_alignment_path", f"{root}/scene.mlp",
                      "--state_path", f"{root}/loc_state",
                      "--image_base_path", f"{root}/images",
                      "--output_folder_path", f"{root}/inspect",
                      "--modes", "",
                      "--localize_image", "dslr/v0.png",
                      "--correspondences", f"{root}/corr.txt"]) == 0
    relocalized = cio.read_model(f"{root}/loc_state")
    assert np.linalg.norm(relocalized.images[1].tvec - true_tvec) < 1e-3

    # pose nudge (the GUI arrow buttons, gui_main_window.cc:850-865):
    # exp(delta) . image_T_global in the camera frame
    before = cio.read_model(f"{root}/loc_state").images[1]
    assert insp_main(["--scan_alignment_path", f"{root}/scene.mlp",
                      "--state_path", f"{root}/loc_state",
                      "--output_folder_path", f"{root}/inspect",
                      "--modes", "",
                      "--nudge_image", "dslr/v0.png",
                      "--nudge", "0.01 0 0 0 0 0"]) == 0
    after = cio.read_model(f"{root}/loc_state").images[1]
    np.testing.assert_allclose(after.tvec - before.tvec,
                               [0.01, 0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(after.qvec, before.qvec, atol=1e-9)
