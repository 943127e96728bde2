"""Joint multi-scene scan+image Schur BA on REAL residual rows.

Two synthetic scenes share one pinhole camera; each scene has two laser
scans sampling the same height-field surface plus rendered images. Rows
are actual photometric descriptor residuals (with the scan-pose chain) and
symmetric point-to-plane ICP rows. Checks: the sharded Schur-reduced step
equals a dense float64 reference solve of the same damped system, and
applying the step reduces the true robust-weighted cost and the scan-pose
error. (VERDICT r2 item 2; reference: ``intrinsics_and_pose_optimizer.cc:
442-473`` variable indexing, ``.cc:70-73,217`` Schur as future work.)
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.ops.splat import (
    fill_color_from_depth,
    flood_fill_colors,
    render_points_depth_color,
)
from dataset_pipeline_tpu.parallel.ba import (
    JointScene,
    build_joint_rows,
    joint_ba_step,
)
from dataset_pipeline_tpu.parallel.mesh import make_data_mesh, shard_rows
from dataset_pipeline_tpu.photometric.multiscale import PointLevel
from dataset_pipeline_tpu.photometric.problem import (
    ImageGroup,
    PhotoProblem,
    build_image_pyramid,
    build_photo_level,
)

W, H = 128, 96
F, CX, CY = 110.0, 63.5, 47.5


def _surface(xy, phase):
    x, y = xy[:, 0], xy[:, 1]
    z = 0.1 * np.sin(3 * x + phase) * np.cos(2.5 * y)
    return np.stack([x, y, z], -1).astype(np.float32)


def _surface_normals(xy, phase):
    x, y = xy[:, 0], xy[:, 1]
    dzdx = 0.3 * np.cos(3 * x + phase) * np.cos(2.5 * y)
    dzdy = -0.25 * np.sin(3 * x + phase) * np.sin(2.5 * y)
    n = np.stack([-dzdx, -dzdy, np.ones_like(x)], -1)
    return (n / np.linalg.norm(n, axis=-1, keepdims=True)).astype(np.float32)


def _texture(xy):
    return (128 + 60 * np.sin(7 * xy[:, 0]) * np.cos(9 * xy[:, 1])).clip(5, 250)


def _look_at(eye):
    target = np.asarray([1.0, 1.0, 0.0])
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    r = np.cross(fwd, [0.0, 1.0, 0.0])
    r = r / np.linalg.norm(r)
    d = np.cross(fwd, r)
    R = np.stack([r, d, fwd])
    return R, -R @ eye


def _build_scene(seed, cam, phase, scan1_delta, pose_deltas):
    """One scene: two scans of the same surface, 2 rendered images; scan 1
    and the image poses are PERTURBED away from the rendered ground truth."""
    rng = np.random.RandomState(seed)
    n_half = 800
    xy0 = rng.uniform(0.2, 1.8, (n_half, 2))
    xy1 = rng.uniform(0.2, 1.8, (n_half, 2))
    pts0, pts1 = _surface(xy0, phase), _surface(xy1, phase)
    normals1 = _surface_normals(xy1, phase)
    inten = np.concatenate([_texture(xy0), _texture(xy1)]).astype(np.float32)
    pts_gt = np.concatenate([pts0, pts1]).astype(np.float32)
    scans = np.concatenate([np.zeros(n_half), np.ones(n_half)]).astype(np.uint8)
    cols = np.stack([inten] * 3, -1).astype(np.uint8)

    mats, imgs = [], []
    for eye in ([1.0, 1.0, -2.0], [1.3, 1.1, -1.9]):
        R, t = _look_at(np.asarray(eye))
        p_cam = pts_gt @ R.T + t
        d, c = render_points_depth_color(jnp.asarray(p_cam), jnp.asarray(cols),
                                         W, H, F, F, CX, CY)
        cf, v = fill_color_from_depth(d, c)
        imgs.append(np.asarray(flood_fill_colors(cf, v))[..., 0])
        m = np.eye(4, dtype=np.float32)
        m[:3, :3], m[:3, 3] = R, t
        mats.append(m)
    poses_gt = SE3.from_matrix(jnp.asarray(np.stack(mats), jnp.float32))

    # perturb scan 1 (left-multiplicative, global frame) and the image poses
    d_scan = SE3.exp(jnp.asarray(scan1_delta, jnp.float32))
    pts = pts_gt.copy()
    pts[scans == 1] = np.asarray(d_scan.apply(jnp.asarray(pts_gt[scans == 1])))
    normals1_p = np.asarray(
        d_scan.apply(jnp.asarray(pts_gt[scans == 1] + normals1))
        - d_scan.apply(jnp.asarray(pts_gt[scans == 1])))
    poses = SE3.exp(jnp.asarray(pose_deltas, jnp.float32)).compose(poses_gt)

    level_raw = PointLevel(pts, inten, scans, 0.02)
    level = build_photo_level(level_raw, apply_gradient_filter=False, seed=seed)
    pyr = build_image_pyramid(np.stack(imgs), 2)
    group = ImageGroup(camera=cam, pyramid=pyr, poses=poses, image_ids=[0, 1])
    problem = PhotoProblem(groups=[group], levels=[level],
                           occlusion_points=jnp.asarray(pts),
                           occlusion_radius=0.03, scale_count=2)

    # ICP correspondences in the CURRENT (perturbed) state: for each scan-1
    # point, nearest scan-0 point; normals on both sides
    from dataset_pipeline_tpu.ops.knn import knn_bruteforce

    p1 = pts[scans == 1]
    p0 = pts[scans == 0]
    d2, idx = knn_bruteforce(jnp.asarray(p1), jnp.asarray(p0), 1)
    idx = np.asarray(idx)[:, 0]
    keep = np.asarray(d2)[:, 0] < 0.05 ** 2
    n0 = _surface_normals(xy0, phase)
    icp = (p0[idx][keep], n0[idx][keep], p1[keep], normals1_p[keep],
           np.zeros(int(keep.sum()), np.int32), np.ones(int(keep.sum()), np.int32))
    return problem, icp, d_scan, poses_gt


def _weighted_cost(rows, r, w):
    return float(np.sum(w * r * r))


def test_joint_ba_real_rows_schur_equals_dense_and_descends():
    cam = cm.make_camera("PINHOLE", W, H, [F, F, CX, CY])
    rng = np.random.RandomState(3)
    scenes = []
    gt = []
    for si, (seed, phase) in enumerate([(10, 0.0), (20, 0.7)]):
        scan1_delta = 0.008 * rng.randn(6).astype(np.float32)
        pose_deltas = 0.003 * rng.randn(2, 6).astype(np.float32)
        problem, icp, d_scan, poses_gt = _build_scene(
            seed, cam, phase, scan1_delta, pose_deltas)
        scenes.append(JointScene(problem, 0, icp, icp_weight=30.0))
        gt.append((d_scan, poses_gt))

    rows, r, w, n_keep, m = build_joint_rows(scenes, obs_scale=0.0)
    assert m == 4  # 2 scenes x 2 images
    P_int = 4
    assert n_keep == P_int + 6 * 2  # shared intrinsics + one free scan/scene
    assert rows.shape[1] == n_keep + 6 * m
    # real rows: every block populated somewhere
    assert np.abs(rows[:, :P_int]).max() > 0
    assert np.abs(rows[:, P_int:n_keep]).max() > 0
    assert np.abs(rows[:, n_keep:]).max() > 0
    assert np.isfinite(rows).all() and np.isfinite(r).all()

    lam = 1e-3
    # dense float64 reference solve of the SAME damped system
    rw = rows.astype(np.float64) * w[:, None].astype(np.float64)
    Hd = rw.T @ rows.astype(np.float64)
    bd = rw.T @ r.astype(np.float64)
    xd = np.linalg.solve(Hd + lam * np.eye(len(Hd)), bd)

    # sharded Schur step over the 8-device CPU mesh
    mesh = make_data_mesh()
    nd = mesh.devices.size
    pad = (-len(rows)) % nd
    rows_p = np.pad(rows, ((0, pad), (0, 0)))
    r_p = np.pad(r, (0, pad))
    w_p = np.pad(w, (0, pad))

    def row_fn(rows, r, w):
        return rows, r, w

    xk, xi, cost = joint_ba_step(
        mesh, row_fn,
        (shard_rows(mesh, jnp.asarray(rows_p)), shard_rows(mesh, jnp.asarray(r_p)),
         shard_rows(mesh, jnp.asarray(w_p))),
        (P("data"), P("data"), P("data")), n_keep, m, lam=lam)
    x = np.concatenate([np.asarray(xk), np.asarray(xi).reshape(-1)])

    # the Schur-reduced f32 step solves the damped system (f64 residual check)
    res = np.linalg.norm((Hd + lam * np.eye(len(Hd))) @ x - bd)
    assert res / max(np.linalg.norm(bd), 1e-9) < 1e-3
    np.testing.assert_allclose(x, xd, rtol=5e-2, atol=2e-4)

    # applying the step (exp(-delta) convention) reduces the robust-weighted
    # cost; iterating the damped GN step converges the scan poses
    def apply_step(scenes, x):
        x_int = x[:P_int]
        out, fixes = [], []
        for si, sc in enumerate(scenes):
            g = sc.problem.groups[0]
            prm = g.camera.params - jnp.asarray(x_int, jnp.float32)
            cam_new = g.camera.with_params(prm)
            o = P_int + 6 * si
            d_scan_fix = SE3.exp(jnp.asarray(-x[o:o + 6], jnp.float32))
            fixes.append(d_scan_fix)
            lv = sc.problem.levels[0]
            pts = np.asarray(lv.points).copy()
            scans = np.asarray(lv.scan_indices)
            pts[scans == 1] = np.asarray(
                d_scan_fix.apply(jnp.asarray(pts[scans == 1])))
            lv_new = type(lv)(jnp.asarray(pts), lv.intensities, lv.scan_indices,
                              lv.neighbors, lv.fixed_descriptors, lv.radius)
            ob = n_keep + 6 * (2 * si)
            dp = -x[ob:ob + 12].reshape(2, 6).astype(np.float32)
            poses_new = SE3.exp(jnp.asarray(dp)).compose(g.poses)
            g_new = ImageGroup(camera=cam_new, pyramid=g.pyramid,
                               poses=poses_new, image_ids=g.image_ids)
            pr_new = PhotoProblem(groups=[g_new], levels=[lv_new],
                                  occlusion_points=sc.problem.occlusion_points,
                                  occlusion_radius=0.03, scale_count=2)
            ps, ns, pt, nt, s_src, s_tgt = sc.icp
            pt_new = np.asarray(d_scan_fix.apply(jnp.asarray(pt)))
            nt_new = np.asarray(d_scan_fix.apply(jnp.asarray(pt + nt))) - pt_new
            out.append(JointScene(pr_new, 0, (ps, ns, pt_new, nt_new, s_src,
                                              s_tgt), icp_weight=30.0))
        return out, fixes

    cost0 = _weighted_cost(rows, r, w)
    cur = scenes
    total_fix = [SE3.identity() for _ in scenes]
    xs = x
    for it in range(3):
        cur, fixes = apply_step(cur, xs)
        total_fix = [f.compose(tf) for f, tf in zip(fixes, total_fix)]
        rows_i, r_i, w_i, _, _ = build_joint_rows(cur, obs_scale=0.0)
        if it == 0:
            cost1 = _weighted_cost(rows_i, r_i, w_i)
            assert cost1 < cost0, f"step did not descend: {cost0} -> {cost1}"
        if it < 2:
            rwi = rows_i.astype(np.float64) * w_i[:, None].astype(np.float64)
            Hi = rwi.T @ rows_i.astype(np.float64)
            bi = rwi.T @ r_i.astype(np.float64)
            xs = np.linalg.solve(Hi + lam * np.eye(len(Hi)), bi)

    # scan-pose error shrinks substantially after 3 damped GN steps
    for si, sc in enumerate(scenes):
        d_scan_true, _ = gt[si]
        resid = total_fix[si].compose(d_scan_true)
        err_after = float(jnp.linalg.norm(resid.log()))
        err_before = float(jnp.linalg.norm(d_scan_true.log()))
        assert err_after < 0.5 * err_before, (si, err_before, err_after)
