"""JointBA: joint multi-scene scan+image bundle adjustment (Schur, sharded).

The multi-host north-star tool (BASELINE.json; no reference counterpart —
the reference's own TODO, ``opt/intrinsics_and_pose_optimizer.cc:70-73,217``):
several scenes sharing ONE camera are optimized jointly over
[shared intrinsics | per-scene free scan poses | per-image poses], with
residual rows (photometric descriptor rows + symmetric point-to-plane ICP
rows) produced ON-DEVICE inside ``shard_map`` and reduced through a
distributed Schur complement (``parallel/joint_ba.py``).

Each ``--scene`` is ``mlp_path,colmap_state_dir,image_base_path``. Outputs,
per scene: an updated ``scan_alignment.mlp`` (corrected scan poses), an
updated COLMAP state (image poses + shared intrinsics), and a
``metadata.txt`` with the LM cost trace.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax.numpy as jnp

from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.utils.profiling import GLOBAL_TIMER


def build_scene(mlp_path: str, state_dir: str, image_base: str, params,
                point_level: int, max_corr_dist: float, icp_weight: float,
                normal_k: int):
    """One JointScene: single-group photometric problem + cross-scan ICP
    correspondences (found once, in the initial state)."""
    from dataset_pipeline_tpu.io.scans import load_scan_set
    from dataset_pipeline_tpu.io.state import load_colmap_state
    from dataset_pipeline_tpu.ops.knn import build_grid, nearest_neighbor
    from dataset_pipeline_tpu.ops.normals import estimate_normals
    from dataset_pipeline_tpu.parallel.ba import JointScene
    from dataset_pipeline_tpu.photometric.multiscale import build_multiscale_cloud
    from dataset_pipeline_tpu.photometric.problem import (
        PhotoProblem, build_photo_level, image_scale_count,
    )
    from dataset_pipeline_tpu.tools.image_registrator import load_groups

    from dataset_pipeline_tpu.photometric.rig import (
        assign_rigs_from_state_dir,
        mark_rig_groups,
    )

    scans = load_scan_set(mlp_path)
    state = load_colmap_state(state_dir, scans.scale_factor)
    rig_infos = assign_rigs_from_state_dir(state, state_dir)
    groups, global_count = load_groups(state, image_base)
    rig_extr = []
    if len(groups) != 1:
        # rig scenes: rigs.json marks every non-reference group dependent
        rig_extr = mark_rig_groups(state, groups, rig_infos)
        dependents = sum(1 for g_ in groups if g_.rig_cam_index > 0)
        if dependents != len(groups) - 1:
            raise SystemExit(
                "joint_ba: multi-group scenes must form one rig via "
                f"rigs.json ({mlp_path}: {len(groups)} groups, "
                f"{dependents} rig-dependent)")
        groups = sorted(groups, key=lambda g_: g_.rig_cam_index)
    g = groups[0]

    scan_pts = [scans.global_positions(i) for i in range(len(scans.infos))]
    scan_cols = [scans.clouds[i].colors if scans.clouds[i].colors is not None
                 else np.zeros((len(scan_pts[i]), 3), np.uint8)
                 for i in range(len(scans.infos))]
    all_pts = np.concatenate(scan_pts)
    all_cols = np.concatenate(scan_cols)
    scan_idx = np.concatenate([np.full(len(p_), i, np.uint8)
                               for i, p_ in enumerate(scan_pts)])

    levels_raw = build_multiscale_cloud(
        all_pts, all_cols, scan_idx, g.poses, g.camera, global_count,
        min_radius_bias=params.min_radius_bias,
        merge_distance_factor=params.merge_distance_factor,
        occlusion_threshold=params.occlusion_depth_threshold)
    if point_level >= 0:
        levels_raw = [levels_raw[min(point_level, len(levels_raw) - 1)]]
    levels = []
    for li, lr in enumerate(levels_raw):
        lv = build_photo_level(
            lr, k=params.point_neighbor_count, seed=li,
            num_candidates=params.point_neighbor_candidate_count,
            min_mean_diff=params.min_mean_intensity_difference_for_points)
        if lv is not None:
            levels.append(lv)
    if not levels:
        raise SystemExit(f"joint_ba: no usable point level in {mlp_path} "
                         "after the gradient filter")

    problem = PhotoProblem(
        groups=groups, levels=levels,
        occlusion_points=jnp.asarray(all_pts.astype(np.float32)),
        occlusion_radius=params.splat_radius,
        scale_count=global_count,
        occlusion_depth_threshold=params.occlusion_depth_threshold,
        rig_extrinsics=rig_extr)

    # cross-scan ICP correspondences in the initial state (nearest neighbor
    # within max_corr_dist, per ordered overlapping pair — the reference's
    # pair enumeration, icp_point_to_plane.cc:208-309)
    icp = None
    normals = None
    S = len(scan_pts)
    if S > 1 and max_corr_dist > 0:
        normals = [np.asarray(estimate_normals(
            p_, scans.scan_origin(i), k=normal_k)[0])
            for i, p_ in enumerate(scan_pts)]
        cols = {k: [] for k in ("ps", "ns", "pt", "nt", "src", "tgt")}
        grids = {}
        for i in range(S):
            for j in range(S):
                if i == j:
                    continue
                lo = scan_pts[i].min(0) - max_corr_dist
                hi = scan_pts[i].max(0) + max_corr_dist
                if (scan_pts[j].min(0) > hi).any() or (
                        scan_pts[j].max(0) < lo).any():
                    continue
                if j not in grids:
                    grids[j] = build_grid(scan_pts[j], max_corr_dist)
                d2, idx = nearest_neighbor(grids[j],
                                           jnp.asarray(scan_pts[i]))
                d2, idx = np.asarray(d2), np.asarray(idx)
                keep = (idx >= 0) & (d2 <= max_corr_dist ** 2)
                if not keep.any():
                    continue
                si_ = np.nonzero(keep)[0]
                ti_ = idx[keep]
                cols["ps"].append(scan_pts[i][si_])
                cols["ns"].append(normals[i][si_])
                cols["pt"].append(scan_pts[j][ti_])
                cols["nt"].append(normals[j][ti_])
                cols["src"].append(np.full(len(si_), i, np.int32))
                cols["tgt"].append(np.full(len(si_), j, np.int32))
        if cols["ps"]:
            icp = tuple(np.concatenate(cols[k]) for k in
                        ("ps", "ns", "pt", "nt", "src", "tgt"))
    return (JointScene(problem, 0, icp, icp_weight=icp_weight),
            scans, state, scan_pts, normals)


def main(argv=None) -> int:
    from dataset_pipeline_tpu.utils.params import Parameters

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", action="append", required=True,
                   metavar="MLP,STATE_DIR,IMAGE_BASE",
                   help="repeatable: one scene's scan alignment .mlp, COLMAP "
                        "state dir and image base path")
    p.add_argument("--output_folder_path", required=True)
    p.add_argument("--max_iterations", type=int, default=20)
    p.add_argument("--lambda0", type=float, default=1.0)
    p.add_argument("--start_scale", type=int, default=0,
                   help="coarse-to-fine: run the LM schedule at image "
                        "scales start_scale..0 (state carried across "
                        "scales; 0 = single finest-scale run)")
    p.add_argument("--point_level", type=int, default=-1,
                   help="restrict the joint rows to ONE multi-res point "
                        "level (-1 = all levels, per-point footprint radii)")
    p.add_argument("--max_corr_distance", type=float, default=0.1,
                   help="ICP correspondence gate (normalized units); 0 "
                        "disables ICP rows")
    p.add_argument("--icp_weight", type=float, default=30.0)
    p.add_argument("--normal_estimation_neighbor_count", type=int, default=8)
    p.add_argument("--fix_intrinsics", action="store_true")
    p.add_argument("--devices", type=int, default=0,
                   help="1-D mesh size (0 = all available devices)")
    p.add_argument("--mesh", default="",
                   help='2-axis topology "HxD" (hosts x devices, SURVEY §5); '
                        "overrides --devices. Example: --mesh 2x4")
    Parameters().add_to_argparser(p)
    args = p.parse_args(argv)
    params = Parameters.from_args(args)

    import jax

    from dataset_pipeline_tpu.parallel.joint_ba import pack_scenes, run_joint_ba
    from dataset_pipeline_tpu.parallel.mesh import (
        initialize_distributed, make_data_mesh, make_host_device_mesh,
    )

    initialize_distributed()  # no-op unless a coordinator is configured
    if args.mesh:
        h, d = (int(v) for v in args.mesh.lower().split("x"))
        mesh = make_host_device_mesh(h, d)
    else:
        mesh = make_data_mesh(args.devices or len(jax.devices()))
    print(f"mesh: {dict(mesh.shape)}")

    scenes, metas = [], []
    clouds = {}
    for spec in args.scene:
        parts = spec.split(",")
        if len(parts) != 3:
            raise SystemExit(f"--scene must be MLP,STATE_DIR,IMAGE_BASE: {spec}")
        with GLOBAL_TIMER.stage("build_scene"):
            sc, scans, state, scan_pts, normals = build_scene(
                parts[0], parts[1], parts[2], params, args.point_level,
                args.max_corr_distance, args.icp_weight,
                args.normal_estimation_neighbor_count)
        si = len(scenes)
        if normals is not None:
            for s in range(len(scan_pts)):
                clouds[(si, s)] = (scan_pts[s], normals[s])
        scenes.append(sc)
        metas.append((scans, state))
        n_icp = 0 if sc.icp is None else len(sc.icp[0])
        print(f"scene {len(scenes) - 1}: {sc.num_scans} scans, "
              f"{sc.num_images} images, "
              f"{sum(int(l.points.shape[0]) for l in sc.problem.levels)} points "
              f"({len(sc.problem.levels)} levels), "
              f"{n_icp} ICP correspondences")

    rig_mode = any(len(sc.problem.groups) > 1 for sc in scenes)
    cam0 = scenes[0].problem.groups[0].camera
    for sc in scenes[1:]:
        c = sc.problem.groups[0].camera
        if (c.model != cam0.model or c.width != cam0.width
                or c.height != cam0.height):
            raise SystemExit("joint_ba: scenes must share one camera model/"
                             "size (shared-intrinsics kept block)")

    if rig_mode:
        from dataset_pipeline_tpu.parallel.joint_ba_rig import pack_rig_scenes

        with GLOBAL_TIMER.stage("pack_scenes"):
            pack = pack_rig_scenes(
                mesh, scenes, optimize_intrinsics=not args.fix_intrinsics,
                occlusion_radius=params.splat_radius,
                occlusion_depth_threshold=params.occlusion_depth_threshold)
        print(f"packed (rig): n_keep={pack.n_keep} cams={pack.n_cams} "
              f"frames={pack.n_frames} (pad {pack.f_pad}) "
              f"icp_rows={2 * pack.n_icp}")
    else:
        with GLOBAL_TIMER.stage("pack_scenes"):
            pack = pack_scenes(mesh, scenes,
                               optimize_intrinsics=not args.fix_intrinsics,
                               occlusion_radius=params.splat_radius,
                               occlusion_depth_threshold=params.occlusion_depth_threshold)
        print(f"packed: n_keep={pack.n_keep} images={pack.n_images} "
              f"(pad {pack.m_pad}) icp_rows={2 * pack.n_icp}")

    from dataset_pipeline_tpu.parallel.joint_ba import refresh_icp_correspondences

    icp_refresh = None
    if clouds and args.max_corr_distance > 0 and pack.n_icp > 0:
        def icp_refresh(pk, st):
            refresh_icp_correspondences(pk, st, clouds,
                                        args.max_corr_distance)

    # interruptibility (the reference's write-every-iteration idiom,
    # icp_scan_aligner.cc:356-365): refresh every scene's .mlp per accepted
    # iteration so a killed run leaves usable scan poses behind
    from dataset_pipeline_tpu.io.scans import write_scan_poses
    from dataset_pipeline_tpu.models.lie import quat_to_matrix_np

    os.makedirs(args.output_folder_path, exist_ok=True)

    def write_mlps(st):
        cq = np.asarray(st["corr_q"], np.float64)
        ct = np.asarray(st["corr_t"], np.float64)
        for si2, (scans2, _) in enumerate(metas):
            out2 = os.path.join(args.output_folder_path, f"scene_{si2}")
            os.makedirs(out2, exist_ok=True)
            mats = []
            for s in range(len(scans2.infos)):
                M = scans2.global_matrix(s)
                Cm = np.eye(4)
                Cm[:3, :3] = quat_to_matrix_np(cq[si2, s])
                Cm[:3, 3] = ct[si2, s]
                mats.append(Cm @ M)
            write_scan_poses(os.path.join(out2, "scan_alignment.mlp"),
                             scans2, mats)

    with GLOBAL_TIMER.stage("joint_ba"):
        state = None
        costs_all = []
        for scale in range(max(args.start_scale, 0), -1, -1):
            if args.start_scale > 0:
                print(f"scale {scale}:")
            if rig_mode:
                from dataset_pipeline_tpu.parallel.joint_ba_rig import (
                    RigJointBASystem,
                    apply_rig_delta,
                    make_rig_state,
                )

                res = run_joint_ba(
                    pack, max_iterations=args.max_iterations,
                    lam0=args.lambda0,
                    system=RigJointBASystem(pack, float(scale)),
                    state=state or make_rig_state(pack),
                    apply_fn=apply_rig_delta,
                    icp_refresh_fn=icp_refresh,
                    on_iteration=lambda it, st, c: write_mlps(st),
                    print_progress=True)
            else:
                res = run_joint_ba(pack, max_iterations=args.max_iterations,
                                   lam0=args.lambda0,
                                   current_scale=float(scale),
                                   icp_refresh_fn=icp_refresh, state=state,
                                   on_iteration=lambda it, st, c: write_mlps(st),
                                   print_progress=True)
            state = res.state
            costs_all += res.costs
        res.costs = costs_all
    print(f"joint BA: {res.iterations} iterations, {res.rows} rows, "
          f"cost {res.costs[0]:.6f} -> {res.costs[-1]:.6f}")

    # export per scene (the final/optimum state; .mlp poses via write_mlps)
    from dataset_pipeline_tpu.io.state import (
        ImageState, ModelState, save_colmap_state,
    )

    write_mlps(res.state)
    pose_q = np.asarray(res.state["pose_q"], np.float64)
    pose_t = np.asarray(res.state["pose_t"], np.float64)
    img_base_idx = 0
    for si, (sc, (scans, state)) in enumerate(zip(scenes, metas)):
        out = os.path.join(args.output_folder_path, f"scene_{si}")
        os.makedirs(out, exist_ok=True)
        groups_s = sorted(sc.problem.groups, key=lambda g_: g_.rig_cam_index)
        id_to_pose = {}
        cam_of_image = {}
        if rig_mode:
            eq = np.asarray(res.state["extr_q"], np.float64)
            et = np.asarray(res.state["extr_t"], np.float64)
            from dataset_pipeline_tpu.models.lie import quat_to_matrix_np as qm

            for c, g_ in enumerate(groups_s):
                prm = res.state["params"][c]
                cam_c = (g_.camera if args.fix_intrinsics
                         else g_.camera.with_params(prm))
                for k, iid in enumerate(g_.image_ids):
                    slot = (img_base_idx + k if c == 0
                            else img_base_idx + int(g_.ref_slots[k]))
                    q_, t_ = pose_q[slot], pose_t[slot]
                    if c > 0:
                        Re = qm(eq[c])
                        Rr = qm(q_)
                        M = np.eye(4)
                        M[:3, :3] = Re @ Rr
                        M[:3, 3] = Re @ t_ + et[c]
                        from dataset_pipeline_tpu.models.lie import SE3 as _S

                        se = _S.from_matrix(jnp.asarray(M[None], jnp.float32))
                        q_ = np.asarray(se.q, np.float64)[0]
                        t_ = np.asarray(se.t, np.float64)[0]
                    id_to_pose[iid] = (q_, t_)
                    cam_of_image[iid] = cam_c
        else:
            new_params = np.asarray(res.state["params"], np.float64)
            g = groups_s[0]
            cam_new = (g.camera if args.fix_intrinsics
                       else g.camera.with_params(jnp.asarray(new_params,
                                                             jnp.float32)))
            for k, iid in enumerate(g.image_ids):
                id_to_pose[iid] = (pose_q[img_base_idx + k],
                                   pose_t[img_base_idx + k])
                cam_of_image[iid] = cam_new
        rows = []
        cams = dict(state.cameras)
        for im in state.images:
            if im.image_id not in id_to_pose:
                continue
            q_, t_ = id_to_pose[im.image_id]
            rows.append(ImageState(im.image_id, im.camera_id, im.name,
                                   q_, t_))
            cams[im.camera_id] = cam_of_image[im.image_id]
        save_colmap_state(out, ModelState(cams, rows, state.scale_factor))
        with open(os.path.join(out, "metadata.txt"), "w") as f:
            f.write(f"iterations {res.iterations}\n")
            f.write(f"rows {res.rows}\n")
            f.write("costs " + " ".join(f"{c:.8g}" for c in res.costs) + "\n")
            for line in params.dump().splitlines():
                f.write(line + "\n")
        img_base_idx += sorted(
            sc.problem.groups,
            key=lambda g_: g_.rig_cam_index)[0].num_images
        print(f"scene {si} -> {out}")
    print("stage timing:\n" + GLOBAL_TIMER.summary())
    GLOBAL_TIMER.dump_json(os.path.join(args.output_folder_path, "timing.json"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
