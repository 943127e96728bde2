"""ImageRegistrator: headless dense photometric pose+intrinsics refinement.

CLI counterpart of ``/root/reference/src/exe/image_registrator.cc``: loads the
scan alignment (.mlp), occlusion geometry (splats; occlusion meshes once the
mesh rasterizer lands — the reference also falls back to point splats,
``:163-172``), initializes camera groups + poses from a COLMAP state dir,
builds the multi-resolution point cloud, and runs the coarse-to-fine
photometric optimizer, exporting a COLMAP state dir ``scale_<f>_state`` with
a ``metadata.txt`` parameter dump after every completed image scale
(``:227-307``).
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

import numpy as np

import jax.numpy as jnp

from dataset_pipeline_tpu.io.scans import load_scan_set
from dataset_pipeline_tpu.io.state import ImageState, ModelState, load_colmap_state, save_colmap_state
from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3, quat_to_matrix
from dataset_pipeline_tpu.photometric.multiscale import build_multiscale_cloud
from dataset_pipeline_tpu.photometric.optimizer import PhotometricOptimizer
from dataset_pipeline_tpu.photometric.problem import (
    ImageGroup,
    PhotoProblem,
    build_image_pyramid,
    build_photo_level,
    image_scale_count,
)
from dataset_pipeline_tpu.utils.profiling import GLOBAL_TIMER, device_trace

DEFAULT_SPLAT_RADIUS = 0.03


def _pose_matrix(im: ImageState) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = np.asarray(quat_to_matrix(jnp.asarray(im.qvec, jnp.float32)))
    T[:3, 3] = im.tvec
    return T


def load_groups(state: ModelState, image_base_path: str):
    """Group images by camera id; load grayscale pyramids."""
    from PIL import Image as PILImage

    by_cam = defaultdict(list)
    for im in state.images:
        if not os.path.exists(os.path.join(image_base_path, im.name)):
            print(f"warning: image file missing, skipping: {im.name}")
            continue
        by_cam[im.camera_id].append(im)

    group_descs = []
    global_count = 1
    for cid in sorted(by_cam):
        cam = state.cameras[cid]
        count = image_scale_count(cam.width, cam.height)
        global_count = max(global_count, count)
        group_descs.append((cid, cam, by_cam[cid], count))

    from dataset_pipeline_tpu.photometric.masks import build_mask_pyramid, combined_mask

    groups = []
    for cid, cam, ims, count in group_descs:
        grays = []
        poses_mats = []
        ids = []
        masks = []
        any_mask = False
        for im in ims:
            img = np.asarray(PILImage.open(os.path.join(image_base_path, im.name)).convert("L"),
                             np.float32)
            if img.shape != (cam.height, cam.width):
                raise ValueError(
                    f"{im.name}: image is {img.shape}, camera expects "
                    f"({cam.height},{cam.width})"
                )
            grays.append(img)
            poses_mats.append(_pose_matrix(im))
            ids.append(im.image_id)
            m = combined_mask(image_base_path, im.name, img.shape)
            if m is not None:
                any_mask = True
            masks.append(m if m is not None else np.zeros(img.shape, np.uint8))
        pyramid = build_image_pyramid(np.stack(grays), count)
        poses = SE3.from_matrix(jnp.asarray(np.stack(poses_mats), jnp.float32))
        mask_pyr = build_mask_pyramid(np.stack(masks), count) if any_mask else None
        groups.append(
            ImageGroup(camera=cam, pyramid=pyramid, poses=poses, image_ids=ids,
                       min_image_scale=global_count - count, mask_pyramid=mask_pyr)
        )
    return groups, global_count


def export_state(path: str, opt: PhotometricOptimizer, state: ModelState,
                 metadata: dict):
    cam_by_id = dict(state.cameras)
    img_rows = []
    id_to_group = {}
    for g in opt.p.groups:
        for bi, iid in enumerate(g.image_ids):
            id_to_group[iid] = (g, bi)
    for im in state.images:
        g, bi = id_to_group[im.image_id]
        q = np.asarray(g.poses.q[bi], np.float64)
        t = np.asarray(g.poses.t[bi], np.float64)
        img_rows.append(ImageState(im.image_id, im.camera_id, im.name, q, t))
        cam_by_id[im.camera_id] = g.camera
    save_colmap_state(path, ModelState(cam_by_id, img_rows, state.scale_factor))
    with open(os.path.join(path, "metadata.txt"), "w") as f:
        for k, v in metadata.items():
            f.write(f"{k} {v}\n")


def write_debug_colored_cloud(path: str, opt: PhotometricOptimizer,
                              points: np.ndarray, image_base_path: str,
                              state: ModelState) -> None:
    """Colored debug point cloud under the current state
    (``opt/problem.cc:642-704``): project every occlusion-cloud point into
    every image (occlusion z-test), bilinear-sample the color photograph,
    average over observing images; unobserved points stay black."""
    from PIL import Image as PILImage

    from dataset_pipeline_tpu.io.ply import PointCloud, write_ply

    id_to_name = {im.image_id: im.name for im in state.images}
    pts_j = jnp.asarray(points, jnp.float32)
    n = len(points)
    sums = np.zeros((n, 3), np.float64)
    counts = np.zeros(n, np.int64)
    occl = opt._occlusion_depths()
    thresh = opt.p.occlusion_depth_threshold
    for gi, g in enumerate(opt.p.groups):
        cam = g.camera
        for b, iid in enumerate(g.image_ids):
            img_path = os.path.join(image_base_path, id_to_name[iid])
            rgb = np.asarray(PILImage.open(img_path).convert("RGB"), np.float64)
            pose = SE3(g.poses.q[b], g.poses.t[b])
            p_cam = np.asarray(pose.apply(pts_j))
            pix, ok = cm.project(cam, jnp.asarray(p_cam))
            pix, ok = np.asarray(pix), np.asarray(ok)
            z = p_cam[:, 2]
            x, y = pix[:, 0], pix[:, 1]
            x0 = np.floor(x).astype(np.int64)
            y0 = np.floor(y).astype(np.int64)
            vis = (ok & (z > 0) & (x0 >= 0) & (y0 >= 0)
                   & (x0 + 1 < cam.width) & (y0 + 1 < cam.height))
            od = np.asarray(occl[gi][b])
            ix = np.clip(np.floor(x + 0.5).astype(np.int64), 0, cam.width - 1)
            iy = np.clip(np.floor(y + 0.5).astype(np.int64), 0, cam.height - 1)
            odv = np.nan_to_num(od[iy, ix], nan=-np.inf)
            vis &= odv + thresh >= z
            fx_ = (x - x0)[vis, None]
            fy_ = (y - y0)[vis, None]
            xv, yv = x0[vis], y0[vis]
            c = ((1 - fx_) * (1 - fy_) * rgb[yv, xv]
                 + fx_ * (1 - fy_) * rgb[yv, xv + 1]
                 + (1 - fx_) * fy_ * rgb[yv + 1, xv]
                 + fx_ * fy_ * rgb[yv + 1, xv + 1])
            sums[vis] += c
            counts[vis] += 1
    colors = np.zeros((n, 3), np.uint8)
    obs = counts > 0
    colors[obs] = np.clip(sums[obs] / counts[obs, None] + 0.5, 0, 255
                          ).astype(np.uint8)
    write_ply(path, PointCloud(np.asarray(points, np.float32), None, colors))


def main(argv=None) -> int:
    from dataset_pipeline_tpu.utils.params import Parameters

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scan_alignment_path", required=True)
    p.add_argument("--occlusion_mesh_path", default="")
    p.add_argument("--occlusion_splats_path", default="")
    p.add_argument("--image_base_path", required=True)
    p.add_argument("--state_path", required=True)
    p.add_argument("--output_folder_path", required=True)
    p.add_argument("--max_iterations", type=int, default=400)
    p.add_argument("--initial_scaling_factor", type=float, default=0.0,
                   help="resume: start the schedule at this scaling factor "
                        "(e.g. 0.25); 0 = coarsest usable scale. Point "
                        "--state_path at a previous scale_<f>_state dir to "
                        "continue from its poses (image_registrator.cc:95-101)")
    p.add_argument("--target_scaling_factor", type=float, default=1.0,
                   help="stop after optimizing this scaling factor")
    p.add_argument("--camera_ids_to_ignore", default="")
    p.add_argument("--fix_intrinsics", action="store_true")
    p.add_argument("--multi_res_point_cloud_directory_path", default="",
                   help="cache dir for the multi-resolution point cloud")
    p.add_argument("--write_debug_point_clouds", action="store_true",
                   help="write initial_point_cloud.ply colored from the "
                        "initial state (image_registrator.cc:200-215)")
    p.add_argument("--cache_observations", action="store_true",
                   help="after the first scale, compact per-image candidate "
                        "point views and persist them next to the multi-res "
                        "cloud cache (observations_cache.cc; enabled after "
                        "the first scale in image_registrator.cc:230-235)")
    p.add_argument("--devices", type=int, default=1,
                   help="shard the photometric H,b/visibility/cost kernels "
                        "over a device mesh of this many devices (0 = all "
                        "available); images are the sharded axis "
                        "(parallel/photometric.py)")
    p.add_argument("--mesh", default="",
                   help='2-axis mesh topology "HxD" (hosts x devices-per-'
                        "host, SURVEY §5): shards the image axis over both "
                        "axes with the psum spanning DCN+ICI; overrides "
                        "--devices. With jax.distributed (DPT_COORDINATOR "
                        'etc.) H defaults to process_count; e.g. "2x4"')
    # the shared optimization knob set (opt/parameters.h); DatasetInspector
    # accepts the identical flags (README.md:770-771)
    Parameters().add_to_argparser(p)
    args = p.parse_args(argv)
    params = Parameters.from_args(args)

    ignore = {int(v) for v in args.camera_ids_to_ignore.split(",") if v}
    with GLOBAL_TIMER.stage("load_scans"):
        scans = load_scan_set(args.scan_alignment_path)
    state = load_colmap_state(args.state_path, scans.scale_factor, ignore)

    # rigs: make poses consistent, derive extrinsics, mark dependent
    # cameras (shared two-phase loader, photometric/rig.py)
    from dataset_pipeline_tpu.photometric.rig import assign_rigs, mark_rig_groups

    rigs_path = os.path.join(args.state_path, "rigs.json")
    rig_configs = []
    if os.path.exists(rigs_path):
        from dataset_pipeline_tpu.io.colmap import read_rigs_json

        rig_configs = read_rigs_json(rigs_path)
    rig_infos = assign_rigs(state, rig_configs) if rig_configs else []
    if rig_infos:
        print(f"{len(rig_infos)} rig(s) assigned")

    groups, global_count = load_groups(state, args.image_base_path)

    rig_extrinsics = mark_rig_groups(state, groups, rig_infos) \
        if rig_infos else []

    print(f"{len(groups)} camera groups, {sum(g.num_images for g in groups)} images, "
          f"{global_count} image scales")

    scan_pts = [scans.global_positions(i) for i in range(len(scans.infos))]
    scan_cols = [
        scans.clouds[i].colors if scans.clouds[i].colors is not None
        else np.zeros((len(scan_pts[i]), 3), np.uint8)
        for i in range(len(scans.infos))
    ]
    all_pts = np.concatenate(scan_pts)
    all_cols = np.concatenate(scan_cols)
    scan_idx = np.concatenate(
        [np.full(len(p_), i, np.uint8) for i, p_ in enumerate(scan_pts)]
    )

    occlusion_mesh = None
    occl = all_pts
    if args.occlusion_mesh_path:
        from dataset_pipeline_tpu.io.ply import read_ply
        from dataset_pipeline_tpu.ops.mesh_raster import build_occlusion_mesh

        mesh_pc = read_ply(args.occlusion_mesh_path)
        verts = [mesh_pc.positions]
        faces = [mesh_pc.faces]
        if args.occlusion_splats_path:
            sp = read_ply(args.occlusion_splats_path)
            if sp.faces is not None:
                faces.append(sp.faces + len(np.concatenate(verts)))
                verts.append(sp.positions)
        occlusion_mesh = build_occlusion_mesh(
            np.concatenate(verts), np.concatenate(faces))
        print(f"occlusion mesh: {sum(len(v) for v in verts)} vertices, "
              f"{sum(len(f) for f in faces)} faces")
    elif args.occlusion_splats_path:
        from dataset_pipeline_tpu.io.ply import read_ply

        occl = read_ply(args.occlusion_splats_path).positions

    # multi-scale cloud: radii judged against ALL images (all groups)
    all_poses = SE3(
        jnp.concatenate([g.poses.q for g in groups]),
        jnp.concatenate([g.poses.t for g in groups]),
    )
    # use the largest camera for radius estimation (conservative)
    largest = max((g.camera for g in groups), key=lambda c: c.width * c.height)
    cache_params = {
        "num_points": int(len(all_pts)),
        "scale_count": int(global_count),
        "num_images": int(sum(g.num_images for g in groups)),
    }
    levels_raw = None
    if args.multi_res_point_cloud_directory_path:
        from dataset_pipeline_tpu.photometric.cache import (
            load_multiscale_cache,
            save_multiscale_cache,
        )

        levels_raw = load_multiscale_cache(
            args.multi_res_point_cloud_directory_path, cache_params)
        if levels_raw is not None:
            print("loaded multi-resolution point cloud from cache")
    if levels_raw is None:
        with GLOBAL_TIMER.stage("build_multiscale_cloud"):
            levels_raw = build_multiscale_cloud(
                all_pts, all_cols, scan_idx, all_poses, largest, global_count,
                min_radius_bias=params.min_radius_bias,
                merge_distance_factor=params.merge_distance_factor,
                occlusion_threshold=params.occlusion_depth_threshold,
            )
        if args.multi_res_point_cloud_directory_path:
            save_multiscale_cache(
                args.multi_res_point_cloud_directory_path, levels_raw, cache_params)
    levels = None
    if args.multi_res_point_cloud_directory_path:
        from dataset_pipeline_tpu.photometric.cache import (
            load_photo_levels_cache,
            save_photo_levels_cache,
        )

        levels = load_photo_levels_cache(
            args.multi_res_point_cloud_directory_path, cache_params)
        if levels is not None:
            print("loaded point neighbors/descriptors from cache")
    if levels is None:
        levels = []
        with GLOBAL_TIMER.stage("determine_point_neighbors"):
            for i, lv in enumerate(levels_raw):
                pl = build_photo_level(
                    lv, k=params.point_neighbor_count, seed=i,
                    num_candidates=params.point_neighbor_candidate_count,
                    min_mean_diff=params.min_mean_intensity_difference_for_points)
                if pl is not None:
                    levels.append(pl)
        if args.multi_res_point_cloud_directory_path:
            save_photo_levels_cache(
                args.multi_res_point_cloud_directory_path, levels, cache_params)
    print(f"{len(levels)} point levels: " + ", ".join(str(len(l.points)) for l in levels))

    problem = PhotoProblem(
        groups=groups,
        levels=levels,
        occlusion_points=jnp.asarray(occl.astype(np.float32)),
        occlusion_radius=params.splat_radius,
        scale_count=global_count,
        occlusion_mesh=occlusion_mesh,
        rig_extrinsics=rig_extrinsics,
        max_valid_intensity=params.maximum_valid_intensity,
        occlusion_depth_threshold=params.occlusion_depth_threshold,
    )
    mesh = None
    if args.mesh:
        from dataset_pipeline_tpu.parallel.mesh import (
            initialize_distributed, make_host_device_mesh,
        )

        initialize_distributed()  # no-op unless a coordinator is configured
        h, d = (int(v) for v in args.mesh.lower().split("x"))
        mesh = make_host_device_mesh(h, d)
        print(f"sharding photometric kernels over the {h}x{d} "
              '("hosts","devices") mesh')
    elif args.devices == 0 or args.devices > 1:
        import jax

        from dataset_pipeline_tpu.parallel.mesh import (
            initialize_distributed, make_data_mesh,
        )

        initialize_distributed()  # no-op unless a coordinator is configured
        n = args.devices or len(jax.devices())
        mesh = make_data_mesh(n)
        print(f"sharding photometric kernels over {n} device(s)")
    opt = PhotometricOptimizer(
        problem, optimize_intrinsics=not args.fix_intrinsics,
        fixed_weight=params.fixed_residuals_weight,
        variable_weight=params.variable_residuals_weight,
        depth_weight=params.depth_residuals_weight,
        mesh=mesh,
    )

    os.makedirs(args.output_folder_path, exist_ok=True)

    if args.write_debug_point_clouds:
        dbg_path = os.path.join(args.output_folder_path,
                                "initial_point_cloud.ply")
        if os.path.exists(dbg_path):
            print("not writing initial point cloud: already exists")
        else:
            write_debug_colored_cloud(dbg_path, opt, np.asarray(occl),
                                      args.image_base_path, state)
            print(f"wrote {dbg_path}")

    def on_scale_done(o: PhotometricOptimizer, report):
        factor = 2.0 ** (-o.current_scale)
        out = os.path.join(args.output_folder_path, f"scale_{factor:g}_state")
        # full parameter dump per scale state, like the reference's
        # metadata.txt (opt/parameters.h:105-127 OutputValues)
        meta = {
            "optimum_cost": report.optimum_cost,
            "iterations": report.iterations,
            "image_scale": o.current_scale,
            "scale_factor": scans.scale_factor,
        }
        if o.obs_cache_hit_log:
            # drift-guardrail observability: last measured core hit rate of
            # the observations cache at this scale (see obs_cache_hit_rate)
            meta["obs_cache_hit_rate"] = round(o.obs_cache_hit_log[-1], 5)
        meta.update(dict(line.split(" ", 1) for line in params.dump().splitlines()))
        export_state(out, o, state, meta)
        if rig_configs:
            # io::ExportRigs (colmap_model.cc:485-527): re-emit the rig
            # camera/prefix config next to every exported state
            from dataset_pipeline_tpu.io.colmap import write_rigs_json

            write_rigs_json(os.path.join(out, "rigs.json"), rig_configs)
        print(f"scale {o.current_scale} done (cost {report.optimum_cost:.6f}) -> {out}")

    # coarse-to-fine schedule with optional resume window
    start_scale = global_count - 2
    if args.initial_scaling_factor > 0:
        start_scale = max(0, int(round(-np.log2(args.initial_scaling_factor))))
    end_scale = max(0, int(round(-np.log2(args.target_scaling_factor))))
    opt.current_scale = min(start_scale, global_count - 2)
    first_scale_done = False
    while True:
        with device_trace(), GLOBAL_TIMER.stage(f"optimize_scale_{opt.current_scale}"):
            report = opt.run_on_current_scale(args.max_iterations, print_progress=True)
        on_scale_done(opt, report)
        if args.cache_observations and not first_scale_done:
            cache_path = (
                os.path.join(args.multi_res_point_cloud_directory_path,
                             "observations_cache.npz")
                if args.multi_res_point_cloud_directory_path else None
            )
            opt.build_observations_cache(save_path=cache_path,
                                         load_path=cache_path)
            real, padded = opt.obs_cache.stats()
            total = sum(len(l.points) for l in levels) * problem.num_images
            print(f"observations cache: {real} candidate rows "
                  f"({100.0 * real / max(total, 1):.1f}% of dense)")
        first_scale_done = True
        if opt.current_scale <= end_scale or not opt.next_scale():
            break
    print("stage timing:\n" + GLOBAL_TIMER.summary())
    GLOBAL_TIMER.dump_json(os.path.join(args.output_folder_path, "timing.json"))
    print("finished")
    return 0


if __name__ == "__main__":
    sys.exit(main())
