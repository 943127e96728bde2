"""DatasetInspector (offline): per-image diagnostic renderings + tools.

Headless counterpart of the reference's Qt DatasetInspector GUI
(``dataset_inspector/gui_main_window.h:47-61``): instead of an interactive
viewer, writes PNG visualizations per image —

- ``depth``:      optimization point depths, colormapped
- ``overlay``:    depth points over the (grayscale) photograph
- ``occlusion``:  splat/mesh occlusion depth map
- ``scan``:       scan-color reprojection (the GUI's scan rendering mode)
- ``cost`` / ``cost_variable`` / ``cost_combined``: robust per-point
  photometric residuals splatted into the image (the GUI's cost fixed /
  variable / combined modes; builds the multi-resolution cloud like
  ImageRegistrator)
- ``points``:     the GUI's "optimization points" display — the
  multi-resolution optimization points visible in this image, one color per
  point scale (``gui_main_window.h:47-61``)

and exposes the GUI's editing tools headlessly:

- ``--localize_image NAME --correspondences FILE`` — the "Localize image"
  tool (``localize_image_tool.cc``): FILE holds one ``x y X Y Z`` line per
  clicked 2D-3D correspondence (>=6); the image pose is refined nonlinearly
  and the state re-saved in place.
- ``--transfer_source A --transfer_target B [--transfer_eval_obs]`` — the
  "Label transfer" button (``gui_main_window.cc:868-1054``): source-image
  mask labels are transferred to the target through the scan geometry and
  written to ``masks_for_images``.

Mask side-car files (masks_for_images/masks_for_cameras) are honored by the
loaders when present. Polygon mask drawing is available programmatically via
``photometric.masks.draw_mask_polygons``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax.numpy as jnp

from dataset_pipeline_tpu.io.scans import load_scan_set
from dataset_pipeline_tpu.io.state import load_colmap_state, save_colmap_state
from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3, quat_to_matrix
from dataset_pipeline_tpu.ops.splat import (
    render_points_depth,
    render_points_depth_color,
    render_splats_depth,
)


def _colormap(values, vmin, vmax):
    """Simple turbo-ish colormap to uint8 RGB; invalid -> black."""
    finite = np.isfinite(values)
    t = np.clip(np.where(finite, values, vmin) - vmin, 0, None)
    t = np.clip(t / max(vmax - vmin, 1e-9), 0, 1)
    r = np.clip(1.5 - np.abs(2.0 * t - 1.5), 0, 1)
    g = np.clip(1.5 - np.abs(2.0 * t - 1.0), 0, 1)
    b = np.clip(1.5 - np.abs(2.0 * t - 0.5), 0, 1)
    rgb = (np.stack([r, g, b], -1) * 255).astype(np.uint8)
    rgb[~np.isfinite(values)] = 0
    return rgb


def main(argv=None) -> int:
    from dataset_pipeline_tpu.utils.params import Parameters

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scan_alignment_path", required=True)
    p.add_argument("--state_path", required=True)
    p.add_argument("--image_base_path", default="")
    p.add_argument("--output_folder_path", required=True)
    p.add_argument("--modes", default="depth,overlay,occlusion",
                   help="comma list: depth,overlay,occlusion,scan")
    p.add_argument("--localize_image", default="",
                   help="image name whose pose to refine from clicked "
                        "2D-3D correspondences")
    p.add_argument("--correspondences", default="",
                   help="text file of 'x y X Y Z' lines for --localize_image")
    p.add_argument("--transfer_source", default="",
                   help="source image name for label transfer")
    p.add_argument("--transfer_target", default="",
                   help="target image name for label transfer")
    p.add_argument("--transfer_eval_obs", action="store_true")
    p.add_argument("--nudge_image", default="",
                   help="image whose pose to nudge (the GUI's arrow "
                        "buttons, gui_main_window.cc:850-865)")
    p.add_argument("--nudge", default="",
                   help="'tx ty tz pitch yaw roll' se(3) delta applied as "
                        "exp(delta) . image_T_global (camera frame)")
    p.add_argument("--occlusion_depth_saturation", type=float, default=20.0,
                   help="depth at which the occlusion-depth visualization "
                        "saturates (dataset_inspector.cc:78-79)")
    # identical knob set to ImageRegistrator (README.md:770-771; the
    # reference passes the same opt::Parameters flags to both tools)
    Parameters().add_to_argparser(p)
    args = p.parse_args(argv)
    params = Parameters.from_args(args)

    from PIL import Image

    modes = set(args.modes.split(","))
    scans = load_scan_set(args.scan_alignment_path)
    state = load_colmap_state(args.state_path, scans.scale_factor)
    pts = np.concatenate([scans.global_positions(i) for i in range(len(scans.infos))])
    colors = np.concatenate([
        scans.clouds[i].colors if scans.clouds[i].colors is not None
        else np.full((len(scans.clouds[i].positions), 3), 128, np.uint8)
        for i in range(len(scans.infos))
    ])
    pts_j = jnp.asarray(pts)
    os.makedirs(args.output_folder_path, exist_ok=True)

    def image_pose(im) -> SE3:
        T = np.eye(4)
        T[:3, :3] = np.asarray(quat_to_matrix(jnp.asarray(im.qvec, jnp.float32)))
        T[:3, 3] = im.tvec
        return SE3.from_matrix(jnp.asarray(T, jnp.float32))

    def find_image(name):
        for im in state.images:
            if im.name == name or os.path.basename(im.name) == name:
                return im
        raise SystemExit(f"image '{name}' not found in state")

    if args.localize_image:
        from dataset_pipeline_tpu.photometric.localize import localize_image

        im = find_image(args.localize_image)
        cam = state.cameras[im.camera_id]
        corr = np.loadtxt(args.correspondences, ndmin=2)
        if corr.shape[1] != 5:
            raise SystemExit("--correspondences needs 'x y X Y Z' lines")
        refined = localize_image(cam, corr[:, 2:5], corr[:, :2],
                                 image_pose(im))
        im.qvec = np.asarray(refined.q, np.float64)
        im.tvec = np.asarray(refined.t, np.float64)
        save_colmap_state(args.state_path, state)
        print(f"localized {im.name}: pose refined from {len(corr)} "
              "correspondences, state saved")

    if args.nudge_image:
        from dataset_pipeline_tpu.icp.moments import quat_mul_np, se3_exp_np

        im = find_image(args.nudge_image)
        d = np.asarray([float(v) for v in args.nudge.split()])
        if len(d) != 6:
            raise SystemExit("--nudge needs 6 values: tx ty tz pitch yaw roll")
        dq, dt = se3_exp_np(d)
        from dataset_pipeline_tpu.models.lie import quat_to_matrix_np

        Rd = quat_to_matrix_np(dq)
        im.qvec = quat_mul_np(dq, np.asarray(im.qvec, np.float64))
        im.qvec /= np.linalg.norm(im.qvec)
        im.tvec = Rd @ np.asarray(im.tvec, np.float64) + dt
        save_colmap_state(args.state_path, state)
        print(f"nudged {im.name} by {d.tolist()}, state saved")

    if args.transfer_source and args.transfer_target:
        from dataset_pipeline_tpu.photometric.localize import transfer_labels
        from dataset_pipeline_tpu.photometric.masks import (
            combined_mask, image_mask_path, save_mask)

        src = find_image(args.transfer_source)
        tgt = find_image(args.transfer_target)
        scam, tcam = state.cameras[src.camera_id], state.cameras[tgt.camera_id]
        spose, tpose = image_pose(src), image_pose(tgt)
        smask = combined_mask(args.image_base_path, src.name,
                              (scam.height, scam.width))
        if smask is None:
            raise SystemExit(f"no mask found for source image {src.name}")
        radii = jnp.full((len(pts),), params.splat_radius, jnp.float32)
        s_occ = np.asarray(render_splats_depth(
            spose.apply(pts_j), radii, scam.width, scam.height,
            scam.fx, scam.fy, scam.cx, scam.cy))
        t_occ = np.asarray(render_splats_depth(
            tpose.apply(pts_j), radii, tcam.width, tcam.height,
            tcam.fx, tcam.fy, tcam.cx, tcam.cy))
        existing = combined_mask(args.image_base_path, tgt.name,
                                 (tcam.height, tcam.width))
        merged = transfer_labels(
            pts, scam, spose, smask, s_occ, tcam, tpose, t_occ,
            existing_target_mask=existing,
            transfer_eval_obs=args.transfer_eval_obs,
            occlusion_depth_threshold=params.occlusion_depth_threshold)
        out_path = image_mask_path(args.image_base_path, tgt.name)
        save_mask(out_path, merged)
        print(f"label transfer {src.name} -> {tgt.name}: wrote {out_path}")

    cost_modes = sorted(m for m in modes if m.startswith("cost"))
    cost_opt = None
    cost_vis = None
    id_to_gb = {}
    if cost_modes or "points" in modes:
        from dataset_pipeline_tpu.photometric.multiscale import build_multiscale_cloud
        from dataset_pipeline_tpu.photometric.optimizer import PhotometricOptimizer
        from dataset_pipeline_tpu.photometric.problem import (
            PhotoProblem, build_photo_level)
        from dataset_pipeline_tpu.tools.image_registrator import load_groups

        groups, global_count = load_groups(state, args.image_base_path)
        scan_cols = np.concatenate([
            scans.clouds[i].colors if scans.clouds[i].colors is not None
            else np.zeros((len(scans.clouds[i].positions), 3), np.uint8)
            for i in range(len(scans.infos))])
        scan_idx = np.concatenate([
            np.full(len(scans.clouds[i].positions), i, np.uint8)
            for i in range(len(scans.infos))])
        all_poses = SE3(jnp.concatenate([g.poses.q for g in groups]),
                        jnp.concatenate([g.poses.t for g in groups]))
        largest = max((g.camera for g in groups),
                      key=lambda c: c.width * c.height)
        levels_raw = build_multiscale_cloud(
            pts, scan_cols, scan_idx, all_poses, largest, global_count)
        levels = [pl for i, lv in enumerate(levels_raw)
                  if (pl := build_photo_level(lv, seed=i)) is not None]
        problem = PhotoProblem(
            groups=groups, levels=levels, occlusion_points=pts_j,
            occlusion_radius=params.splat_radius, scale_count=global_count)
        cost_opt = PhotometricOptimizer(problem, optimize_intrinsics=False,
                                        variable_weight=1.0)
        cost_opt.current_scale = 0  # display at full resolution
        cost_vis = cost_opt._visibility(cost_opt._occlusion_depths())
        for gi, g in enumerate(groups):
            for b, iid in enumerate(g.image_ids):
                id_to_gb[iid] = (gi, b)

    for im in state.images:
        cam = state.cameras[im.camera_id]
        pose = image_pose(im)
        p_cam = pose.apply(pts_j)
        base = os.path.splitext(os.path.basename(im.name))[0]

        depth = np.asarray(render_points_depth(
            p_cam, cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy))
        finite = depth[np.isfinite(depth)]
        vmin, vmax = (np.percentile(finite, [2, 98]) if finite.size else (0, 1))

        if "depth" in modes:
            Image.fromarray(_colormap(depth, vmin, vmax)).save(
                os.path.join(args.output_folder_path, f"{base}.depth.png"))
        if "occlusion" in modes:
            od = np.asarray(render_splats_depth(
                p_cam, jnp.full((len(pts),), params.splat_radius, jnp.float32),
                cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy))
            Image.fromarray(_colormap(
                od, 0.0, args.occlusion_depth_saturation)).save(
                os.path.join(args.output_folder_path, f"{base}.occlusion.png"))
        if "scan" in modes:
            _, rgb = render_points_depth_color(
                p_cam, jnp.asarray(colors, jnp.uint8), cam.width, cam.height,
                cam.fx, cam.fy, cam.cx, cam.cy)
            Image.fromarray(np.asarray(rgb)).save(
                os.path.join(args.output_folder_path, f"{base}.scan.png"))
        if "points" in modes and im.image_id in id_to_gb:
            # optimization-points display: visible points of every level,
            # one palette color per point scale (gui_main_window.h:47-61)
            gi, b = id_to_gb[im.image_id]
            g = cost_opt.p.groups[gi]
            gcam = g.camera
            pimg = np.zeros((gcam.height, gcam.width, 3), np.uint8)
            palette = np.asarray(
                [[66, 135, 245], [52, 199, 89], [255, 204, 0],
                 [255, 59, 48], [175, 82, 222], [90, 200, 250]], np.uint8)
            gpose = SE3(g.poses.q[b], g.poses.t[b])
            for l in range(len(cost_opt.p.levels)):
                bi, j = cost_opt._batch_row[(gi, l)][b]
                m_rows, _ = cost_vis[gi][l][bi]
                mask = np.asarray(m_rows[j])
                pts_l, _, _ = cost_opt._geom(gi, b, l)
                pix, pv = cm.project(gcam, gpose.apply(pts_l))
                pix, pv = np.asarray(pix), np.asarray(pv)
                sel = mask & pv
                ix = np.floor(pix[:, 0] + 0.5).astype(np.int64)
                iy = np.floor(pix[:, 1] + 0.5).astype(np.int64)
                sel &= (ix >= 0) & (iy >= 0) & (ix < gcam.width) & (iy < gcam.height)
                pimg[iy[sel], ix[sel]] = palette[l % len(palette)]
            Image.fromarray(pimg).save(
                os.path.join(args.output_folder_path, f"{base}.points.png"))
        for cmode in cost_modes:
            if im.image_id not in id_to_gb:
                continue
            gi, b = id_to_gb[im.image_id]
            which = {"cost": "fixed", "cost_variable": "variable",
                     "cost_combined": "combined"}.get(cmode)
            if which is None:
                raise SystemExit(f"unknown cost mode: {cmode}")
            cimg = cost_opt.render_cost_image(gi, b, which, vis=cost_vis)
            cfin = cimg[np.isfinite(cimg)]
            cmax = np.percentile(cfin, 98) if cfin.size else 1.0
            Image.fromarray(_colormap(cimg, 0.0, max(cmax, 1e-6))).save(
                os.path.join(args.output_folder_path, f"{base}.{cmode}.png"))
        if "overlay" in modes and args.image_base_path:
            img_path = os.path.join(args.image_base_path, im.name)
            if os.path.exists(img_path):
                photo = np.asarray(Image.open(img_path).convert("RGB"))
                vis = photo.copy()
                m = np.isfinite(depth)
                cmap = _colormap(depth, vmin, vmax)
                vis[m] = (0.35 * photo[m] + 0.65 * cmap[m]).astype(np.uint8)
                Image.fromarray(vis).save(
                    os.path.join(args.output_folder_path, f"{base}.overlay.png"))
        print(f"{im.name}: wrote {sorted(modes)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
