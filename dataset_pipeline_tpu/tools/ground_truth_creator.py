"""GroundTruthCreator: per-image GT depth maps + 2-view-filtered clouds.

CLI counterpart of ``/root/reference/src/exe/ground_truth_creator.cc``:

- loads the scan alignment (.mlp) + COLMAP state; optionally rotates the
  world so the first scan is upright (``:264-290``);
- occlusion geometry = splats at every scan point (or an occlusion mesh once
  the mesh rasterizer lands);
- counts, per scan point, in how many images it is visible (projection +
  occlusion z-test with threshold slack + eval mask, ``:45-85``);
- writes trimmed per-scan PLYs keeping points observed in >= 2 images plus
  the scan_alignment.mlp (``:395-440``);
- writes per-image ground-truth depth (min z per rounded pixel over visible
  >=2-obs points, raw float32, optional gzip, ``:148-216``), occlusion depth
  renders, and scan-rendering overlays.
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dataset_pipeline_tpu.io.depthmap import write_depth_raw
from dataset_pipeline_tpu.io.meshlab import MeshInfo, write_meshlab_project
from dataset_pipeline_tpu.io.ply import PointCloud, write_ply
from dataset_pipeline_tpu.io.scans import load_scan_set
from dataset_pipeline_tpu.io.state import load_colmap_state
from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3, quat_rotate
from dataset_pipeline_tpu.ops.splat import render_splats_depth

DEFAULT_SPLAT_RADIUS = 0.03  # opt/parameters.h
OCCLUSION_DEPTH_THRESHOLD = 0.01
MIN_OCCLUSION_DEPTH = 0.05
MAX_OCCLUSION_DEPTH = 100.0


@partial(jax.jit, static_argnames=("width", "height"))
def _visible_mask(camera: cm.Camera, pose_q, pose_t, points, occl_depth,
                  width: int, height: int, eval_mask=None):
    """Visibility of each point in one image (projection + z-test + optional
    eval mask: pixels whose mask value equals kEvalObs are excluded, matching
    ``ground_truth_creator.cc:77``)."""
    p_cam = quat_rotate(pose_q[None], points) + pose_t[None]
    z = p_cam[:, 2]
    pix, valid = cm.project(camera, p_cam)
    ix = jnp.floor(pix[:, 0] + 0.5).astype(jnp.int32)
    iy = jnp.floor(pix[:, 1] + 0.5).astype(jnp.int32)
    inside = valid & (ix >= 0) & (iy >= 0) & (ix < width) & (iy < height)
    ixc = jnp.clip(ix, 0, width - 1)
    iyc = jnp.clip(iy, 0, height - 1)
    occ = occl_depth[iyc, ixc]
    vis = inside & (z > 0) & (occ + OCCLUSION_DEPTH_THRESHOLD >= z)
    if eval_mask is not None:
        from dataset_pipeline_tpu.photometric.masks import MASK_EVAL_OBS

        vis = vis & (eval_mask[iyc, ixc] != MASK_EVAL_OBS)
    return vis, ix, iy, z


@partial(jax.jit, static_argnames=("width", "height"))
def _gt_depth_image(camera: cm.Camera, pose_q, pose_t, points, keep, occl_depth,
                    width: int, height: int, eval_mask=None):
    vis, ix, iy, z = _visible_mask(camera, pose_q, pose_t, points, occl_depth,
                                   width, height, eval_mask)
    from dataset_pipeline_tpu.ops.splat import zbuffer_min

    ok = vis & keep
    flat = jnp.where(ok, iy * width + ix, -1)
    depth = zbuffer_min(flat, jnp.where(ok, z, jnp.inf), height * width)
    return depth.reshape(height, width)


@partial(jax.jit, static_argnames=("width", "height", "radius"))
def _scan_rendering(camera: cm.Camera, pose_q, pose_t, points, colors, keep,
                    occl_depth, base_image, width: int, height: int, radius: int,
                    eval_mask=None):
    vis, ix, iy, _ = _visible_mask(camera, pose_q, pose_t, points, occl_depth,
                                   width, height, eval_mask)
    ok = vis & keep
    img = base_image
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            jx, jy = ix + dx, iy + dy
            inside = ok & (jx >= 0) & (jy >= 0) & (jx < width) & (jy < height)
            # out-of-range padding index (negative would wrap to the last px)
            flat = jnp.where(inside, jy * width + jx, height * width)
            img = img.reshape(-1, 3).at[flat].set(colors, mode="drop").reshape(height, width, 3)
    return img


def render_occlusion_depth(camera: cm.Camera, pose: SE3, occlusion_points,
                           splat_radius: float, max_radius_px: int = 3,
                           occlusion_mesh=None):
    if occlusion_mesh is not None:
        from dataset_pipeline_tpu.ops.mesh_raster import render_occlusion_mesh_depth

        return render_occlusion_mesh_depth(
            camera, pose, occlusion_mesh, splat_radius=splat_radius,
            min_depth=MIN_OCCLUSION_DEPTH, max_depth=MAX_OCCLUSION_DEPTH,
        )
    p_cam = pose.apply(occlusion_points)
    z = p_cam[:, 2]
    in_range = (z >= MIN_OCCLUSION_DEPTH) & (z <= MAX_OCCLUSION_DEPTH)
    p_cam = jnp.where(in_range[:, None], p_cam, jnp.asarray([0.0, 0.0, -1.0]))
    return render_splats_depth(
        p_cam, jnp.full((p_cam.shape[0],), splat_radius, jnp.float32),
        camera.width, camera.height, camera.fx, camera.fy, camera.cx, camera.cy,
        max_radius_px=max_radius_px,
    )


def main(argv=None) -> int:
    from dataset_pipeline_tpu.utils.params import Parameters

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scan_alignment_path", required=True)
    p.add_argument("--occlusion_mesh_path", default="")
    p.add_argument("--occlusion_splats_path", default="")
    p.add_argument("--image_base_path", default="")
    p.add_argument("--state_path", required=True)
    p.add_argument("--output_folder_path", required=True)
    p.add_argument("--rotate_first_scan_upright", action="store_true")
    p.add_argument("--scan_point_radius", type=int, default=2)
    p.add_argument("--write_point_cloud", type=int, default=1)
    p.add_argument("--write_depth_maps", type=int, default=1)
    p.add_argument("--write_occlusion_depth", type=int, default=0)
    p.add_argument("--write_scan_renderings", type=int, default=0)
    p.add_argument("--compress_depth_maps", type=int, default=0)
    Parameters().add_to_argparser(p)
    args = p.parse_args(argv)
    params = Parameters.from_args(args)

    scans = load_scan_set(args.scan_alignment_path)
    state = load_colmap_state(args.state_path, scans.scale_factor)
    os.makedirs(args.output_folder_path, exist_ok=True)

    # world rotation so the first scan is upright
    upright = np.eye(4)
    if args.rotate_first_scan_upright:
        M0 = scans.global_matrix(0)
        R0 = M0[:3, :3] / np.cbrt(max(np.linalg.det(M0[:3, :3]), 1e-30))
        Rinv = R0.T
        upright[:3, :3] = Rinv
        upright[:3, 3] = M0[:3, 3] - Rinv @ M0[:3, 3]

    # scan points in (possibly rotated) normalized global frame
    scan_pts, scan_cols = [], []
    for i in range(len(scans.infos)):
        gp = scans.global_positions(i)
        gp = gp @ upright[:3, :3].T + upright[:3, 3]
        scan_pts.append(gp.astype(np.float32))
        c = scans.clouds[i].colors
        scan_cols.append(c if c is not None else np.zeros((len(gp), 3), np.uint8))

    occl_points = jnp.asarray(np.concatenate(scan_pts))
    occlusion_mesh = None
    if args.occlusion_mesh_path:
        from dataset_pipeline_tpu.io.ply import read_ply
        from dataset_pipeline_tpu.ops.mesh_raster import build_occlusion_mesh

        mesh_pc = read_ply(args.occlusion_mesh_path)
        verts = [mesh_pc.positions @ upright[:3, :3].T + upright[:3, 3]]
        faces = [mesh_pc.faces]
        if args.occlusion_splats_path:
            sp = read_ply(args.occlusion_splats_path)
            if sp.faces is not None:
                faces.append(sp.faces + len(verts[0]))
                verts.append(sp.positions @ upright[:3, :3].T + upright[:3, 3])
        occlusion_mesh = build_occlusion_mesh(
            np.concatenate(verts).astype(np.float32), np.concatenate(faces))
    elif args.occlusion_splats_path:
        from dataset_pipeline_tpu.io.ply import read_ply

        sp = read_ply(args.occlusion_splats_path).positions
        sp = sp @ upright[:3, :3].T + upright[:3, 3]
        occl_points = jnp.asarray(sp.astype(np.float32))

    # per-image poses in the rotated frame: image_T_global' = image_T_global . upright^-1
    up_inv = np.linalg.inv(upright)

    counts = [np.zeros(len(ptsb), np.int64) for ptsb in scan_pts]
    images = state.images
    print(f"{len(images)} images, {sum(len(x) for x in scan_pts)} scan points")

    def image_pose(im):
        T = np.eye(4)
        from dataset_pipeline_tpu.models.lie import quat_to_matrix

        T[:3, :3] = np.asarray(quat_to_matrix(jnp.asarray(im.qvec, jnp.float32)))
        T[:3, 3] = im.tvec
        T = T @ up_inv
        return SE3.from_matrix(jnp.asarray(T, jnp.float32))

    # export rotated calibration
    from dataset_pipeline_tpu.io.state import ModelState, save_colmap_state

    rot_images = []
    for im in images:
        pose = image_pose(im)
        im2 = type(im)(im.image_id, im.camera_id, im.name,
                       np.asarray(pose.q), np.asarray(pose.t))
        rot_images.append(im2)
    save_colmap_state(os.path.join(args.output_folder_path, "calibration"),
                      ModelState(state.cameras, rot_images, scans.scale_factor))

    occl_cache = {}
    eval_masks = {}
    for im in images:
        cam = state.cameras[im.camera_id]
        pose = image_pose(im)
        od = render_occlusion_depth(cam, pose, occl_points, params.splat_radius,
                                    occlusion_mesh=occlusion_mesh)
        occl_cache[im.image_id] = od
        em = None
        if args.image_base_path:
            from dataset_pipeline_tpu.photometric.masks import image_mask_path, load_mask

            m = load_mask(image_mask_path(args.image_base_path, im.name))
            if m is not None:
                em = jnp.asarray(m if m.ndim == 2 else m.max(-1))
        eval_masks[im.image_id] = em
        for si, ptsb in enumerate(scan_pts):
            vis, _, _, _ = _visible_mask(cam, pose.q, pose.t, jnp.asarray(ptsb),
                                         od, cam.width, cam.height, em)
            counts[si] += np.asarray(vis, np.int64)
        if args.write_occlusion_depth:
            folder = os.path.join(args.output_folder_path, "occlusion_depth",
                                  os.path.dirname(im.name))
            os.makedirs(folder, exist_ok=True)
            write_depth_raw(os.path.join(args.output_folder_path, "occlusion_depth",
                                         im.name),
                            np.asarray(od), bool(args.compress_depth_maps))

    if args.write_point_cloud:
        infos_out = []
        for si in range(len(scan_pts)):
            keep = counts[si] >= 2
            name = f"scan{si}.ply"
            # write in the scan's LOCAL frame so the .mlp poses apply
            M = scans.global_matrix(si)
            M = upright @ M
            Minv = np.linalg.inv(M)
            local = scan_pts[si][keep] @ Minv[:3, :3].T + Minv[:3, 3]
            write_ply(os.path.join(args.output_folder_path, name),
                      PointCloud(local.astype(np.float32), None, scan_cols[si][keep]))
            Mout = M.copy()
            Mout[:3, :] /= scans.scale_factor
            infos_out.append(MeshInfo(scans.infos[si].label, name, Mout))
            print(f"scan {si}: kept {int(keep.sum())}/{len(keep)} points (>=2 obs)")
        write_meshlab_project(
            os.path.join(args.output_folder_path, "scan_alignment.mlp"), infos_out)

    if args.write_depth_maps or args.write_scan_renderings:
        all_pts = jnp.asarray(np.concatenate(scan_pts))
        all_cols = jnp.asarray(np.concatenate(scan_cols).astype(np.uint8))
        all_keep = jnp.asarray(np.concatenate([c >= 2 for c in counts]))
        for im in images:
            cam = state.cameras[im.camera_id]
            pose = image_pose(im)
            od = occl_cache[im.image_id]
            if args.write_depth_maps:
                d = _gt_depth_image(cam, pose.q, pose.t, all_pts, all_keep, od,
                                    cam.width, cam.height,
                                    eval_masks.get(im.image_id))
                folder = os.path.join(args.output_folder_path, "ground_truth_depth",
                                      os.path.dirname(im.name))
                os.makedirs(folder, exist_ok=True)
                write_depth_raw(
                    os.path.join(args.output_folder_path, "ground_truth_depth", im.name),
                    np.asarray(d), bool(args.compress_depth_maps))
            if args.write_scan_renderings and args.image_base_path:
                from PIL import Image

                img_path = os.path.join(args.image_base_path, im.name)
                if os.path.exists(img_path):
                    base = jnp.asarray(
                        np.asarray(Image.open(img_path).convert("RGB")), jnp.uint8)
                    out = _scan_rendering(cam, pose.q, pose.t, all_pts, all_cols,
                                          all_keep, od, base, cam.width, cam.height,
                                          args.scan_point_radius,
                                          eval_masks.get(im.image_id))
                    folder = os.path.join(args.output_folder_path, "scan_rendering",
                                          os.path.dirname(im.name))
                    os.makedirs(folder, exist_ok=True)
                    Image.fromarray(np.asarray(out)).save(
                        os.path.join(args.output_folder_path, "scan_rendering", im.name))
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
