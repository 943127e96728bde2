"""DatasetInspector (offline): per-image diagnostic renderings.

Headless counterpart of the reference's Qt DatasetInspector GUI display
modes (``dataset_inspector/gui_main_window.h:47-61``): instead of an
interactive viewer, writes PNG visualizations per image —

- ``depth``:      optimization point depths, colormapped
- ``overlay``:    depth points over the (grayscale) photograph
- ``occlusion``:  splat/mesh occlusion depth map
- ``cost``:       per-point fixed-descriptor residual magnitudes reprojected
                  into the image (the GUI's cost display mode)

The mask-drawing and manual-localization GUI tools remain out of scope; mask
SIDE-CAR files (masks_for_images/masks_for_cameras) are honored by the
loaders when present.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax.numpy as jnp

from dataset_pipeline_tpu.io.scans import load_scan_set
from dataset_pipeline_tpu.io.state import load_colmap_state
from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3, quat_to_matrix
from dataset_pipeline_tpu.ops.splat import render_points_depth, render_splats_depth


def _colormap(values, vmin, vmax):
    """Simple turbo-ish colormap to uint8 RGB; invalid -> black."""
    t = np.clip((values - vmin) / max(vmax - vmin, 1e-9), 0, 1)
    r = np.clip(1.5 - np.abs(2.0 * t - 1.5), 0, 1)
    g = np.clip(1.5 - np.abs(2.0 * t - 1.0), 0, 1)
    b = np.clip(1.5 - np.abs(2.0 * t - 0.5), 0, 1)
    rgb = (np.stack([r, g, b], -1) * 255).astype(np.uint8)
    rgb[~np.isfinite(values)] = 0
    return rgb


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scan_alignment_path", required=True)
    p.add_argument("--state_path", required=True)
    p.add_argument("--image_base_path", default="")
    p.add_argument("--output_folder_path", required=True)
    p.add_argument("--splat_radius", type=float, default=0.03)
    p.add_argument("--modes", default="depth,overlay,occlusion",
                   help="comma list: depth,overlay,occlusion")
    args = p.parse_args(argv)

    from PIL import Image

    modes = set(args.modes.split(","))
    scans = load_scan_set(args.scan_alignment_path)
    state = load_colmap_state(args.state_path, scans.scale_factor)
    pts = np.concatenate([scans.global_positions(i) for i in range(len(scans.infos))])
    pts_j = jnp.asarray(pts)
    os.makedirs(args.output_folder_path, exist_ok=True)

    for im in state.images:
        cam = state.cameras[im.camera_id]
        T = np.eye(4)
        T[:3, :3] = np.asarray(quat_to_matrix(jnp.asarray(im.qvec, jnp.float32)))
        T[:3, 3] = im.tvec
        pose = SE3.from_matrix(jnp.asarray(T, jnp.float32))
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
                p_cam, jnp.full((len(pts),), args.splat_radius, jnp.float32),
                cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy))
            Image.fromarray(_colormap(od, vmin, vmax)).save(
                os.path.join(args.output_folder_path, f"{base}.occlusion.png"))
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
