"""ICPScanAligner: multi-scale joint scan alignment.

CLI counterpart of ``/root/reference/src/exe/icp_scan_aligner.cc``: loads a
MeshLab project, optionally restricts which objects are optimized / fixed /
ignored by label, then runs coarse-to-fine ICP — per scale the clouds are
stride-subsampled by ``downscale_step^(scales-1-s)``, normals are recomputed
in the scan-local frame (viewpoint = origin, k=32), and the correspondence
distance is scaled by ``search_distance_increase_factor^(scales-1-s)``.
The output ``.mlp`` is rewritten after every outer iteration so the run can
be interrupted (``icp_scan_aligner.cc:342-370``).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Set

import numpy as np

from dataset_pipeline_tpu.icp.point_to_plane import PointToPlaneICP
from dataset_pipeline_tpu.io.meshlab import MeshInfo, read_meshlab_project, write_meshlab_project
from dataset_pipeline_tpu.io.ply import read_ply
from dataset_pipeline_tpu.ops.knn import build_grid, knn_bruteforce
from dataset_pipeline_tpu.ops.normals import estimate_normals


def _parse_label_set(s: str) -> Set[str]:
    return {v for v in s.split(",") if v} if s else set()


def _local_normals(points: np.ndarray, k: int, grid_above: int = 200_000) -> np.ndarray:
    vp = np.zeros(3, np.float32)  # scan-local viewpoint = origin
    if len(points) > grid_above:
        sample = points[:: max(1, len(points) // 20000)]
        d2, _ = knn_bruteforce(sample, sample, 2)
        typical = float(np.sqrt(max(float(np.median(np.asarray(d2)[:, 1])), 1e-12)))
        cell = max(typical * (k ** (1 / 3)) * 2.0, 1e-6)
        grid = build_grid(points, cell)
        normals, _ = estimate_normals(points, vp, k=k, grid=grid)
    else:
        normals, _ = estimate_normals(points, vp, k=k)
    return np.asarray(normals)


def main(argv=None) -> int:
    from dataset_pipeline_tpu.utils.params import Parameters

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input", required=True, help="input .mlp")
    p.add_argument("-o", "--output", required=True, help="output .mlp")
    p.add_argument("--max_iterations", type=int, default=50)
    p.add_argument("--convergence_threshold", type=float, default=1e-6)
    p.add_argument("-d", "--max_correspondence_distance", type=float, default=0.10)
    p.add_argument("--objects_to_optimize", default="",
                   help="comma-separated labels; others are fixed")
    p.add_argument("--objects_to_ignore", default="")
    p.add_argument("--normal_estimation_neighbor_count", type=int, default=32)
    p.add_argument("--number_of_scales", type=int, default=1)
    p.add_argument("--downscale_step", type=int, default=4)
    p.add_argument("--search_distance_increase_factor_per_scale", type=float, default=2.0)
    # shared pipeline knob set (opt/parameters.h): every tool accepts
    # the identical flags so one knob set drives the whole pipeline
    Parameters().add_to_argparser(p)
    args = p.parse_args(argv)
    params = Parameters.from_args(args)  # noqa: F841 (dump/consume)

    optimize_labels = _parse_label_set(args.objects_to_optimize)
    ignore_labels = _parse_label_set(args.objects_to_ignore)

    infos = read_meshlab_project(args.input)
    poses = {m.label: np.asarray(m.global_T_mesh, np.float64) for m in infos}
    local_clouds = {}
    for m in infos:
        if m.label in ignore_labels:
            continue
        local_clouds[m.label] = read_ply(m.resolved_path(args.input)).positions
        print(f"object {m.label}: {len(local_clouds[m.label])} points"
              + (" [fixed]" if optimize_labels and m.label not in optimize_labels else ""))

    for scale_index in range(args.number_of_scales):
        if args.number_of_scales > 1:
            print(f"optimizing at scale {scale_index}")
        step = args.downscale_step ** (args.number_of_scales - 1 - scale_index)
        dist = (
            args.search_distance_increase_factor_per_scale
            ** (args.number_of_scales - 1 - scale_index)
            * args.max_correspondence_distance
        )

        icp = PointToPlaneICP()
        movable_labels: List[str] = []
        for m in infos:
            if m.label in ignore_labels:
                continue
            pts = local_clouds[m.label][::step] if step > 1 else local_clouds[m.label]
            pts = np.ascontiguousarray(pts, np.float32)
            normals = _local_normals(pts, args.normal_estimation_neighbor_count)
            fixed = bool(optimize_labels) and m.label not in optimize_labels
            icp.add_point_cloud(pts, normals, poses[m.label], fixed=fixed)
            if not fixed:
                movable_labels.append(m.label)

        for iteration in range(args.max_iterations):
            res = icp.run(dist, max_num_iterations=1,
                          convergence_threshold_max_movement=args.convergence_threshold,
                          print_progress=True)
            for label, T in zip(movable_labels, res.poses):
                poses[label] = T
            # write every iteration for interruptibility
            write_meshlab_project(
                args.output,
                [MeshInfo(m.label, m.filename, poses.get(m.label, m.global_T_mesh))
                 for m in infos],
            )
            if res.converged:
                print("converged (max movement below threshold)")
                break

    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
