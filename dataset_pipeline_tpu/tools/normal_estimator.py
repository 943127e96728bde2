"""NormalEstimator: per-scan PCA normals in the global frame.

CLI counterpart of ``/root/reference/src/exe/normal_estimator.cc``: loads a
scan alignment ``.mlp``, estimates per-scan normals (viewpoint = scan origin,
``normal_estimator.cc:188-191``), merges all scans, and writes a single PLY
with x,y,z,nx,ny,nz,rgb with positions restored to original units
(``normal_estimator.cc:201-208``).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from dataset_pipeline_tpu.io.ply import PointCloud, write_ply
from dataset_pipeline_tpu.io.scans import load_scan_set
from dataset_pipeline_tpu.ops.knn import build_grid, knn_bruteforce
from dataset_pipeline_tpu.ops.normals import estimate_normals


def main(argv=None) -> int:
    from dataset_pipeline_tpu.utils.params import Parameters

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input", required=True, help="scan_alignment.mlp")
    p.add_argument("-o", "--output", required=True, help="merged output PLY")
    p.add_argument("--neighbor_count", type=int, default=8)
    p.add_argument("--neighbor_radius", type=float, default=0.0,
                   help="if >0, grid cell size for the neighbor search; "
                        "otherwise derived from data")
    p.add_argument("--grid_above", type=int, default=200_000,
                   help="use the voxel-grid search above this many points")
    # shared pipeline knob set (opt/parameters.h): every tool accepts
    # the identical flags so one knob set drives the whole pipeline
    Parameters().add_to_argparser(p)
    args = p.parse_args(argv)
    params = Parameters.from_args(args)  # noqa: F841 (dump/consume)

    scans = load_scan_set(args.input)
    all_pos, all_normals, all_colors = [], [], []
    for i in range(len(scans.infos)):
        pos = scans.global_positions(i)
        vp = scans.scan_origin(i)
        print(f"scan {i} ({scans.infos[i].label}): {len(pos)} points")
        if len(pos) > args.grid_above:
            if args.neighbor_radius > 0:
                cell = args.neighbor_radius
            else:
                sample = pos[:: max(1, len(pos) // 20000)]
                d2, _ = knn_bruteforce(sample, sample, 2)
                typical = float(np.sqrt(max(float(np.median(np.asarray(d2)[:, 1])), 1e-12)))
                cell = max(typical * (args.neighbor_count ** (1 / 3)) * 2.0, 1e-6)
            grid = build_grid(pos, cell)
            normals, ok = estimate_normals(pos, vp, k=args.neighbor_count, grid=grid)
        else:
            normals, ok = estimate_normals(pos, vp, k=args.neighbor_count)
        all_pos.append(pos / scans.scale_factor)  # back to original units
        all_normals.append(np.asarray(normals))
        c = scans.clouds[i].colors
        all_colors.append(c if c is not None else np.zeros((len(pos), 3), np.uint8))

    merged = PointCloud(
        np.concatenate(all_pos).astype(np.float32),
        np.concatenate(all_normals).astype(np.float32),
        np.concatenate(all_colors),
    )
    write_ply(args.output, merged)
    print(f"wrote {len(merged)} points with normals -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
