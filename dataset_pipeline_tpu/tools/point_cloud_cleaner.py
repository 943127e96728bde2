"""PointCloudCleaner: iterated local statistical outlier removal.

CLI counterpart of ``/root/reference/src/exe/point_cloud_cleaner.cc``:
``--in X.ply`` and repeated ``--filter k,factor`` produce ``X.inliers.ply``
and ``X.outliers.ply`` next to the input (the ETH3D recipe is
``--filter 270,1.15 --filter 20,1.15``, reference ``README.md:372``).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from dataset_pipeline_tpu.io.ply import PointCloud, read_ply, write_ply
from dataset_pipeline_tpu.ops.outlier import remove_outliers


def _subset(pc: PointCloud, mask: np.ndarray) -> PointCloud:
    return PointCloud(
        pc.positions[mask],
        pc.normals[mask] if pc.normals is not None else None,
        pc.colors[mask] if pc.colors is not None else None,
        None,
        {k: v[mask] for k, v in pc.extras.items()},
    )


def main(argv=None) -> int:
    from dataset_pipeline_tpu.utils.params import Parameters

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in", dest="input", required=True, help="input PLY")
    p.add_argument(
        "--filter",
        action="append",
        default=[],
        metavar="K,FACTOR",
        help="neighbor count and distance factor; repeatable, applied in order",
    )
    p.add_argument("--out_prefix", default=None, help="output prefix (default: input path)")
    # shared pipeline knob set (opt/parameters.h): every tool accepts
    # the identical flags so one knob set drives the whole pipeline
    Parameters().add_to_argparser(p)
    args = p.parse_args(argv)
    params = Parameters.from_args(args)  # noqa: F841 (dump/consume)

    filters = []
    for f in args.filter:
        k_s, factor_s = f.split(",")
        filters.append((int(k_s), float(factor_s)))
    if not filters:
        print("warning: no --filter given; all points are inliers", file=sys.stderr)

    cloud = read_ply(args.input)
    print(f"loaded {len(cloud)} points from {args.input}")
    mask = remove_outliers(cloud.positions, filters)

    prefix = args.out_prefix or os.path.splitext(args.input)[0]
    inl, outl = prefix + ".inliers.ply", prefix + ".outliers.ply"
    write_ply(inl, _subset(cloud, mask))
    write_ply(outl, _subset(cloud, ~mask))
    print(f"kept {int(mask.sum())} inliers -> {inl}")
    print(f"removed {int((~mask).sum())} outliers -> {outl}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
