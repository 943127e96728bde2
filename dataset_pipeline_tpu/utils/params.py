"""Global tuning parameters with CLI parsing and reproducibility dump.

Counterpart of the reference's ``opt::Parameters`` singleton
(``opt/parameters.h:40-244``) — same knobs and defaults — but passed
explicitly instead of hidden in a global (identical parameters must be
passed to DatasetInspector and ImageRegistrator, ``README.md:770-771``; a
dataclass makes that contract visible).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass


@dataclass
class Parameters:
    # multi-resolution point cloud (opt/parameters.h defaults)
    point_neighbor_count: int = 5
    point_neighbor_candidate_count: int = 25
    min_mean_intensity_difference_for_points: float = 5.0
    min_radius_bias: float = 1.05
    merge_distance_factor: float = 4.0

    # residual weights
    fixed_residuals_weight: float = 1.0
    variable_residuals_weight: float = 1.0
    depth_residuals_weight: float = 0.0

    # robust cost
    robust_weighting_type: str = "huber"
    robust_weighting_parameter: float = 30.0 * (5.0 ** 0.5) / (2.0 ** 0.5)
    depth_robust_weighting_parameter: float = 0.02

    # occlusion handling
    occlusion_depth_threshold: float = 0.01
    min_occlusion_depth: float = 0.05
    max_occlusion_depth: float = 100.0
    splat_radius: float = 0.03

    # images
    max_initial_image_area: int = 200 * 160
    maximum_valid_intensity: float = 252.0

    # global scale normalization (0 = derive from the first scan's Sim3)
    scale_factor: float = 0.0

    def add_to_argparser(self, parser: argparse.ArgumentParser) -> None:
        for f in dataclasses.fields(self):
            parser.add_argument(
                f"--{f.name}", type=type(getattr(self, f.name)),
                default=getattr(self, f.name),
            )

    @classmethod
    def from_args(cls, args: argparse.Namespace) -> "Parameters":
        kwargs = {}
        for f in dataclasses.fields(cls):
            if hasattr(args, f.name):
                kwargs[f.name] = getattr(args, f.name)
        return cls(**kwargs)

    def dump(self) -> str:
        """metadata.txt-style parameter dump (``opt/parameters.h:105-127``)."""
        return "\n".join(
            f"{f.name} {getattr(self, f.name)}" for f in dataclasses.fields(self)
        )
