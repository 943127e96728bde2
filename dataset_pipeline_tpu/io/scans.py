"""Scan-set loading: MeshLab .mlp project + per-scan PLY clouds.

Counterpart of ``opt::LoadPointClouds`` (``opt/util.cc:39-70``) and the
scale-factor convention of ``io/meshlab_project.cc:74-77``: all internal
computation runs in a normalized global frame in which the FIRST scan has
unit scale (``scale_factor = 1 / first scan Sim3 scale``); writers divide by
the same factor to restore original units. Unlike the reference's global
singleton, the factor is carried explicitly by :class:`ScanSet`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from dataset_pipeline_tpu.io.meshlab import (
    MeshInfo,
    read_meshlab_project,
    sim3_from_matrix,
    write_meshlab_project,
)
from dataset_pipeline_tpu.io.ply import PointCloud, read_ply


@dataclass
class ScanSet:
    infos: List[MeshInfo]  # original (unnormalized) infos
    clouds: List[PointCloud]  # local-frame clouds as loaded
    scale_factor: float  # 1 / scale of first scan

    def global_matrix(self, i: int) -> np.ndarray:
        """Normalized global_T_mesh (original matrix with scale_factor applied)."""
        M = np.asarray(self.infos[i].global_T_mesh, np.float64).copy()
        M[:3, :] *= self.scale_factor
        return M

    def global_positions(self, i: int) -> np.ndarray:
        """Scan i's points in the normalized global frame, float32."""
        M = self.global_matrix(i)
        p = self.clouds[i].positions
        return (p @ M[:3, :3].T + M[:3, 3]).astype(np.float32)

    def scan_origin(self, i: int) -> np.ndarray:
        """Scan origin (viewpoint for normal orientation) in normalized frame."""
        return self.global_matrix(i)[:3, 3].astype(np.float32)


def load_scan_set(mlp_path: str, load_clouds: bool = True) -> ScanSet:
    infos = read_meshlab_project(mlp_path)
    if not infos:
        raise ValueError(f"{mlp_path}: empty MeshGroup")
    s0, _, _ = sim3_from_matrix(infos[0].global_T_mesh)
    scale_factor = 1.0 / s0
    clouds = []
    if load_clouds:
        for info in infos:
            clouds.append(read_ply(info.resolved_path(mlp_path)))
    return ScanSet(infos, clouds, scale_factor)


def write_scan_poses(mlp_path: str, scans: ScanSet,
                     new_normalized_matrices: Optional[List[np.ndarray]] = None) -> None:
    """Write an .mlp with updated scan poses (normalized-frame matrices are
    divided by ``scale_factor`` back to original units)."""
    infos = []
    for i, info in enumerate(scans.infos):
        if new_normalized_matrices is not None:
            M = np.asarray(new_normalized_matrices[i], np.float64).copy()
            M[:3, :] /= scans.scale_factor
        else:
            M = info.global_T_mesh
        infos.append(MeshInfo(info.label, info.filename, M))
    write_meshlab_project(mlp_path, infos)
