"""MeshLab project (.mlp) read/write.

Counterpart of ``/root/reference/src/io/meshlab_project.{h,cc}``: an XML file
holding, per scan, a label, a mesh filename, and a 4x4 global-from-mesh matrix
(in general a similarity transform — the reference stores it as ``Sim3f``).
The writer reproduces the reference's layout quirks (leading newline and
trailing spaces inside ``MLMatrix44`` — MeshLab crashes without them,
``meshlab_project.cc:104-115``).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import List

import numpy as np


@dataclass
class MeshInfo:
    label: str
    filename: str
    global_T_mesh: np.ndarray  # (4,4) float64, general (usually Sim3)

    def resolved_path(self, project_path: str) -> str:
        if os.path.isabs(self.filename):
            return self.filename
        return os.path.join(os.path.dirname(os.path.abspath(project_path)), self.filename)


def read_meshlab_project(path: str) -> List[MeshInfo]:
    tree = ET.parse(path)
    root = tree.getroot()
    group = root.find("MeshGroup")
    if group is None:
        raise ValueError(f"{path}: no MeshGroup element")
    meshes = []
    for mlmesh in group.findall("MLMesh"):
        label = mlmesh.get("label", "")
        filename = mlmesh.get("filename", "")
        mat_el = mlmesh.find("MLMatrix44")
        if mat_el is None or mat_el.text is None:
            matrix = np.eye(4)
        else:
            vals = [float(v) for v in mat_el.text.split()]
            if len(vals) != 16:
                raise ValueError(f"{path}: MLMatrix44 has {len(vals)} values")
            matrix = np.asarray(vals, np.float64).reshape(4, 4)
        meshes.append(MeshInfo(label, filename, matrix))
    return meshes


def write_meshlab_project(path: str, meshes: List[MeshInfo]) -> None:
    lines = ['<!DOCTYPE MeshLabDocument>', "<MeshLabProject>", " <MeshGroup>"]
    for m in meshes:
        lines.append(f'  <MLMesh label="{m.label}" filename="{m.filename}">')
        lines.append("   <MLMatrix44>")
        M = np.asarray(m.global_T_mesh, np.float64)
        for r in range(4):
            # trailing space is intentional (MeshLab compatibility)
            lines.append("".join(f"{_fmt(M[r, c])} " for c in range(4)))
        lines.append("</MLMatrix44>")
        lines.append("  </MLMesh>")
    lines.append(" </MeshGroup>")
    lines.append("</MeshLabProject>")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _fmt(v: float) -> str:
    # shortest float repr, matching C++ default ostream precision style
    s = f"{v:.9g}"
    return s


def sim3_from_matrix(m: np.ndarray):
    """Decompose a 4x4 similarity matrix into (scale, R (3,3), t (3,))."""
    A = np.asarray(m, np.float64)
    R = A[:3, :3]
    s = float(np.cbrt(max(np.linalg.det(R), 1e-30)))
    return s, R / s, A[:3, 3].copy()


def matrix_from_sim3(s: float, R: np.ndarray, t: np.ndarray) -> np.ndarray:
    M = np.eye(4)
    M[:3, :3] = s * R
    M[:3, 3] = t
    return M
