"""Programmatic point-cloud / mesh editing operations.

Headless counterparts of the PointCloudEditor GUI tools
(``point_cloud_editor/*``, SURVEY.md §2.7): lasso selection in a camera view
(``tool_select_lasso.cc``), beyond-plane selection from 3 picked points
(``tool_select_beyond_plane.cc``), set-up-direction world rotation
(``tool_set_up_direction.cc``), and box-based mesh cropping (the CSG cube
tool's dominant use — carving an occlusion mesh down to a region; full
boolean CSG a la Cork is out of scope, triangles are kept/dropped whole).
"""

from __future__ import annotations

import numpy as np

from dataset_pipeline_tpu.models import cameras as cm


def select_lasso(points: np.ndarray, camera: cm.Camera, image_T_global: np.ndarray,
                 polygon_px: np.ndarray) -> np.ndarray:
    """Mask of points whose projection falls inside a 2D lasso polygon."""
    import jax.numpy as jnp

    R, t = image_T_global[:3, :3], image_T_global[:3, 3]
    p_cam = points @ R.T + t
    pix, valid = cm.project(camera, jnp.asarray(p_cam, jnp.float32))
    pix = np.asarray(pix)
    valid = np.asarray(valid)
    # even-odd rule point-in-polygon, vectorized
    poly = np.asarray(polygon_px, np.float64)
    x, y = pix[:, 0], pix[:, 1]
    inside = np.zeros(len(points), bool)
    n = len(poly)
    j = n - 1
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[j]
        cross = (yi > y) != (yj > y)
        xint = (xj - xi) * (y - yi) / (yj - yi + 1e-30) + xi
        inside ^= cross & (x < xint)
        j = i
    return inside & valid


def select_beyond_plane(points: np.ndarray, p0, p1, p2) -> np.ndarray:
    """Mask of points beyond the plane fit to three picked points (on the
    side the plane normal points away from, like the GUI tool)."""
    p0, p1, p2 = (np.asarray(v, np.float64) for v in (p0, p1, p2))
    n = np.cross(p1 - p0, p2 - p0)
    n /= max(np.linalg.norm(n), 1e-30)
    return (points - p0) @ n > 0


def apply_up_direction(points: np.ndarray, up_vector) -> tuple[np.ndarray, np.ndarray]:
    """Rotation that maps ``up_vector`` to +Z, applied to the points.

    Returns (rotated_points, R) — the GUI's set-up-direction tool.
    """
    up = np.asarray(up_vector, np.float64)
    up /= max(np.linalg.norm(up), 1e-30)
    z = np.asarray([0.0, 0.0, 1.0])
    v = np.cross(up, z)
    c = float(up @ z)
    if np.linalg.norm(v) < 1e-12:
        R = np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
    else:
        K = np.asarray([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        R = np.eye(3) + K + K @ K / (1.0 + c)
    return (points @ R.T).astype(points.dtype), R


def crop_mesh_to_box(vertices: np.ndarray, faces: np.ndarray, box_min, box_max,
                     keep_inside: bool = True):
    """Keep only triangles fully inside (or outside) an axis-aligned box.

    Vertices are compacted and faces reindexed. Whole-triangle clipping —
    no retriangulation at the box surface (documented deviation from the
    GUI's Cork-based exact CSG).
    """
    box_min = np.asarray(box_min, np.float32)
    box_max = np.asarray(box_max, np.float32)
    v_in = np.all((vertices >= box_min) & (vertices <= box_max), axis=1)
    tri_in = v_in[faces].all(1)
    keep = tri_in if keep_inside else ~(v_in[faces].any(1))
    kept_faces = faces[keep]
    used = np.unique(kept_faces)
    remap = np.full(len(vertices), -1, np.int64)
    remap[used] = np.arange(len(used))
    return vertices[used], remap[kept_faces].astype(faces.dtype)
