"""Programmatic point-cloud / mesh editing operations.

Headless counterparts of the PointCloudEditor GUI tools
(``point_cloud_editor/*``, SURVEY.md §2.7): lasso selection in a camera view
(``tool_select_lasso.cc``), beyond-plane selection from 3 picked points
(``tool_select_beyond_plane.cc``), set-up-direction world rotation
(``tool_set_up_direction.cc``), point move/delete between clouds (the GUI's
M/Del keys), and the CSG cube tool (``tool_csg.cc``,
``csg_operation.cc:214-221``): union / intersection / difference of a mesh
with an axis-aligned box, implemented by exact Sutherland–Hodgman triangle
clipping against the 6 box planes with retriangulation at the cut (instead
of Cork's generic mesh–mesh booleans; cut cross-sections on the box surface
are left open rather than capped — they are invisible to the depth
renderer's z-test, which is what the carved occlusion meshes feed).
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


def move_points(src_points: np.ndarray, dst_points: np.ndarray,
                mask: np.ndarray):
    """Move masked points from one cloud to another (the GUI's M key).

    Returns (src_remaining, dst_with_moved)."""
    mask = np.asarray(mask, bool)
    moved = src_points[mask]
    dst = moved if dst_points is None or len(dst_points) == 0 else \
        np.concatenate([np.asarray(dst_points), moved], 0)
    return src_points[~mask], dst


def delete_points(points: np.ndarray, mask: np.ndarray,
                  *extras: np.ndarray):
    """Delete masked points (the GUI's Del key); ``extras`` are parallel
    per-point arrays (colors, labels, normals) filtered the same way."""
    keep = ~np.asarray(mask, bool)
    out = (points[keep],) + tuple(e[keep] for e in extras)
    return out[0] if not extras else out


def select_mesh_vertices(vertices: np.ndarray, faces: np.ndarray,
                         camera: cm.Camera, image_T_global: np.ndarray,
                         polygon_px: np.ndarray, occlusion_test: bool = True,
                         depth_slack: float = 0.01) -> np.ndarray:
    """Lasso-select MESH vertices in a camera view.

    Counterpart of the editor's vertex selection (``README.md:969-974``):
    with ``occlusion_test`` (the reference's behavior), vertices occluded by
    other parts of the SAME mesh are excluded — the mesh's own rasterized
    depth is the z-test reference.
    """
    mask = select_lasso(vertices, camera, image_T_global, polygon_px)
    if not occlusion_test or not len(faces):
        return mask
    import jax.numpy as jnp

    from dataset_pipeline_tpu.models.lie import SE3
    from dataset_pipeline_tpu.ops.mesh_raster import (
        build_occlusion_mesh,
        render_occlusion_mesh_depth,
    )

    from dataset_pipeline_tpu.models.lie import quat_from_matrix

    R, t = image_T_global[:3, :3], image_T_global[:3, 3]
    pose = SE3(quat_from_matrix(jnp.asarray(R, jnp.float32)),
               jnp.asarray(t, jnp.float32))
    mesh = build_occlusion_mesh(vertices, faces)
    depth = np.asarray(render_occlusion_mesh_depth(
        camera, pose, mesh, edge_splats=False))
    p_cam = vertices @ R.T + t
    pix, _ = cm.project(camera, jnp.asarray(p_cam, jnp.float32))
    pix = np.asarray(pix)
    ix = np.clip(np.round(pix[:, 0]).astype(int), 0, camera.width - 1)
    iy = np.clip(np.round(pix[:, 1]).astype(int), 0, camera.height - 1)
    d = depth[iy, ix]
    visible = (d > 0) & (p_cam[:, 2] <= d + depth_slack)
    return mask & visible


def move_mesh_vertices(vertices: np.ndarray, mask: np.ndarray,
                       translation) -> np.ndarray:
    """Translate the selected mesh vertices (the editor's G-key move,
    ``README.md:976-978``); faces are untouched."""
    out = np.array(vertices, copy=True)
    out[np.asarray(mask, bool)] += np.asarray(translation, out.dtype)
    return out


def delete_mesh_vertices(vertices: np.ndarray, faces: np.ndarray,
                         mask: np.ndarray, *extras: np.ndarray):
    """Delete the selected mesh vertices AND all faces adjacent to them
    (the editor's Del key on a mesh, ``README.md:974-976``), compacting the
    vertex array and remapping face indices.

    ``extras`` are parallel per-vertex arrays (colors, normals) filtered the
    same way. Returns (vertices, faces, *extras).
    """
    mask = np.asarray(mask, bool)
    keep = ~mask
    faces = np.asarray(faces)
    remap = np.full(len(vertices), -1, np.int64)
    remap[keep] = np.arange(int(keep.sum()))
    if len(faces):
        face_keep = keep[faces].all(1)
        new_f = remap[faces[face_keep]].astype(np.int32)
    else:
        new_f = np.zeros((0, 3), np.int32)
    out = (vertices[keep], new_f) + tuple(np.asarray(e)[keep] for e in extras)
    return out


def _clip_polys_by_plane(polys, axis, value, keep_greater):
    """Sutherland–Hodgman: clip convex polygons by an axis-aligned plane.

    Returns (kept_polys, other_polys) — polygons (lists of xyz vertices) on
    the kept side and on the other side (both exact, retriangulated later).
    """
    kept, other = [], []
    for poly in polys:
        sd = poly[:, axis] - value
        if not keep_greater:
            sd = -sd
        if np.all(sd >= 0):
            kept.append(poly)
            continue
        if np.all(sd <= 0):
            other.append(poly)
            continue
        side_a, side_b = [], []  # kept side, other side
        n = len(poly)
        for i in range(n):
            j = (i + 1) % n
            pi, pj = poly[i], poly[j]
            di, dj = sd[i], sd[j]
            if di >= 0:
                side_a.append(pi)
            if di <= 0:
                side_b.append(pi)
            if (di > 0) != (dj > 0) and di != dj:
                t = di / (di - dj)
                x = pi + t * (pj - pi)
                side_a.append(x)
                side_b.append(x)
        if len(side_a) >= 3:
            kept.append(np.asarray(side_a))
        if len(side_b) >= 3:
            other.append(np.asarray(side_b))
    return kept, other


def _clip_triangle_box(tri, box_min, box_max, keep_inside):
    """Exact triangle ∩ box (keep_inside) or triangle − box pieces.

    Plane-by-plane: the inside-half keeps flowing to the next plane; for
    keep_inside=False every outside-half is final output (the six
    outside-halves partition triangle − box disjointly).
    """
    inside = [np.asarray(tri, np.float64)]
    outside = []
    for axis in range(3):
        for value, keep_greater in ((box_min[axis], True),
                                    (box_max[axis], False)):
            inside, out = _clip_polys_by_plane(inside, axis, value,
                                               keep_greater)
            outside.extend(out)
            if not inside:
                break
        if not inside:
            break
    return inside if keep_inside else outside


def _triangulate_fan(polys, dtype):
    verts, faces = [], []
    base = 0
    for poly in polys:
        n = len(poly)
        verts.append(poly)
        for k in range(1, n - 1):
            faces.append((base, base + k, base + k + 1))
        base += n
    if not verts:
        return np.zeros((0, 3), dtype), np.zeros((0, 3), np.int32)
    return (np.concatenate(verts).astype(dtype),
            np.asarray(faces, np.int32))


def _compact_mesh(vertices, faces):
    used = np.unique(faces) if len(faces) else np.zeros(0, np.int64)
    remap = np.full(len(vertices), -1, np.int64)
    remap[used] = np.arange(len(used))
    return vertices[used], remap[faces].astype(np.int32) if len(faces) \
        else faces.astype(np.int32)


def _dedup_vertices(vertices, faces, decimals=6):
    if len(vertices) == 0:
        return vertices, faces
    key = np.round(vertices.astype(np.float64), decimals)
    _, idx, inv = np.unique(key, axis=0, return_index=True,
                            return_inverse=True)
    faces = inv[faces].astype(np.int32)
    # drop degenerate triangles produced by merging
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    return vertices[idx], faces[good]


def clip_mesh_to_box(vertices: np.ndarray, faces: np.ndarray, box_min,
                     box_max, keep_inside: bool = True):
    """Exact mesh ∩ box (keep_inside) or mesh − box (keep_inside=False).

    Triangles straddling a box plane are clipped at the plane and
    retriangulated (``csg_operation.cc:216-221`` semantics for the cube
    tool, minus surface caps). Fully-inside/outside triangles pass through
    untouched; only straddlers pay the exact-clip path.
    """
    box_min = np.asarray(box_min, np.float64)
    box_max = np.asarray(box_max, np.float64)
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    v_in = np.all((vertices >= box_min) & (vertices <= box_max), axis=1)
    tri_all_in = v_in[faces].all(1)
    tri_any_in_box_bbox = ~(
        (vertices[faces].max(1) < box_min).any(1)
        | (vertices[faces].min(1) > box_max).any(1))
    straddle = tri_any_in_box_bbox & ~tri_all_in
    trivial_keep = tri_all_in if keep_inside else ~tri_any_in_box_bbox
    kept_v, kept_f = _compact_mesh(vertices, faces[trivial_keep])

    new_polys = []
    for tri_idx in np.nonzero(straddle)[0]:
        tri = vertices[faces[tri_idx]].astype(np.float64)
        new_polys.extend(_clip_triangle_box(tri, box_min, box_max,
                                            keep_inside))
    nv, nf = _triangulate_fan(new_polys, vertices.dtype)
    out_v = np.concatenate([kept_v, nv], 0) if len(nv) else kept_v
    out_f = (np.concatenate([kept_f, nf + len(kept_v)], 0)
             if len(nf) else kept_f)
    return _dedup_vertices(out_v, out_f)


def _box_mesh(box_min, box_max, dtype=np.float32):
    bmin = np.asarray(box_min, np.float64)
    bmax = np.asarray(box_max, np.float64)
    corners = np.asarray([[bmin[0], bmin[1], bmin[2]],
                          [bmax[0], bmin[1], bmin[2]],
                          [bmax[0], bmax[1], bmin[2]],
                          [bmin[0], bmax[1], bmin[2]],
                          [bmin[0], bmin[1], bmax[2]],
                          [bmax[0], bmin[1], bmax[2]],
                          [bmax[0], bmax[1], bmax[2]],
                          [bmin[0], bmax[1], bmax[2]]], dtype)
    quads = [(0, 3, 2, 1), (4, 5, 6, 7), (0, 1, 5, 4),
             (2, 3, 7, 6), (1, 2, 6, 5), (3, 0, 4, 7)]  # outward CCW
    faces = []
    for a, b, c, d in quads:
        faces.append((a, b, c))
        faces.append((a, c, d))
    return corners, np.asarray(faces, np.int32)


def csg_box(vertices: np.ndarray, faces: np.ndarray, box_min, box_max,
            operation: str = "difference"):
    """CSG of a mesh with an axis-aligned box (the GUI cube tool,
    ``csg_operation.cc:214-221``).

    - ``intersection``: exact mesh ∩ box (clipped at the box surface).
    - ``difference``:   exact mesh − box.
    - ``union``:        mesh − box plus the box's own surface (box-face
      regions lying inside the mesh volume are not trimmed — without
      watertight-volume classification they are hidden interior surface,
      harmless to the depth renderer this feeds).
    """
    if operation == "intersection":
        return clip_mesh_to_box(vertices, faces, box_min, box_max, True)
    if operation == "difference":
        return clip_mesh_to_box(vertices, faces, box_min, box_max, False)
    if operation == "union":
        v, f = clip_mesh_to_box(vertices, faces, box_min, box_max, False)
        bv, bf = _box_mesh(box_min, box_max, vertices.dtype)
        return (np.concatenate([v, bv], 0),
                np.concatenate([f, bf + len(v)], 0))
    raise ValueError(f"unknown CSG operation: {operation}")


def crop_mesh_to_box(vertices: np.ndarray, faces: np.ndarray, box_min,
                     box_max, keep_inside: bool = True):
    """Back-compat alias of :func:`clip_mesh_to_box` (now exact)."""
    return clip_mesh_to_box(vertices, faces, box_min, box_max, keep_inside)
