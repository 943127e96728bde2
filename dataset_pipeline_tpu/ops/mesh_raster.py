"""Triangle-mesh depth rasterization with occlusion-boundary edge splatting.

TPU-native counterpart of the reference's OpenGL occlusion-mesh path
(``opt/occlusion_geometry.cc`` + ``opengl/renderer.cc``):

- vertices are projected through the FULL camera distortion model (the GL
  renderer distorts at the vertex level, ``renderer.cc:90-111`` — hence the
  requirement that occlusion meshes be strongly subdivided, ``README.md:720``);
- triangles are filled by a fixed-footprint scatter-min pass: each triangle
  rasterizes its screen bbox up to KxK pixels with barycentric inside tests
  and perspective-correct 1/z interpolation (two K tiers; larger triangles
  are counted and dropped, matching the subdivision requirement);
- background is 0 (the GL clear value) — consumers' z-test
  ``z <= depth + thresh`` therefore treats uncovered regions as occluded;
- occlusion-boundary masking (``MaskOutOcclusionBoundaries``, ``.cc:284-402``):
  mesh edges precomputed with their (<=2 outermost) adjacent face normals;
  at render time, silhouette edges (one face toward the camera, one away,
  winding-corrected) stamp splats of ``splat_radius`` along their length,
  setting nearby background/behind pixels to -1 so points there count as
  occluded.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3


class OcclusionMesh(NamedTuple):
    vertices: jnp.ndarray  # (V,3) float32
    faces: jnp.ndarray  # (F,3) int32
    face_normals: jnp.ndarray  # (F,3) float32 (unnormalized winding normals, normalized)
    edges: jnp.ndarray  # (E,2) int32 vertex indices
    edge_faces: jnp.ndarray  # (E,2) int32, second = -1 for boundary edges
    edge_opposite: jnp.ndarray  # (E,) bool: the two faces have opposite winding


def build_occlusion_mesh(vertices: np.ndarray, faces: np.ndarray) -> OcclusionMesh:
    """Host-side edge/face-normal precomputation
    (``ComputeEdgeNormalsList``/``FilterEdgeList``, ``.cc:466-645``)."""
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int64)
    v = vertices[faces]  # (F,3,3)
    fn = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    norm = np.linalg.norm(fn, axis=1, keepdims=True)
    fn = fn / np.maximum(norm, 1e-30)

    # half edges: (min_v, max_v, face, swapped)
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    face_of = np.tile(np.arange(len(faces)), 3)
    swapped = e[:, 0] > e[:, 1]
    e_sorted = np.sort(e, axis=1)
    key = e_sorted[:, 0] * (vertices.shape[0] + 1) + e_sorted[:, 1]
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, starts, counts = np.unique(key_s, return_index=True, return_counts=True)

    E = len(uniq)
    edges = np.zeros((E, 2), np.int32)
    edge_faces = np.full((E, 2), -1, np.int32)
    edge_opp = np.zeros(E, bool)
    keep = np.ones(E, bool)

    e_sorted_s = e_sorted[order]
    face_s = face_of[order]
    swap_s = swapped[order]

    # vectorized fill for the manifold cases (1 or 2 faces)
    edges[:, 0] = e_sorted_s[starts, 0]
    edges[:, 1] = e_sorted_s[starts, 1]
    edge_faces[:, 0] = face_s[starts]
    two = counts >= 2
    edge_faces[two, 1] = face_s[starts[two] + 1]
    f1_sign = np.where(swap_s[starts], -1.0, 1.0)
    f2_sign = np.where(two, np.where(swap_s[np.minimum(starts + 1, len(face_s) - 1)], -1.0, 1.0), 1.0)
    edge_opp[two] = (f1_sign[two] * f2_sign[two]) > 0

    # coplanar opposite-normal pairs are dropped (surface is a plane there)
    if two.any():
        i2 = np.nonzero(two)[0]
        n1 = fn[edge_faces[i2, 0]] * f1_sign[i2, None]
        n2 = fn[edge_faces[i2, 1]] * f2_sign[i2, None]
        dots = (n1 * n2).sum(1)
        planar = dots < -1.0 + 1e-6
        keep[i2[planar]] = False

    # non-manifold edges (>2 faces): keep the 2 outermost faces in the
    # hemisphere spanned around the edge; drop if not in one hemisphere
    nm = np.nonzero(counts > 2)[0]
    for idx in nm:
        s0 = starts[idx]
        c = counts[idx]
        f_ids = face_s[s0 : s0 + c]
        signs = np.where(swap_s[s0 : s0 + c], -1.0, 1.0)
        normals = fn[f_ids] * signs[:, None]
        v1, v2 = edges[idx]
        edge_vec = vertices[v2] - vertices[v1]
        base_x = normals[0] / max(np.linalg.norm(normals[0]), 1e-30)
        base_y = np.cross(base_x, edge_vec)
        base_y /= max(np.linalg.norm(base_y), 1e-30)
        pts2 = np.stack([normals @ base_x, normals @ base_y], -1)
        a_i, b_i = 0, 1
        a, b = pts2[0], pts2[1]
        ok = True
        for j in range(2, c):
            n3 = pts2[j]
            cab = a[0] * b[1] - a[1] * b[0]
            ca3 = a[0] * n3[1] - a[1] * n3[0]
            cb3 = b[0] * n3[1] - b[1] * n3[0]
            same_a = (ca3 >= 0) == (cab >= 0)
            same_b = (cb3 >= 0) == (-cab >= 0)
            if same_a and same_b:
                continue  # n3 between a and b
            elif same_a:
                b, b_i = n3, j
            elif same_b:
                a, a_i = n3, j
            else:
                ok = False
                break
        if not ok:
            keep[idx] = False
            continue
        edge_faces[idx, 0] = f_ids[a_i]
        edge_faces[idx, 1] = f_ids[b_i]
        edge_opp[idx] = signs[a_i] * signs[b_i] > 0

    edges, edge_faces, edge_opp = edges[keep], edge_faces[keep], edge_opp[keep]
    return OcclusionMesh(
        jnp.asarray(vertices), jnp.asarray(faces.astype(np.int32)),
        jnp.asarray(fn.astype(np.float32)), jnp.asarray(edges),
        jnp.asarray(edge_faces), jnp.asarray(edge_opp),
    )


@partial(jax.jit, static_argnames=("width", "height", "tile"))
def _raster_tier(pix, z, tri_valid, faces, width: int, height: int, tile: int,
                 depth_flat):
    """Rasterize triangles whose bbox fits in ``tile`` pixels."""
    p = pix[faces]  # (F,3,2)
    zf = z[faces]  # (F,3)
    lo = jnp.floor(jnp.min(p, axis=1))  # (F,2)
    hi = jnp.ceil(jnp.max(p, axis=1))
    extent = hi - lo + 1.0
    fits = tri_valid & (extent[:, 0] <= tile) & (extent[:, 1] <= tile)

    a, b, c = p[:, 0], p[:, 1], p[:, 2]
    area = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    good = fits & (jnp.abs(area) > 1e-12)
    inv_area = jnp.where(good, 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area), 0.0)
    inv_z = 1.0 / jnp.maximum(zf, 1e-12)  # (F,3)

    lo_i = lo.astype(jnp.int32)

    def body(k, depth_flat):
        dy = k // tile
        dx = k % tile
        px = lo_i[:, 0] + dx
        py = lo_i[:, 1] + dy
        fx = px.astype(jnp.float32)
        fy = py.astype(jnp.float32)
        w0 = ((b[:, 0] - fx) * (c[:, 1] - fy) - (b[:, 1] - fy) * (c[:, 0] - fx)) * inv_area
        w1 = ((c[:, 0] - fx) * (a[:, 1] - fy) - (c[:, 1] - fy) * (a[:, 0] - fx)) * inv_area
        w2 = 1.0 - w0 - w1
        inside = good & (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        iz = w0 * inv_z[:, 0] + w1 * inv_z[:, 1] + w2 * inv_z[:, 2]
        zpix = 1.0 / jnp.maximum(iz, 1e-12)
        ok = inside & (px >= 0) & (py >= 0) & (px < width) & (py < height)
        flat = jnp.where(ok, py * width + px, -1)
        return depth_flat.at[flat].min(jnp.where(ok, zpix, jnp.inf), mode="drop")

    depth_flat = jax.lax.fori_loop(0, tile * tile, body, depth_flat)
    return depth_flat, fits


@partial(jax.jit, static_argnames=("width", "height", "num_samples", "max_radius_px"))
def _edge_splat_pass(mesh: OcclusionMesh, camera: cm.Camera, pose_q, pose_t,
                     depth, width: int, height: int, splat_radius,
                     num_samples: int = 8, max_radius_px: int = 4):
    """Mark occlusion-boundary neighborhoods with -1 (``.cc:284-402``)."""
    pose = SE3(pose_q, pose_t)
    cam_pos = pose.inverse().t  # camera position in global frame

    ep1 = mesh.vertices[mesh.edges[:, 0]]
    ep2 = mesh.vertices[mesh.edges[:, 1]]
    f1 = mesh.edge_faces[:, 0]
    f2 = mesh.edge_faces[:, 1]
    boundary = f2 < 0
    to_img = cam_pos[None, :] - ep1
    d1 = jnp.sum(mesh.face_normals[f1] * to_img, -1) > 0
    d2 = jnp.sum(mesh.face_normals[jnp.maximum(f2, 0)] * to_img, -1) > 0
    silhouette = boundary | (
        (mesh.edge_opposite & (d1 == d2)) | (~mesh.edge_opposite & (d1 != d2))
    )

    c1 = pose.apply(ep1)
    c2 = pose.apply(ep2)
    active = silhouette & (c1[:, 2] > 0) & (c2[:, 2] > 0)
    delta = c2 - c1
    length = jnp.linalg.norm(delta, axis=-1)
    count = 1 + jnp.minimum(
        jnp.floor(length / splat_radius + 0.5), float(num_samples - 1)
    )

    kthresh = 0.05
    depth_flat = depth.reshape(-1)
    side = 2 * max_radius_px + 1

    def sample_body(i, mark):
        factor = i / jnp.maximum(count - 1.0, 1.0)
        use = active & (i < count)
        pt = c1 + factor[:, None] * delta  # (E,3)
        pix, valid = cm.project(camera, pt)
        zc = pt[:, 2]
        ix = jnp.floor(pix[:, 0] + 0.5).astype(jnp.int32)
        iy = jnp.floor(pix[:, 1] + 0.5).astype(jnp.int32)
        inside = use & valid & (ix >= 0) & (iy >= 0) & (ix < width) & (iy < height)
        center = depth_flat[jnp.clip(iy, 0, height - 1) * width + jnp.clip(ix, 0, width - 1)]
        visible = inside & (center + kthresh >= zc)
        # pixel radius from the projection footprint
        eps = 1e-3 * jnp.maximum(zc, 1e-6)
        pix2, _ = cm.project(
            camera, pt + jnp.stack([eps, jnp.zeros_like(eps), jnp.zeros_like(eps)], -1))
        px_per_m = jnp.linalg.norm(pix2 - pix, axis=-1) / eps
        r_px = jnp.clip(splat_radius * px_per_m, 0.0, float(max_radius_px))

        def offset_body(k, mark):
            dy = k // side - max_radius_px
            dx = k % side - max_radius_px
            hit = visible & (jnp.maximum(jnp.abs(dx), jnp.abs(dy)) <= jnp.ceil(r_px))
            jx, jy = ix + dx, iy + dy
            okp = hit & (jx >= 0) & (jy >= 0) & (jx < width) & (jy < height)
            flat = jnp.where(okp, jy * width + jx, -1)
            old = depth_flat[jnp.clip(flat, 0, depth_flat.shape[0] - 1)]
            should = okp & ((old == 0) | (old + kthresh > zc))
            # padding index must be OUT OF RANGE (N), not -1: jnp ``.at``
            # wraps negative indices before the drop-mode bounds check
            return mark.at[jnp.where(should, flat, mark.shape[0])].set(
                True, mode="drop")

        return jax.lax.fori_loop(0, side * side, offset_body, mark)

    mark = jax.lax.fori_loop(
        0, num_samples, sample_body, jnp.zeros_like(depth_flat, dtype=bool)
    )
    depth_flat = jnp.where(mark, -1.0, depth_flat)
    return depth_flat.reshape(height, width)


def render_occlusion_mesh_depth_batch(camera: cm.Camera, pose_q, pose_t,
                                      mesh: OcclusionMesh,
                                      splat_radius: float = 0.03,
                                      min_depth: float = 0.05,
                                      max_depth: float = 100.0,
                                      edge_splats: bool = True):
    """(B,H,W) occlusion depths for a chunk of poses in ONE dispatch.

    vmapped counterpart of :func:`render_occlusion_mesh_depth` — the
    reference renders images one by one under ``omp critical``
    (``opt/occlusion_geometry.cc:211-245``); here the image axis is batched
    like every other per-image kernel (and is the mesh-sharding axis)."""
    fn = lambda q, t: render_occlusion_mesh_depth(
        camera, SE3(q, t), mesh, splat_radius=splat_radius,
        min_depth=min_depth, max_depth=max_depth, edge_splats=edge_splats)
    return jax.vmap(fn)(pose_q, pose_t)


@partial(jax.jit, static_argnames=("width", "height", "tile"))
def _raster_color_tier(pix, z, tri_valid, faces, vert_cols, width: int,
                       height: int, tile: int, depth_ref, color_flat):
    """Second pass: write perspective-correct interpolated vertex colors at
    pixels whose first-pass depth this triangle produced (``renderer.h:319-321``
    color readback counterpart)."""
    p = pix[faces]
    zf = z[faces]
    cf = vert_cols[faces]  # (F,3,3)
    lo = jnp.floor(jnp.min(p, axis=1))
    hi = jnp.ceil(jnp.max(p, axis=1))
    extent = hi - lo + 1.0
    fits = tri_valid & (extent[:, 0] <= tile) & (extent[:, 1] <= tile)

    a, b, c = p[:, 0], p[:, 1], p[:, 2]
    area = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    good = fits & (jnp.abs(area) > 1e-12)
    inv_area = jnp.where(good, 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area), 0.0)
    inv_z = 1.0 / jnp.maximum(zf, 1e-12)

    lo_i = lo.astype(jnp.int32)
    depth_flat = depth_ref.reshape(-1)

    def body(k, color_flat):
        dy = k // tile
        dx = k % tile
        px = lo_i[:, 0] + dx
        py = lo_i[:, 1] + dy
        fx = px.astype(jnp.float32)
        fy = py.astype(jnp.float32)
        w0 = ((b[:, 0] - fx) * (c[:, 1] - fy) - (b[:, 1] - fy) * (c[:, 0] - fx)) * inv_area
        w1 = ((c[:, 0] - fx) * (a[:, 1] - fy) - (c[:, 1] - fy) * (a[:, 0] - fx)) * inv_area
        w2 = 1.0 - w0 - w1
        inside = good & (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        iz = w0 * inv_z[:, 0] + w1 * inv_z[:, 1] + w2 * inv_z[:, 2]
        zpix = 1.0 / jnp.maximum(iz, 1e-12)
        ok = inside & (px >= 0) & (py >= 0) & (px < width) & (py < height)
        flat = jnp.where(ok, py * width + px, -1)
        dwin = depth_flat[jnp.clip(flat, 0, depth_flat.shape[0] - 1)]
        # NOTE: with coplanar/coincident triangles several faces can fall
        # within the tolerance and the colliding .at[].set is last-write
        # nondeterministic — acceptable for this visualization output; a
        # deterministic variant would scatter-min a packed (depth, face-id)
        # key and gather colors by winning face (see ops/splat.py).
        winner = ok & jnp.isfinite(dwin) & (
            jnp.abs(zpix - dwin) <= 1e-4 * jnp.maximum(dwin, 1e-6))
        # perspective-correct color: interpolate c/z and 1/z
        col = (w0[:, None] * cf[:, 0] * inv_z[:, 0:1]
               + w1[:, None] * cf[:, 1] * inv_z[:, 1:2]
               + w2[:, None] * cf[:, 2] * inv_z[:, 2:3]) * zpix[:, None]
        # out-of-range padding index (negative would WRAP to the last pixel)
        return color_flat.at[jnp.where(winner, flat, color_flat.shape[0])].set(
            col, mode="drop")

    return jax.lax.fori_loop(0, tile * tile, body, color_flat)


def render_mesh_depth_color(camera: cm.Camera, pose: SE3, mesh: OcclusionMesh,
                            vertex_colors, min_depth: float = 0.05,
                            max_depth: float = 100.0):
    """(depth (H,W), color (H,W,3) float) — the TPU counterpart of the GL
    renderer's joint depth+color render-and-readback
    (``opengl/renderer.h:292-321``). Color is perspective-correct
    barycentric-interpolated vertex color of the depth-winning triangle;
    background pixels are 0."""
    width, height = camera.width, camera.height
    p_cam = pose.apply(mesh.vertices)
    pix, valid = cm.project(camera, p_cam)
    z = p_cam[:, 2]
    vert_ok = valid & (z >= min_depth) & (z <= max_depth)
    tri_valid = jnp.all(vert_ok[mesh.faces], -1)

    depth_flat = jnp.full((height * width,), jnp.inf, jnp.float32)
    remaining = tri_valid
    for tile in (8, 32):
        depth_flat, done = _raster_tier(pix, z, remaining, mesh.faces,
                                        width, height, tile, depth_flat)
        remaining = remaining & ~done
    color_flat = jnp.zeros((height * width, 3), jnp.float32)
    remaining = tri_valid
    cols = jnp.asarray(vertex_colors, jnp.float32)
    for tile in (8, 32):
        color_flat = _raster_color_tier(pix, z, remaining, mesh.faces, cols,
                                        width, height, tile, depth_flat,
                                        color_flat)
        p = pix[mesh.faces]
        extent = (jnp.ceil(jnp.max(p, axis=1)) - jnp.floor(jnp.min(p, axis=1)) + 1.0)
        done = remaining & (extent[:, 0] <= tile) & (extent[:, 1] <= tile)
        remaining = remaining & ~done
    depth = depth_flat.reshape(height, width)
    depth = jnp.where(jnp.isinf(depth), 0.0, depth)
    return depth, color_flat.reshape(height, width, 3)


def render_occlusion_mesh_depth(camera: cm.Camera, pose: SE3, mesh: OcclusionMesh,
                                splat_radius: float = 0.03,
                                min_depth: float = 0.05, max_depth: float = 100.0,
                                edge_splats: bool = True):
    """Full mesh occlusion depth: rasterize + boundary masking.

    Returns (H,W) float32: view z where covered, 0 for background, -1 near
    occlusion boundaries. Triangles projecting larger than the biggest tile
    are dropped (the mesh must be subdivided, as with the reference's
    vertex-distorting GL renderer).
    """
    width, height = camera.width, camera.height
    p_cam = pose.apply(mesh.vertices)
    pix, valid = cm.project(camera, p_cam)
    z = p_cam[:, 2]
    vert_ok = valid & (z >= min_depth) & (z <= max_depth)
    tri_valid = jnp.all(vert_ok[mesh.faces], -1)

    depth_flat = jnp.full((height * width,), jnp.inf, jnp.float32)
    remaining = tri_valid
    for tile in (8, 32):
        depth_flat, done = _raster_tier(pix, z, remaining, mesh.faces,
                                        width, height, tile, depth_flat)
        remaining = remaining & ~done
    depth = depth_flat.reshape(height, width)
    depth = jnp.where(jnp.isinf(depth), 0.0, depth)  # GL background convention
    if edge_splats:
        depth = _edge_splat_pass(mesh, camera, pose.q, pose.t, depth,
                                 width, height, jnp.asarray(splat_radius, jnp.float32))
    return depth
