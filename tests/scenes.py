"""Shared synthetic scene builders for tests (not collected by pytest)."""

import numpy as np

import jax.numpy as jnp

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.ops.splat import (
    fill_color_from_depth,
    flood_fill_colors,
    render_points_depth_color,
)
from dataset_pipeline_tpu.photometric.multiscale import build_multiscale_cloud
from dataset_pipeline_tpu.photometric.problem import (
    ImageGroup,
    PhotoProblem,
    build_image_pyramid,
    build_photo_level,
)


def plane_texture(x, y):
    """Smooth analytic texture on the z=0 plane (units: intensity 0..252)."""
    t = (128.0
         + 45.0 * np.sin(2.3 * x + 0.7) * np.cos(2.1 * y + 0.3)
         + 35.0 * np.sin(5.1 * x + 1.3 * y + 0.5)
         + 20.0 * np.cos(3.7 * y - 2.9 * x))
    return np.clip(t, 2.0, 250.0)


QUAD_A, QUAD_B = 0.15, 0.25  # elliptic paraboloid coefficients (a != b:
# no continuous symmetry, so depth-only residuals constrain all 6 dof)


def quad_height(x, y, a=QUAD_A, b=QUAD_B):
    return a * (x - 1.0) ** 2 + b * (y - 1.0) ** 2


def render_surface_image(R, t, W, H, f, cx, cy, with_depth=False,
                         a=QUAD_A, b=QUAD_B):
    """EXACT pinhole render of the textured surface z = a(x-1)^2 + b(y-1)^2:
    per-pixel closed-form ray-quadric intersection + analytic texture (the
    counterpart of the reference 4-frame test's GL-rendered heightmap,
    ``opt/test/test_alignment.cc:87-545`` — but noise-free, so the 1.6e-3
    se3-log bound is attributable to the optimizer, not the fixture
    renderer)."""
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    d_cam = np.stack([(u - cx) / f, (v - cy) / f, np.ones_like(u)], -1)
    d = d_cam @ R  # world-frame ray directions R^T d_cam
    o = -R.T @ t  # camera center in world
    ux, uy = o[0] - 1.0, o[1] - 1.0
    A = a * d[..., 0] ** 2 + b * d[..., 1] ** 2
    B = 2 * a * ux * d[..., 0] + 2 * b * uy * d[..., 1] - d[..., 2]
    C = a * ux * ux + b * uy * uy - o[2]
    disc = np.maximum(B * B - 4 * A * C, 0.0)
    sq = np.sqrt(disc)
    with np.errstate(divide="ignore", invalid="ignore"):
        s1 = (-B - sq) / (2 * A)
        s2 = (-B + sq) / (2 * A)
        s_lin = -C / B  # A ~ 0: ray grazes the quadric axis directions
    s = np.where(np.abs(A) < 1e-14, s_lin, np.where(s1 > 0, s1, s2))
    s = np.maximum(s, 0.0)
    px = o[0] + s * d[..., 0]
    py = o[1] + s * d[..., 1]
    img = plane_texture(px, py).astype(np.float32)
    if not with_depth:
        return img
    pz_world = quad_height(px, py, a, b)
    z_cam = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz_world + t[2]
    return img, z_cam.astype(np.float32)


def surface_cloud(n, extent=2.0, lo=0.0, a=QUAD_A, b=QUAD_B):
    """Grid sampling of the textured surface with uint8 colors."""
    xs = np.linspace(lo, lo + extent, n)
    gx, gy = np.meshgrid(xs, xs)
    gz = quad_height(gx, gy, a, b)
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1).astype(np.float32)
    tex = plane_texture(gx, gy).ravel()
    cols = np.stack([np.round(tex)] * 3, -1).astype(np.uint8)
    return pts, cols


# ---------------------------------------------------------------------------
# Random triangulated heightfield (the reference 4-frame fixture's geometry:
# ``opt/test/test_alignment.cc:104-132`` builds a 61x61 vertex grid with
# uniform random z variation).  Rendered EXACTLY by ray-triangle
# intersection, so GT depth maps carry no rasterization error.  The rough
# per-triangle slopes make depth-only residuals well-conditioned (a smooth
# analytic surface has near-nullspace camera motions for depth).
# ---------------------------------------------------------------------------


def heightfield_grid(nv=61, var=0.03, seed=7):
    rng = np.random.RandomState(seed)
    return rng.uniform(-var, var, (nv, nv))


def heightfield_triangles(z, extent=2.0, lo=0.0):
    nv = z.shape[0]
    xs = np.linspace(lo, lo + extent, nv)
    X, Y = np.meshgrid(xs, xs)
    V = np.stack([X, Y, z], -1)  # (nv, nv, 3); first index is y
    v00, v01 = V[:-1, :-1], V[:-1, 1:]
    v10, v11 = V[1:, :-1], V[1:, 1:]
    triA = np.stack([v00, v01, v10], -2).reshape(-1, 3, 3)
    triB = np.stack([v11, v10, v01], -2).reshape(-1, 3, 3)
    return np.concatenate([triA, triB]).astype(np.float64)


def render_heightfield(tris, R, t, W, H, f, cx, cy, chunk=128):
    """(intensity, z_cam depth) by exact Moller-Trumbore over all triangles;
    intensity = analytic ``plane_texture`` at the hit point."""
    o = -R.T @ t
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    D = (np.stack([(u - cx) / f, (v - cy) / f, np.ones_like(u)], -1)
         .reshape(-1, 3) @ R)  # world-frame directions
    n_rays = D.shape[0]
    tmin = np.full(n_rays, np.inf)
    for c0 in range(0, len(tris), chunk):
        T = tris[c0:c0 + chunk]
        v0 = T[:, 0]
        e1 = T[:, 1] - T[:, 0]
        e2 = T[:, 2] - T[:, 0]
        h = np.cross(D[:, None, :], e2[None, :, :])  # (N, T, 3)
        a = np.einsum("tk,ntk->nt", e1, h)
        with np.errstate(divide="ignore", invalid="ignore"):
            fa = np.where(np.abs(a) < 1e-14, np.nan, a)
            s = o - v0  # (T, 3)
            uu = np.einsum("tk,ntk->nt", s, h) / fa
            q = np.cross(s, e1)  # (T, 3)
            vv = np.einsum("nk,tk->nt", D, q) / fa
            tt = np.einsum("tk,tk->t", e2, q)[None, :] / fa
        ok = ((uu >= -1e-9) & (vv >= -1e-9) & (uu + vv <= 1 + 1e-9)
              & (tt > 1e-6))
        tt = np.where(ok, tt, np.inf)
        tmin = np.minimum(tmin, tt.min(1))
    hit = o[None, :] + tmin[:, None] * D
    img = plane_texture(hit[:, 0], hit[:, 1]).reshape(H, W).astype(np.float32)
    z_cam = (hit @ R[2] + t[2]).reshape(H, W).astype(np.float32)
    return img, z_cam


def heightfield_cloud(z, n, extent=2.0, lo=0.0):
    """Exact surface samples of the piecewise-linear heightfield (triangle
    split matching ``heightfield_triangles``) with uint8 texture colors."""
    nv = z.shape[0]
    cell = extent / (nv - 1)
    xs = np.linspace(lo, lo + extent - 1e-6, n)
    X, Y = np.meshgrid(xs, xs)
    gx, gy = (X - lo) / cell, (Y - lo) / cell
    j = np.minimum(gx.astype(int), nv - 2)
    i = np.minimum(gy.astype(int), nv - 2)
    u, v = gx - j, gy - i
    z00, z01 = z[i, j], z[i, j + 1]
    z10, z11 = z[i + 1, j], z[i + 1, j + 1]
    zA = z00 + u * (z01 - z00) + v * (z10 - z00)
    zB = z11 + (1 - u) * (z10 - z11) + (1 - v) * (z01 - z11)
    Z = np.where(u + v <= 1.0, zA, zB)
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)
    tex = plane_texture(X, Y).ravel()
    cols = np.stack([np.round(tex)] * 3, -1).astype(np.uint8)
    return pts, cols


def synthetic_two_frame_problem():
    """Small rendered scene: textured height field seen from two poses."""
    W, H = 160, 120
    rng = np.random.RandomState(11)
    n = 120
    xs = np.linspace(0, 2, n)
    gx, gy = np.meshgrid(xs, xs)
    gz = 0.1 * np.sin(3 * gx) * np.cos(2.5 * gy)
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1).astype(np.float32)
    tex = (128 + 60 * np.sin(7 * gx) * np.cos(9 * gy)).clip(0, 252)
    cols = np.stack([tex.ravel()] * 3, -1).astype(np.uint8)
    f, cx, cy = 140.0, 79.5, 59.5
    cam = cm.make_camera("PINHOLE", W, H, [f, f, cx, cy])

    def look_at(eye):
        target = np.asarray([1.0, 1.0, 0.0])
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        r = np.cross(fwd, [0.0, 1.0, 0.0])
        r = r / np.linalg.norm(r)
        d = np.cross(fwd, r)
        R = np.stack([r, d, fwd])
        return R, -R @ eye

    mats, imgs = [], []
    for eye in ([1.0, 1.0, -2.2], [1.25, 1.05, -2.15]):
        R, t = look_at(np.asarray(eye))
        p_cam = pts @ R.T + t
        d, c = render_points_depth_color(jnp.asarray(p_cam), jnp.asarray(cols),
                                         W, H, f, f, cx, cy)
        cf, v = fill_color_from_depth(d, c)
        img = np.asarray(flood_fill_colors(cf, v))[..., 0]
        m = np.eye(4, dtype=np.float32)
        m[:3, :3], m[:3, 3] = R, t
        mats.append(m)
        imgs.append(img)

    poses = SE3.from_matrix(jnp.asarray(np.stack(mats), jnp.float32))
    scale_count = 2
    pyr = build_image_pyramid(np.stack(imgs), scale_count)
    levels_raw = build_multiscale_cloud(pts, cols, np.zeros(len(pts), np.uint8),
                                        poses, cam, scale_count)
    levels = [pl for i, lv in enumerate(levels_raw)
              if (pl := build_photo_level(lv, seed=i)) is not None]
    group = ImageGroup(camera=cam, pyramid=pyr, poses=poses, image_ids=[0, 1])
    problem = PhotoProblem(
        groups=[group], levels=levels,
        occlusion_points=jnp.asarray(pts), occlusion_radius=0.03,
        scale_count=scale_count,
    )
    return problem
