"""Production joint multi-scene scan+image BA: device-side row production.

The round-3 joint BA materialized the full dense ``(R, n_keep + 6m)`` row
matrix in host numpy and sharded *that*; this module is the production
system:

- **Rows are produced on-device inside ``shard_map``**: images are sharded
  over the mesh; each device computes its images' photometric descriptor
  rows (visibility-gated, footprint-scaled — the same gating the
  single-scene optimizer applies, ``opt/visibility_estimator.cc:276-294,
  405-532``) and its shard of the symmetric point-to-plane ICP rows, and
  accumulates ONLY the block-sparse normal-equation pieces:
  ``Hkk (n_keep, n_keep)`` for the kept block (shared intrinsics + free
  scan poses), per-image ``Hki (n_keep, 6)`` / ``Hii (6, 6)``. Nothing of
  size rows x n_vars ever exists anywhere — host and device memory are
  FLAT in the row count.
- **The Schur complement is reduced distributively**: each device folds its
  images' ``W_i = Hki_i Hii_i^-1`` terms into a partial
  ``S = Hkk - sum_i W_i Hki_i^T``; one ``psum`` makes S/rhs global, the
  tiny reduced system solves replicated, and the per-image
  back-substitution stays local to the image's owner.
- **An LM accept/reject driver** (diag*(1+lambda) damping, frozen-
  visibility accept test, halve/double with 10 tries, force-apply the
  last — ``opt/intrinsics_and_pose_optimizer.cc:197-258`` semantics) wraps
  the step; ``tools/joint_ba.py`` exposes it over N scenes.

Variable layout (``CountAndIndexVariables``, ``.cc:442-473``):
``[shared intrinsics P | 6 per free scan (scene-major, first scan of each
scene gauge-fixed) | 6 per image (eliminated via Schur)]``. The reference
names Schur elimination as its own future work (``.cc:70-73,217``).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3, quat_rotate
from dataset_pipeline_tpu.ops.robust import DEFAULT_COLOR_HUBER, huber_rho
from dataset_pipeline_tpu.ops.splat import render_splats_depth
from dataset_pipeline_tpu.photometric.optimizer import (
    _gram_assemble,
    _project_full,
    _sample_pyramid,
    _sample_pyramid_with_derivs,
)

HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Packed problem (host -> device once)
# ---------------------------------------------------------------------------


@dataclass
class JointBAPack:
    """Device-resident joint problem. Scene geometry is replicated (small);
    per-image arrays, image poses and ICP correspondences are sharded."""

    mesh: Mesh
    camera: cm.Camera
    n_scenes: int
    n_images: int           # real image count (m)
    m_pad: int              # padded to a mesh multiple
    s_max: int              # max scans per scene
    n_int: int              # optimized intrinsics params (0 = fixed)
    n_free: int             # free scan blocks (gauge-fixed excluded)
    scale_count: int
    occl_downscale: int
    # replicated scene geometry, padded to N_max points
    scene_points: jnp.ndarray      # (n_scenes, N_max, 3) scan-local-in-global
    scene_scan_idx: jnp.ndarray    # (n_scenes, N_max) int32
    scene_neighbors: jnp.ndarray   # (n_scenes, N_max, K) int32
    scene_desc: jnp.ndarray        # (n_scenes, N_max, K) f32
    scene_valid: jnp.ndarray       # (n_scenes, N_max) bool
    scene_radius: jnp.ndarray      # (n_scenes, N_max) PER-POINT footprint
                                   # radii (multi-resolution levels concat)
    scan_col: jnp.ndarray          # (n_scenes, s_max) free-block id or -1
    expand: jnp.ndarray            # (n_scenes, Dk, n_keep) block expansion
    # per-image (sharded over all mesh axes)
    img_scene: jnp.ndarray         # (m_pad,) int32
    img_valid: jnp.ndarray         # (m_pad,) bool
    pose_q0: jnp.ndarray           # (m_pad, 4) initial poses
    pose_t0: jnp.ndarray           # (m_pad, 3)
    pyramids: List[jnp.ndarray]    # per level (m_pad, H_l, W_l) f32
    # ICP correspondences (sharded), scan-local-in-global endpoints
    icp_ps: jnp.ndarray            # (M_pad, 3)
    icp_ns: jnp.ndarray
    icp_pt: jnp.ndarray
    icp_nt: jnp.ndarray
    icp_w: jnp.ndarray             # (M_pad,) 0 = padding
    icp_scene: jnp.ndarray         # (M_pad,) int32
    icp_src_s: jnp.ndarray         # (M_pad,) scan index within its scene
    icp_tgt_s: jnp.ndarray
    # host-side bookkeeping
    scan_col_np: np.ndarray
    occlusion_radius: float
    occlusion_depth_threshold: float
    n_icp: int
    # original per-row ICP weights (never mutated): correspondence refresh
    # derives its candidate set from these, so rows zeroed by a transient
    # pose excursion can re-match later (the reference re-finds ALL
    # correspondences every outer iteration, icp_point_to_plane.cc:208-309)
    icp_w0_np: Optional[np.ndarray] = None

    @property
    def n_keep(self) -> int:
        return self.n_int + 6 * self.n_free

    @property
    def dk(self) -> int:
        return self.n_int + 6 * self.s_max


def make_state(pack: JointBAPack) -> dict:
    """Initial optimization state: current intrinsics, identity per-scan
    corrections (replicated), packed image poses (sharded)."""
    return {
        "params": jnp.asarray(pack.camera.params, jnp.float32),
        "corr_q": jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                           (pack.n_scenes, pack.s_max, 1)),
        "corr_t": jnp.zeros((pack.n_scenes, pack.s_max, 3), jnp.float32),
        "pose_q": pack.pose_q0,
        "pose_t": pack.pose_t0,
    }


def pack_scenes(mesh: Mesh, scenes, optimize_intrinsics: bool = True,
                occl_downscale: int = 2,
                occlusion_radius: float = 0.03,
                occlusion_depth_threshold: float = 0.01,
                all_levels: bool = True) -> JointBAPack:
    """Pack a list of ``JointScene`` (see ``parallel.ba``) for the
    device-side system. All scenes must share one camera.

    ``all_levels`` (default): EVERY multi-resolution point level of each
    scene's problem is concatenated (per-point footprint radii, neighbor
    indices offset per level) so the joint rows span the full multi-res
    cloud like the single-scene engine; ``False`` restricts to each
    scene's ``level_idx`` (the round-3 behavior, kept for the equality
    twins)."""
    cam = scenes[0].problem.groups[0].camera
    n_int = len(np.asarray(cam.params)) if optimize_intrinsics else 0
    n_scenes = len(scenes)
    s_max = max(sc.num_scans for sc in scenes)

    def scene_levels(sc):
        if all_levels:
            return list(sc.problem.levels)
        return [sc.problem.levels[sc.level_idx]]

    n_max = max(sum(lv.points.shape[0] for lv in scene_levels(sc))
                for sc in scenes)
    K = scenes[0].problem.levels[scenes[0].level_idx].neighbors.shape[1]
    nd = int(mesh.devices.size)

    # kept-block layout: intrinsics first, then free scans scene-major
    scan_col = np.full((n_scenes, s_max), -1, np.int32)
    col = 0
    for si, sc in enumerate(scenes):
        for s in range(1, sc.num_scans):  # gauge-fix each scene's scan 0
            scan_col[si, s] = col
            col += 1
    n_free = col
    n_keep = n_int + 6 * n_free
    dk = n_int + 6 * s_max

    expand = np.zeros((n_scenes, dk, n_keep), np.float32)
    for si in range(n_scenes):
        expand[si, :n_int, :n_int] = np.eye(n_int)
        for s in range(s_max):
            c = scan_col[si, s]
            if c >= 0:
                expand[si, n_int + 6 * s: n_int + 6 * s + 6,
                       n_int + 6 * c: n_int + 6 * c + 6] = np.eye(6)

    sp = np.zeros((n_scenes, n_max, 3), np.float32)
    ss = np.zeros((n_scenes, n_max), np.int32)
    sn = np.zeros((n_scenes, n_max, K), np.int32)
    sd = np.zeros((n_scenes, n_max, K), np.float32)
    sv = np.zeros((n_scenes, n_max), bool)
    sr = np.zeros((n_scenes, n_max), np.float32)
    for si, sc in enumerate(scenes):
        off = 0
        for lv in scene_levels(sc):
            n = lv.points.shape[0]
            sl = slice(off, off + n)
            sp[si, sl] = np.asarray(lv.points)
            ss[si, sl] = np.asarray(lv.scan_indices)
            # neighbor indices are within-level: offset into the concat
            sn[si, sl] = np.asarray(lv.neighbors) + off
            sd[si, sl] = np.asarray(lv.fixed_descriptors)
            sv[si, sl] = True
            sr[si, sl] = lv.radius
            off += n

    # images, scene-major
    img_scene, pose_q, pose_t = [], [], []
    pyr_levels = None
    for si, sc in enumerate(scenes):
        g = sc.problem.groups[0]
        if pyr_levels is None:
            pyr_levels = [[] for _ in g.pyramid]
        for li, lvl in enumerate(g.pyramid):
            pyr_levels[li].append(np.asarray(lvl))
        img_scene += [si] * g.num_images
        pose_q.append(np.asarray(g.poses.q))
        pose_t.append(np.asarray(g.poses.t))
    m = len(img_scene)
    m_pad = ((m + nd - 1) // nd) * nd
    pad = m_pad - m
    img_scene = np.asarray(img_scene + [0] * pad, np.int32)
    img_valid = np.asarray([True] * m + [False] * pad)
    if pad:
        pose_q.append(np.tile([[1.0, 0, 0, 0]], (pad, 1)))
        pose_t.append(np.zeros((pad, 3)))
    pose_q = np.concatenate(pose_q, 0).astype(np.float32)
    pose_t = np.concatenate(pose_t, 0).astype(np.float32)
    pyramids = []
    for lvls in pyr_levels:
        if pad:
            lvls = lvls + [np.zeros((pad,) + lvls[0].shape[1:], np.float32)]
        pyramids.append(np.concatenate(lvls, 0))

    # ICP correspondences pooled over scenes
    cols = {k: [] for k in "ps ns pt nt w scene src tgt".split()}
    for si, sc in enumerate(scenes):
        if sc.icp is None:
            continue
        ps, ns, pt, nt, src_s, tgt_s = sc.icp
        M = len(ps)
        cols["ps"].append(np.asarray(ps, np.float32))
        cols["ns"].append(np.asarray(ns, np.float32))
        cols["pt"].append(np.asarray(pt, np.float32))
        cols["nt"].append(np.asarray(nt, np.float32))
        cols["w"].append(np.full(M, sc.icp_weight, np.float32))
        cols["scene"].append(np.full(M, si, np.int32))
        cols["src"].append(np.asarray(src_s, np.int32))
        cols["tgt"].append(np.asarray(tgt_s, np.int32))
    if cols["w"]:
        cat = {k: np.concatenate(v) for k, v in cols.items()}
    else:
        cat = {"ps": np.zeros((0, 3), np.float32),
               "ns": np.zeros((0, 3), np.float32),
               "pt": np.zeros((0, 3), np.float32),
               "nt": np.zeros((0, 3), np.float32),
               "w": np.zeros((0,), np.float32),
               "scene": np.zeros((0,), np.int32),
               "src": np.zeros((0,), np.int32),
               "tgt": np.zeros((0,), np.int32)}
    M = len(cat["w"])
    M_pad = max(((M + nd - 1) // nd) * nd, nd)
    padM = M_pad - M

    def padm(a):
        return np.concatenate(
            [a, np.zeros((padM,) + a.shape[1:], a.dtype)], 0)

    rep = NamedSharding(mesh, P())

    def shard(a):
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, P(
            tuple(mesh.axis_names), *([None] * (np.ndim(a) - 1)))))

    return JointBAPack(
        mesh=mesh, camera=cam, n_scenes=n_scenes, n_images=m, m_pad=m_pad,
        s_max=s_max, n_int=n_int, n_free=n_free,
        scale_count=len(pyramids), occl_downscale=occl_downscale,
        scene_points=jax.device_put(jnp.asarray(sp), rep),
        scene_scan_idx=jax.device_put(jnp.asarray(ss), rep),
        scene_neighbors=jax.device_put(jnp.asarray(sn), rep),
        scene_desc=jax.device_put(jnp.asarray(sd), rep),
        scene_valid=jax.device_put(jnp.asarray(sv), rep),
        scene_radius=jax.device_put(jnp.asarray(sr), rep),
        scan_col=jax.device_put(jnp.asarray(scan_col), rep),
        expand=jax.device_put(jnp.asarray(expand), rep),
        img_scene=shard(img_scene), img_valid=shard(img_valid),
        pose_q0=shard(pose_q), pose_t0=shard(pose_t),
        pyramids=[shard(p) for p in pyramids],
        icp_ps=shard(padm(cat["ps"])), icp_ns=shard(padm(cat["ns"])),
        icp_pt=shard(padm(cat["pt"])), icp_nt=shard(padm(cat["nt"])),
        icp_w=shard(padm(cat["w"])), icp_scene=shard(padm(cat["scene"])),
        icp_src_s=shard(padm(cat["src"])), icp_tgt_s=shard(padm(cat["tgt"])),
        scan_col_np=scan_col, occlusion_radius=occlusion_radius,
        occlusion_depth_threshold=occlusion_depth_threshold, n_icp=M,
        icp_w0_np=padm(cat["w"]),
    )


# ---------------------------------------------------------------------------
# Device-side kernels — everything below runs INSIDE shard_map on LOCAL
# shards; ``pack`` is rebound to local views first. i is a LOCAL image index.
# ---------------------------------------------------------------------------


def _corrected_points(pack: JointBAPack, corr_q, corr_t, si):
    """Scene ``si``'s points under the current per-scan corrections."""
    pts = pack.scene_points[si]
    scan = pack.scene_scan_idx[si]
    return quat_rotate(corr_q[si][scan], pts) + corr_t[si][scan]


def _vis_one_image(pack: JointBAPack, params, corr_q, corr_t, pose_q, pose_t,
                   si, current_scale):
    """Visibility + frozen footprint obs-scale for one image
    (``opt/visibility_estimator.cc:276-294,405-532``): splat occlusion
    z-test with slack at 1/occl_downscale resolution, footprint scale from
    the projected point radius, border check at the coarser interp scale."""
    cam = pack.camera
    pts = _corrected_points(pack, corr_q, corr_t, si)
    radius = pack.scene_radius[si]
    width, height = cam.width, cam.height
    d = pack.occl_downscale
    wo, ho = width // d, height // d

    pose = SE3(pose_q, pose_t)
    p_cam = pose.apply(pts)
    pix, valid = _project_full(cam, params, p_cam)
    z = p_cam[:, 2]

    # splat occlusion render at reduced res (pinhole footprint approximation
    # like the single-scene engine's _occl_splat_batch)
    occl = render_splats_depth(
        p_cam, jnp.full(pts.shape[:1], pack.occlusion_radius, jnp.float32),
        wo, ho, cam.fx / d, cam.fy / d,
        (cam.cx + 0.5) / d - 0.5, (cam.cy + 0.5) / d - 0.5,
        max_radius_px=2)
    ix = jnp.clip(jnp.round((pix[:, 0] + 0.5) / d - 0.5).astype(jnp.int32),
                  0, wo - 1)
    iy = jnp.clip(jnp.round((pix[:, 1] + 0.5) / d - 0.5).astype(jnp.int32),
                  0, ho - 1)
    occ = occl[iy, ix]
    valid = valid & (z <= occ + pack.occlusion_depth_threshold) & (z > 0.05)

    # footprint observation scale
    eps = 1e-3 * jnp.maximum(z, 1e-6)
    p2 = p_cam + jnp.stack([eps, jnp.zeros_like(eps), jnp.zeros_like(eps)], -1)
    pix2, _ = _project_full(cam, params, p2)
    px_per_m = jnp.linalg.norm(pix2 - pix, axis=-1) / eps
    obs_scale = jnp.log2(jnp.maximum(2.0 * radius * px_per_m, 1e-12))
    valid = valid & (obs_scale >= current_scale) & (
        jnp.floor(obs_scale) < pack.scale_count - 1) & (obs_scale >= 0)

    # border check at the coarser interpolation scale
    si_lvl = jnp.floor(obs_scale).astype(jnp.int32) + 1
    factor = jnp.exp2(-si_lvl.astype(jnp.float32))
    xs = factor * (pix[:, 0] + 0.5) - 0.5
    ys = factor * (pix[:, 1] + 0.5) - 0.5
    w_si = jnp.floor(width * factor + 0.5)
    h_si = jnp.floor(height * factor + 0.5)
    valid = valid & (xs + 0.5 >= 1.0) & (ys + 0.5 >= 1.0) & (
        xs + 0.5 < w_si - 1.0) & (ys + 0.5 < h_si - 1.0)
    return valid & pack.scene_valid[si], obs_scale


def _rows_one_image(pack: JointBAPack, params, corr_q, corr_t, pose_q, pose_t,
                    si, image_pyr, vis, obs_scale):
    """Compact per-image Gram: J (N, D) with D = [n_int | 6*s_max | 6],
    then the descriptor-residual Gram assembly of ``_gram_assemble``.

    Jacobian chain (one image sample per point, gather-free geometry
    jacfwd — the production-rate trick of ``photometric/optimizer._hb_core``):
    pose/intrinsics blocks via jacfwd of the projection; scan blocks via
    dI/dp_world = dI/dpix . dpix/dp_cam . R with the left-multiplicative
    tangent d(exp(eps) p)/deps = [I | -[p]x], i.e.
    J_scan = [dIdp, p x dIdp], scattered to the point's scan slot.
    """
    cam = pack.camera
    pts = _corrected_points(pack, corr_q, corr_t, si)
    neighbors = pack.scene_neighbors[si]
    desc = pack.scene_desc[si]
    pose0 = SE3(pose_q, pose_t)

    def geom(eps, prm):
        pose = SE3.exp(eps).compose(pose0)
        return _project_full(cam, prm, pose.apply(pts))[0]

    eps0 = jnp.zeros(6, jnp.float32)
    p_cam0 = pose0.apply(pts)
    pix, valid = _project_full(cam, params, p_cam0)
    # visibility gates the CENTER point (contrib below); neighbors need only
    # be sample-valid — matching the single-scene engine's _hb_core
    inten, dpx, dpy, _, okS = _sample_pyramid_with_derivs(
        image_pyr, pix, obs_scale)
    ok = valid & okS

    Jpix_e, Jpix_p = jax.jacfwd(geom, argnums=(0, 1))(eps0, params)
    J_img = dpx[:, None] * Jpix_e[:, 0, :] + dpy[:, None] * Jpix_e[:, 1, :]

    # dpix/dp_cam via 3 jvps (elementwise closed form), then to world frame
    def proj_only(pc):
        return _project_full(cam, params, pc)[0]

    cols = []
    for e in range(3):
        tang = jnp.zeros_like(p_cam0).at[:, e].set(1.0)
        _, dp = jax.jvp(proj_only, (p_cam0,), (tang,))
        cols.append(dp)
    Jpix_pc = jnp.stack(cols, -1)  # (N, 2, 3)
    R = pose0.rotation_matrix()
    Jpix_pw = jnp.einsum("nij,jk->nik", Jpix_pc, R, precision=HI)
    dIdp = dpx[:, None] * Jpix_pw[:, 0, :] + dpy[:, None] * Jpix_pw[:, 1, :]
    J_scan6 = jnp.concatenate([dIdp, jnp.cross(pts, dIdp)], -1)  # (N, 6)
    onehot = (pack.scene_scan_idx[si][:, None]
              == jnp.arange(pack.s_max)[None, :]).astype(jnp.float32)
    rows_scan = (J_scan6[:, None, :] * onehot[:, :, None]).reshape(
        pts.shape[0], 6 * pack.s_max)

    if pack.n_int > 0:
        J_int = dpx[:, None] * Jpix_p[:, 0, :] + dpy[:, None] * Jpix_p[:, 1, :]
        J = jnp.concatenate([J_int, rows_scan, J_img], -1)
    else:
        J = jnp.concatenate([rows_scan, J_img], -1)

    contrib = vis & pack.scene_valid[si]
    return _gram_assemble(J, inten, ok, neighbors, desc, contrib)


def _cost_one_image(pack: JointBAPack, params, corr_q, corr_t, pose_q, pose_t,
                    si, image_pyr, vis, obs_scale):
    """Robust descriptor cost of one image under FROZEN visibility (the LM
    accept test, ``.cc:197-258`` / ``ComputeResidualForState``)."""
    cam = pack.camera
    pts = _corrected_points(pack, corr_q, corr_t, si)
    neighbors = pack.scene_neighbors[si]
    desc = pack.scene_desc[si]
    p_cam = SE3(pose_q, pose_t).apply(pts)
    pix, valid = _project_full(cam, params, p_cam)
    inten, okS = _sample_pyramid(image_pyr, pix, obs_scale)
    ok = valid & okS
    from dataset_pipeline_tpu.photometric.optimizer import _nbr_inten_ok

    nbr_inten, nbr_ok = _nbr_inten_ok(inten, ok, neighbors)
    all_ok = ok & jnp.all(nbr_ok, -1) & vis & pack.scene_valid[si]
    r = (nbr_inten - inten[:, None]) - desc
    r = jnp.where(all_ok[:, None], r, 0.0)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(r * r, -1), 1e-20))
    rho = huber_rho(norm, DEFAULT_COLOR_HUBER)
    return jnp.sum(jnp.where(all_ok, rho, 0.0)), jnp.sum(all_ok)


def _icp_local(pack: JointBAPack, corr_q, corr_t):
    """Local ICP shard -> (Hs (6F, 6F), bs (6F,), cost) over the free-scan
    section of the kept block. Correspondence endpoints move with their
    scans' corrections; rows follow ``icp/icp_point_to_plane_impl.h:129-211``
    (+target/-source for the source-normal row; roles swap for the twin)."""
    F = pack.n_free
    if F == 0 or pack.icp_w.shape[0] == 0:
        return (jnp.zeros((6 * F, 6 * F)), jnp.zeros((6 * F,)),
                jnp.asarray(0.0))
    sc = pack.icp_scene
    qs = corr_q[sc, pack.icp_src_s]
    ts = corr_t[sc, pack.icp_src_s]
    qt = corr_q[sc, pack.icp_tgt_s]
    tt = corr_t[sc, pack.icp_tgt_s]
    ps = quat_rotate(qs, pack.icp_ps) + ts
    pt = quat_rotate(qt, pack.icp_pt) + tt
    ns = quat_rotate(qs, pack.icp_ns)
    nt = quat_rotate(qt, pack.icp_nt)
    diff = pt - ps
    r1 = jnp.sum(ns * diff, -1)
    r2 = -jnp.sum(nt * diff, -1)
    j1 = jnp.concatenate([ns, jnp.cross(pt, ns)], -1)
    j2 = jnp.concatenate([nt, jnp.cross(ps, nt)], -1)
    src_col = pack.scan_col[sc, pack.icp_src_s]  # (M,), -1 = gauge-fixed
    tgt_col = pack.scan_col[sc, pack.icp_tgt_s]
    blocks = jnp.arange(F)[None, :]
    sgn = ((tgt_col[:, None] == blocks).astype(jnp.float32)
           - (src_col[:, None] == blocks).astype(jnp.float32))  # (M, F)

    def gram_of(j, r):
        rows = (j[:, None, :] * sgn[:, :, None]).reshape(-1, 6 * F)
        rows_w = rows * jnp.sqrt(pack.icp_w)[:, None]
        H = jax.lax.dot_general(rows_w, rows_w, (((0,), (0,)), ((), ())),
                                precision=HI,
                                preferred_element_type=jnp.float32)
        rw = pack.icp_w * r
        b = jnp.sum(rows * rw[:, None], 0)
        return H, b, jnp.sum(rw * r)

    H1, b1, c1 = gram_of(j1, r1)
    # twin rows use the NEGATED sign pattern; (-sgn) Grams equal sgn Grams,
    # so reuse sgn with the residual negated for b (cost is sign-invariant)
    H2, b2, c2 = gram_of(j2, -r2)
    return H1 + H2, b1 + b2, c1 + c2


def _local_view(pack: JointBAPack, img_scene, img_valid, pyramids,
                icp=None) -> JointBAPack:
    """Shallow pack copy whose sharded arrays are the LOCAL shards."""
    p2 = copy.copy(pack)
    p2.img_scene = img_scene
    p2.img_valid = img_valid
    p2.pyramids = pyramids
    if icp is not None:
        (p2.icp_ps, p2.icp_ns, p2.icp_pt, p2.icp_nt, p2.icp_w,
         p2.icp_scene, p2.icp_src_s, p2.icp_tgt_s) = icp
    return p2


# ---------------------------------------------------------------------------
# The sharded dispatches
# ---------------------------------------------------------------------------


class JointBASystem:
    """Compiled sharded joint-BA dispatches over a fixed pack.

    - ``visibility(state) -> (vis, obs_scale)`` sharded over images
    - ``step(state, vis, obs_scale, lam) -> (x_keep, x_img, cost, count)``
    - ``cost(state, vis, obs_scale) -> (cost, count)``

    each is ONE jitted shard_map dispatch; rows never exist dense anywhere.
    """

    def __init__(self, pack: JointBAPack, current_scale: float = 0.0):
        self.pack = pack
        self.current_scale = float(current_scale)
        mesh = pack.mesh
        axes = tuple(mesh.axis_names)
        spec_i = P(axes)
        rep = P()
        n_keep = pack.n_keep
        dk = pack.dk
        n_int = pack.n_int
        n_lvls = pack.scale_count
        cur = self.current_scale

        def split(args):
            pyramids = list(args[:n_lvls])
            icp = args[n_lvls:n_lvls + 8] if len(args) > n_lvls else None
            return pyramids, icp

        def vis_fn(params, corr_q, corr_t, pose_q, pose_t, img_scene,
                   img_valid, *pyr):
            p2 = _local_view(pack, img_scene, img_valid, list(pyr))

            def one(i):
                v, s = _vis_one_image(p2, params, corr_q, corr_t,
                                      pose_q[i], pose_t[i], img_scene[i], cur)
                return v & img_valid[i], s

            return jax.lax.map(one, jnp.arange(img_scene.shape[0]))

        def step_fn(params, corr_q, corr_t, pose_q, pose_t, lam, img_scene,
                    img_valid, vis, obs_scale, *args):
            pyramids, icp = split(args)
            p2 = _local_view(pack, img_scene, img_valid, pyramids, icp)
            m_local = img_scene.shape[0]

            def body(carry, i):
                Hkk, bk, cost, count = carry
                image_pyr = [lvl[i] for lvl in pyramids]
                G, g, c_i, n_i = _rows_one_image(
                    p2, params, corr_q, corr_t, pose_q[i], pose_t[i],
                    img_scene[i], image_pyr, vis[i], obs_scale[i])
                E = pack.expand[img_scene[i]]  # (dk, n_keep)
                Hkk_i = jnp.matmul(E.T, jnp.matmul(G[:dk, :dk], E,
                                                   precision=HI),
                                   precision=HI)
                Hki_i = jnp.matmul(E.T, G[:dk, dk:], precision=HI)
                return ((Hkk + Hkk_i, bk + jnp.matmul(E.T, g[:dk],
                                                      precision=HI),
                         cost + c_i, count + n_i),
                        (Hki_i, G[dk:, dk:], g[dk:]))

            init = jax.tree.map(
                lambda x: jax.lax.pcast(x, axes, to="varying"),
                (jnp.zeros((n_keep, n_keep)), jnp.zeros((n_keep,)),
                 jnp.asarray(0.0), jnp.asarray(0, jnp.int32)))
            (Hkk, bk, cost, count), (Hki, Hii, bi) = jax.lax.scan(
                body, init, jnp.arange(m_local))

            Hs, bs, c_icp = _icp_local(p2, corr_q, corr_t)
            if pack.n_free > 0:
                Hkk = Hkk.at[n_int:, n_int:].add(Hs)
                bk = bk.at[n_int:].add(bs)
            cost = cost + c_icp

            # damped distributed Schur: diag*(1+lam) damping is linear in
            # the partials, so each device damps its own contribution
            Hii_d = Hii * (1.0 + lam * jnp.eye(6)[None])
            # images with no observations (or padding) must not couple
            ok_img = img_valid & (jnp.einsum("mii->m", Hii) > 0)
            Hii_d = jnp.where(ok_img[:, None, None], Hii_d, jnp.eye(6)[None])
            inv_Hii = jnp.linalg.inv(Hii_d)
            inv_Hii = jnp.where(ok_img[:, None, None], inv_Hii, 0.0)
            W = jnp.einsum("mki,mij->mkj", Hki, inv_Hii, precision=HI)
            S_local = (Hkk * (1.0 + lam * jnp.eye(n_keep))
                       - jnp.einsum("mki,mni->kn", W, Hki, precision=HI))
            rhs_local = bk - jnp.einsum("mki,mi->k", W, bi, precision=HI)

            S = jax.lax.psum(S_local, axes)
            rhs = jax.lax.psum(rhs_local, axes)
            cost = jax.lax.psum(cost, axes)
            count = jax.lax.psum(count, axes)

            x_keep = jnp.linalg.solve(S + 1e-10 * jnp.eye(n_keep), rhs)
            # back-substitution stays local to each image's owner
            r_i = bi - jnp.einsum("mki,k->mi", Hki, x_keep, precision=HI)
            x_img = jnp.einsum("mij,mj->mi", inv_Hii, r_i, precision=HI)
            return x_keep, x_img, cost, count

        def cost_fn(params, corr_q, corr_t, pose_q, pose_t, img_scene,
                    img_valid, vis, obs_scale, *args):
            pyramids, icp = split(args)
            p2 = _local_view(pack, img_scene, img_valid, pyramids, icp)

            def one(i):
                image_pyr = [lvl[i] for lvl in pyramids]
                return _cost_one_image(p2, params, corr_q, corr_t,
                                       pose_q[i], pose_t[i], img_scene[i],
                                       image_pyr, vis[i], obs_scale[i])

            costs, counts = jax.lax.map(one, jnp.arange(img_scene.shape[0]))
            _, _, c_icp = _icp_local(p2, corr_q, corr_t)
            return (jax.lax.psum(jnp.sum(costs) + c_icp, axes),
                    jax.lax.psum(jnp.sum(counts), axes))

        pyr_specs = tuple(spec_i for _ in range(n_lvls))
        icp_specs = tuple(spec_i for _ in range(8))
        st = (rep, rep, rep, spec_i, spec_i)
        self._vis_jit = jax.jit(jax.shard_map(
            vis_fn, mesh=mesh, in_specs=st + (spec_i, spec_i) + pyr_specs,
            out_specs=(spec_i, spec_i), check_vma=False))
        self._step_jit = jax.jit(jax.shard_map(
            step_fn, mesh=mesh,
            in_specs=st + (rep, spec_i, spec_i, spec_i, spec_i)
            + pyr_specs + icp_specs,
            out_specs=(rep, spec_i, rep, rep), check_vma=False))
        self._cost_jit = jax.jit(jax.shard_map(
            cost_fn, mesh=mesh,
            in_specs=st + (spec_i, spec_i, spec_i, spec_i)
            + pyr_specs + icp_specs,
            out_specs=(rep, rep), check_vma=False))

    def _state_args(self, state):
        return (state["params"], state["corr_q"], state["corr_t"],
                state["pose_q"], state["pose_t"])

    def _icp_args(self):
        p = self.pack
        return (p.icp_ps, p.icp_ns, p.icp_pt, p.icp_nt, p.icp_w,
                p.icp_scene, p.icp_src_s, p.icp_tgt_s)

    def visibility(self, state):
        p = self.pack
        return self._vis_jit(*self._state_args(state), p.img_scene,
                             p.img_valid, *p.pyramids)

    def step(self, state, vis, obs_scale, lam: float):
        p = self.pack
        return self._step_jit(*self._state_args(state),
                              jnp.asarray(lam, jnp.float32),
                              p.img_scene, p.img_valid, vis, obs_scale,
                              *p.pyramids, *self._icp_args())

    def cost(self, state, vis, obs_scale):
        p = self.pack
        return self._cost_jit(*self._state_args(state), p.img_scene,
                              p.img_valid, vis, obs_scale,
                              *p.pyramids, *self._icp_args())


# ---------------------------------------------------------------------------
# LM driver (host control flow, device evaluation)
# ---------------------------------------------------------------------------


def apply_delta(pack: JointBAPack, state, x_keep, x_img):
    """Apply a solved step with the framework's exp(-delta) convention
    (delta applied inverted, ``intrinsics_and_pose_optimizer.cc:248-258``)."""
    from dataset_pipeline_tpu.icp.moments import quat_mul_np, se3_exp_np
    from dataset_pipeline_tpu.models.lie import quat_to_matrix_np

    x_keep = np.asarray(x_keep, np.float64)
    x_img = np.asarray(x_img, np.float64)
    new = dict(state)
    if pack.n_int > 0:
        new["params"] = state["params"] - jnp.asarray(
            x_keep[:pack.n_int], jnp.float32)
    corr_q = np.asarray(state["corr_q"], np.float64)
    corr_t = np.asarray(state["corr_t"], np.float64)
    for si in range(pack.n_scenes):
        for s in range(pack.s_max):
            c = pack.scan_col_np[si, s]
            if c < 0:
                continue
            dq, dt = se3_exp_np(-x_keep[pack.n_int + 6 * c:
                                        pack.n_int + 6 * c + 6])
            Rd = quat_to_matrix_np(dq)
            corr_t[si, s] = Rd @ corr_t[si, s] + dt
            q_new = quat_mul_np(dq, corr_q[si, s])
            corr_q[si, s] = q_new / np.linalg.norm(q_new)
    new["corr_q"] = jnp.asarray(corr_q, jnp.float32)
    new["corr_t"] = jnp.asarray(corr_t, jnp.float32)

    d_img = SE3.exp(jnp.asarray(-x_img, jnp.float32))
    poses = d_img.compose(SE3(state["pose_q"], state["pose_t"]))
    new["pose_q"] = poses.q
    new["pose_t"] = poses.t
    return new


def refresh_icp_correspondences(pack: JointBAPack, state, clouds: dict,
                                max_dist: float) -> None:
    """Re-find the ICP targets in the CURRENT state, keeping shapes fixed.

    The reference re-finds correspondences every outer iteration
    (``icp_point_to_plane.cc:208-309``); here the SOURCE side (ps/ns,
    scene/src/tgt assignment, row count) stays frozen so the compiled
    dispatches keep their shapes, and only the matched target endpoint
    (pt/nt, stored in the INITIAL frame) and the gate weight w are updated
    in place on device. ``clouds[(scene, scan)] = (points, normals)`` in
    the initial global frame.
    """
    from dataset_pipeline_tpu.icp.moments import quat_mul_np
    from dataset_pipeline_tpu.models.lie import quat_to_matrix_np
    from dataset_pipeline_tpu.ops.knn import build_grid, nearest_neighbor

    ps = np.asarray(pack.icp_ps)
    scene = np.asarray(pack.icp_scene)
    src_s = np.asarray(pack.icp_src_s)
    tgt_s = np.asarray(pack.icp_tgt_s)
    # candidate rows come from the ORIGINAL (frozen) weights, not the
    # current ones: a row whose match was lost at some iteration must be
    # allowed to re-match once the poses recover (advisor round-4 finding)
    w0 = (pack.icp_w0_np if pack.icp_w0_np is not None
          else np.asarray(pack.icp_w))
    corr_q = np.asarray(state["corr_q"], np.float64)
    corr_t = np.asarray(state["corr_t"], np.float64)
    pt_new = np.asarray(pack.icp_pt).copy()
    nt_new = np.asarray(pack.icp_nt).copy()
    w_new = np.asarray(pack.icp_w).copy()

    def corrected(si, s, pts):
        R = quat_to_matrix_np(corr_q[si, s])
        return pts @ R.T + corr_t[si, s]

    grids = {}
    real = w0 > 0
    keys = set(zip(scene[real].tolist(), src_s[real].tolist(),
                   tgt_s[real].tolist()))
    for (si, s, t) in sorted(keys):
        rows = real & (scene == si) & (src_s == s) & (tgt_s == t)
        tp, tn = clouds[(si, t)]
        gk = (si, t)
        if gk not in grids:
            grids[gk] = (build_grid(corrected(si, t, tp).astype(np.float32),
                                    max_dist), tp, tn)
        grid, tp, tn = grids[gk]
        q = corrected(si, s, ps[rows]).astype(np.float32)
        d2, idx = nearest_neighbor(grid, jnp.asarray(q))
        d2, idx = np.asarray(d2), np.asarray(idx)
        ok = (idx >= 0) & (d2 <= max_dist * max_dist)
        safe = np.maximum(idx, 0)
        pt_new[rows] = np.where(ok[:, None], tp[safe], pt_new[rows])
        nt_new[rows] = np.where(ok[:, None], tn[safe], nt_new[rows])
        wr = w_new[rows]
        wr[~ok] = 0.0
        base = w0[rows]
        wr[ok] = base[ok]
        w_new[rows] = wr

    def reshard(old, new):
        return jax.device_put(jnp.asarray(new), old.sharding)

    pack.icp_pt = reshard(pack.icp_pt, pt_new)
    pack.icp_nt = reshard(pack.icp_nt, nt_new)
    pack.icp_w = reshard(pack.icp_w, w_new)


@dataclass
class JointBAResult:
    state: dict
    costs: List[float]
    iterations: int
    rows: int


def run_joint_ba(pack: JointBAPack, max_iterations: int = 10,
                 lam0: float = 1.0, convergence_threshold: float = 1e-7,
                 current_scale: float = 0.0, print_progress: bool = False,
                 refresh_visibility_every: int = 1,
                 icp_refresh_fn=None,
                 iterations_without_optimum: int = 15,
                 system: Optional[JointBASystem] = None,
                 state: Optional[dict] = None,
                 on_iteration=None, apply_fn=None) -> JointBAResult:
    """LM accept/reject driver over the sharded joint system.

    Per outer iteration: refresh visibility (one dispatch), then up to 10
    damped tries — solve at lambda (one dispatch), apply exp(-delta) on
    host, evaluate the frozen-visibility cost (one dispatch), accept iff it
    decreases (halve lambda) else double; the 10th try is force-applied
    (``opt/intrinsics_and_pose_optimizer.cc:197-258``). Like the reference's
    scale driver (``opt/optimizer.cc:150-176``), the best state across
    iterations (under each iteration's refreshed landscape) is TRACKED and
    restored at the end, and the loop stops after
    ``iterations_without_optimum`` iterations without a new optimum.
    """
    if system is None:
        system = JointBASystem(pack, current_scale)
    if state is None:
        state = make_state(pack)
    if apply_fn is None:
        apply_fn = apply_delta
    lam = lam0
    vis, obs_scale = system.visibility(state)
    cost, count = system.cost(state, vis, obs_scale)
    cost = float(cost)

    def row_count(cnt):
        return int(cnt) * int(pack.scene_neighbors.shape[-1]) + 2 * pack.n_icp

    rows = row_count(count)
    costs = [cost]
    best_cost, best_state = cost, state
    since_optimum = 0
    it_done = 0
    x_keep = x_img = None
    for it in range(max_iterations):
        if it > 0 and icp_refresh_fn is not None:
            # re-find ICP targets in the current state (fixed shapes; the
            # reference re-finds correspondences every outer iteration)
            icp_refresh_fn(pack, state)
            cost = float(system.cost(state, vis, obs_scale)[0])
        if it > 0 and refresh_visibility_every and (
                it % refresh_visibility_every == 0):
            vis, obs_scale = system.visibility(state)
            c, cnt = system.cost(state, vis, obs_scale)
            cost = float(c)
            rows = row_count(cnt)
        applied = False
        for try_i in range(10):
            x_keep, x_img, _, _ = system.step(state, vis, obs_scale, lam)
            cand = apply_fn(pack, state, x_keep, x_img)
            new_cost = float(system.cost(cand, vis, obs_scale)[0])
            if new_cost < cost or try_i == 9:
                state = cand
                cost = new_cost
                lam = max(lam * 0.5, 1e-10)
                applied = True
                break
            lam *= 2.0
        costs.append(cost)
        it_done = it + 1
        if cost < best_cost:
            best_cost, best_state = cost, state
            since_optimum = 0
        else:
            since_optimum += 1
        if print_progress:
            print(f"  joint BA iter {it}: cost {cost:.6f} lam {lam:.2e}")
        if on_iteration is not None:
            # crash-resilience hook (the reference's write-every-iteration
            # idiom, exe/icp_scan_aligner.cc:356-365)
            on_iteration(it, state, cost)
        if not applied or since_optimum >= iterations_without_optimum:
            break
        step_norm = (float(np.linalg.norm(np.asarray(x_keep)))
                     + float(np.linalg.norm(np.asarray(x_img))))
        if step_norm < convergence_threshold:
            break
    return JointBAResult(state=best_state, costs=costs, iterations=it_done,
                         rows=rows)
