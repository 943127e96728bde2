"""Rig-capable joint multi-scene BA: frames as the Schur-eliminated unit.

Generalizes ``parallel/joint_ba.py`` (VERDICT r4 weak #3) to the reference's
full variable set (``opt/intrinsics_and_pose_optimizer.cc:442-473``):

- **multiple camera groups**: one intrinsics block per rig slot (each rig
  camera is its own image group with its own camera model, as in
  ``opt/rig.cc``);
- **rig extrinsics**: 6-dof kept blocks per non-reference rig camera, with
  image pose = ``exp(e_extr) . extr . exp(e_ref) . ref`` exactly as the
  single-scene ``_hb_rig_core`` chain;
- **inverse-depth residuals** for reference-slot images (the reference
  leaves the rig-dependent depth case unimplemented,
  ``intrinsics_and_pose_optimizer.cc:1149-1214`` — so do we).

Sharding unit: the FRAME (rig timestamp). All rig images of a frame share
the frame's eliminated 6-dof reference pose, so they must live on one
device for the per-frame Schur elimination to stay local; the rig-camera
loop inside the frame is a static Python unroll (each slot has its own
static camera model — no lax.switch needed). Everything else (block-sparse
Hkk/Hki/Hii, one psum of the damped reduced system, local
back-substitution) mirrors ``joint_ba.py``.
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
from dataset_pipeline_tpu.ops.robust import (
    DEFAULT_COLOR_HUBER,
    DEFAULT_DEPTH_TUKEY,
    huber_rho,
    tukey_rho,
    tukey_weight,
)
from dataset_pipeline_tpu.ops.splat import render_splats_depth
from dataset_pipeline_tpu.parallel.joint_ba import (
    HI,
    _corrected_points,
    _icp_local,
    _project_full,
)
from dataset_pipeline_tpu.photometric.optimizer import (
    _gram_assemble,
    _sample_pyramid,
    _sample_pyramid_with_derivs,
)


@dataclass
class RigJointPack:
    """Device-resident rig joint problem. Scene geometry replicated;
    frames (and their per-slot pyramids) sharded over the mesh."""

    mesh: Mesh
    cameras: List[cm.Camera]       # per rig slot, slot 0 = reference
    n_cams: int
    n_scenes: int
    n_frames: int                  # real frame count
    f_pad: int
    s_max: int
    n_int: int                     # TOTAL optimized intrinsics params
    p_off: List[int]               # kept offset of slot c's params
    p_len: List[int]
    n_free: int
    scale_count: int
    occl_downscale: int
    depth_weight: float
    # replicated scene geometry (same layout as JointBAPack)
    scene_points: jnp.ndarray
    scene_scan_idx: jnp.ndarray
    scene_neighbors: jnp.ndarray
    scene_desc: jnp.ndarray
    scene_valid: jnp.ndarray
    scene_radius: jnp.ndarray
    scan_col: jnp.ndarray
    # per-slot expansion maps [P_c | 6 extr | 6*s_max scans] -> n_keep,
    # indexed by scene: (n_scenes, dk_c, n_keep); slot 0 has no extr cols
    expand_c: List[jnp.ndarray]
    # frames (sharded)
    frame_scene: jnp.ndarray       # (f_pad,) int32
    frame_valid: jnp.ndarray       # (f_pad,) bool
    present: jnp.ndarray           # (f_pad, n_cams) bool
    ref_q0: jnp.ndarray            # (f_pad, 4)
    ref_t0: jnp.ndarray
    pyramids: List[jnp.ndarray]    # per level (f_pad, n_cams, H_l, W_l)
    depth_pyramids: Optional[List[jnp.ndarray]]  # per level (f_pad, H_l, W_l)
    # rig extrinsics initial (replicated)
    extr_q0: jnp.ndarray           # (n_cams, 4)
    extr_t0: jnp.ndarray           # (n_cams, 3)
    # ICP (sharded; duck-typed for joint_ba._icp_local / refresh)
    icp_ps: jnp.ndarray
    icp_ns: jnp.ndarray
    icp_pt: jnp.ndarray
    icp_nt: jnp.ndarray
    icp_w: jnp.ndarray
    icp_scene: jnp.ndarray
    icp_src_s: jnp.ndarray
    icp_tgt_s: jnp.ndarray
    # host bookkeeping
    scan_col_np: np.ndarray
    occlusion_radius: float
    occlusion_depth_threshold: float
    n_icp: int
    icp_w0_np: Optional[np.ndarray] = None

    @property
    def n_extr(self) -> int:
        return 6 * (self.n_cams - 1)

    @property
    def extr_off(self) -> int:
        return self.n_int

    @property
    def scan_off(self) -> int:
        return self.n_int + self.n_extr

    @property
    def n_keep(self) -> int:
        return self.n_int + self.n_extr + 6 * self.n_free

    def dk(self, c: int) -> int:
        """Kept-column count of slot c's compact Jacobian."""
        return self.p_len[c] + (6 if c > 0 else 0) + 6 * self.s_max


def make_rig_state(pack: RigJointPack) -> dict:
    return {
        "params": tuple(jnp.asarray(cam.params, jnp.float32)
                        for cam in pack.cameras),
        "extr_q": pack.extr_q0,
        "extr_t": pack.extr_t0,
        "corr_q": jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                           (pack.n_scenes, pack.s_max, 1)),
        "corr_t": jnp.zeros((pack.n_scenes, pack.s_max, 3), jnp.float32),
        "pose_q": pack.ref_q0,
        "pose_t": pack.ref_t0,
    }


def pack_rig_scenes(mesh: Mesh, scenes, optimize_intrinsics: bool = True,
                    occl_downscale: int = 2, occlusion_radius: float = 0.03,
                    occlusion_depth_threshold: float = 0.01,
                    depth_weight: float = 0.0,
                    all_levels: bool = True) -> RigJointPack:
    """Pack ``JointScene``s whose problems carry a RIG: each problem's
    groups are the rig slots (group ``rig_cam_index`` orders them; group 0
    must be the reference slot whose images define the frames). All scenes
    must share the rig (same per-slot cameras and extrinsics)."""
    probs = [sc.problem for sc in scenes]
    groups0 = sorted(probs[0].groups, key=lambda g: g.rig_cam_index)
    n_cams = len(groups0)
    cams = [g.camera for g in groups0]
    if probs[0].rig_extrinsics:
        extr = probs[0].rig_extrinsics[0]
        extr_q0 = jnp.asarray(extr.q, jnp.float32)
        extr_t0 = jnp.asarray(extr.t, jnp.float32)
    else:
        extr_q0 = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                           (n_cams, 1))
        extr_t0 = jnp.zeros((n_cams, 3), jnp.float32)

    p_len = [(len(np.asarray(c.params)) if optimize_intrinsics else 0)
             for c in cams]
    p_off = list(np.concatenate([[0], np.cumsum(p_len)[:-1]]).astype(int))
    n_int = int(sum(p_len))
    n_scenes = len(scenes)
    s_max = max(sc.num_scans for sc in scenes)
    nd = int(mesh.devices.size)

    def scene_levels(sc):
        if all_levels:
            return list(sc.problem.levels)
        return [sc.problem.levels[sc.level_idx]]

    n_max = max(sum(lv.points.shape[0] for lv in scene_levels(sc))
                for sc in scenes)
    K = scenes[0].problem.levels[scenes[0].level_idx].neighbors.shape[1]

    scan_col = np.full((n_scenes, s_max), -1, np.int32)
    col = 0
    for si, sc in enumerate(scenes):
        for s in range(1, sc.num_scans):
            scan_col[si, s] = col
            col += 1
    n_free = col
    n_keep = n_int + 6 * (n_cams - 1) + 6 * n_free

    # per-slot expansion maps
    expand_c = []
    for c in range(n_cams):
        dk_c = p_len[c] + (6 if c > 0 else 0) + 6 * s_max
        E = np.zeros((n_scenes, dk_c, n_keep), np.float32)
        for si in range(n_scenes):
            off = 0
            if p_len[c]:
                E[si, off:off + p_len[c], p_off[c]:p_off[c] + p_len[c]] = (
                    np.eye(p_len[c]))
                off += p_len[c]
            if c > 0:
                eo = n_int + 6 * (c - 1)
                E[si, off:off + 6, eo:eo + 6] = np.eye(6)
                off += 6
            for s in range(s_max):
                sc_col = scan_col[si, s]
                if sc_col >= 0:
                    so = n_int + 6 * (n_cams - 1) + 6 * sc_col
                    E[si, off + 6 * s:off + 6 * s + 6, so:so + 6] = np.eye(6)
        expand_c.append(E)

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
            sn[si, sl] = np.asarray(lv.neighbors) + off
            sd[si, sl] = np.asarray(lv.fixed_descriptors)
            sv[si, sl] = True
            sr[si, sl] = lv.radius
            off += n

    # frames: reference-slot images, scene-major; dependent slots attach
    # via their groups' ref_slots
    frame_scene, ref_q, ref_t = [], [], []
    pyr_levels = None
    present_rows = []
    depth_levels = None
    for si, sc in enumerate(scenes):
        gs = sorted(sc.problem.groups, key=lambda g: g.rig_cam_index)
        g0 = gs[0]
        nf = g0.num_images
        if pyr_levels is None:
            pyr_levels = [[] for _ in g0.pyramid]
            if depth_weight > 0 and sc.problem.depth_map_pyramids is not None:
                depth_levels = [[] for _ in g0.pyramid]
        pres = np.zeros((nf, n_cams), bool)
        pres[:, 0] = True
        # per level: (nf, n_cams, H, W)
        for li in range(len(g0.pyramid)):
            H_l, W_l = g0.pyramid[li].shape[-2:]
            lvl = np.zeros((nf, n_cams, H_l, W_l), np.float32)
            lvl[:, 0] = np.asarray(g0.pyramid[li])
            for g in gs[1:]:
                slots = np.asarray(g.ref_slots)
                lvl[slots, g.rig_cam_index] = np.asarray(g.pyramid[li])
                pres[slots, g.rig_cam_index] = True
            pyr_levels[li].append(lvl)
            if depth_levels is not None:
                dmp = sc.problem.depth_map_pyramids[0]
                depth_levels[li].append(np.asarray(dmp[li]))
        present_rows.append(pres)
        frame_scene += [si] * nf
        ref_q.append(np.asarray(g0.poses.q))
        ref_t.append(np.asarray(g0.poses.t))
    f = len(frame_scene)
    f_pad = ((f + nd - 1) // nd) * nd
    pad = f_pad - f
    frame_scene = np.asarray(frame_scene + [0] * pad, np.int32)
    frame_valid = np.asarray([True] * f + [False] * pad)
    present = np.concatenate(present_rows + (
        [np.zeros((pad, n_cams), bool)] if pad else []), 0)
    if pad:
        ref_q.append(np.tile([[1.0, 0, 0, 0]], (pad, 1)))
        ref_t.append(np.zeros((pad, 3)))
    ref_q = np.concatenate(ref_q, 0).astype(np.float32)
    ref_t = np.concatenate(ref_t, 0).astype(np.float32)
    pyramids = []
    for lvls in pyr_levels:
        if pad:
            lvls = lvls + [np.zeros((pad,) + lvls[0].shape[1:], np.float32)]
        pyramids.append(np.concatenate(lvls, 0))
    depth_pyramids = None
    if depth_levels is not None:
        depth_pyramids = []
        for lvls in depth_levels:
            if pad:
                lvls = lvls + [np.zeros((pad,) + lvls[0].shape[1:],
                                        np.float32)]
            depth_pyramids.append(np.concatenate(lvls, 0))

    # ICP pooled over scenes (same as pack_scenes)
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

    return RigJointPack(
        mesh=mesh, cameras=cams, n_cams=n_cams, n_scenes=n_scenes,
        n_frames=f, f_pad=f_pad, s_max=s_max, n_int=n_int, p_off=p_off,
        p_len=p_len, n_free=n_free, scale_count=len(pyramids),
        occl_downscale=occl_downscale, depth_weight=depth_weight,
        scene_points=jax.device_put(jnp.asarray(sp), rep),
        scene_scan_idx=jax.device_put(jnp.asarray(ss), rep),
        scene_neighbors=jax.device_put(jnp.asarray(sn), rep),
        scene_desc=jax.device_put(jnp.asarray(sd), rep),
        scene_valid=jax.device_put(jnp.asarray(sv), rep),
        scene_radius=jax.device_put(jnp.asarray(sr), rep),
        scan_col=jax.device_put(jnp.asarray(scan_col), rep),
        expand_c=[jax.device_put(jnp.asarray(E), rep) for E in expand_c],
        frame_scene=shard(frame_scene), frame_valid=shard(frame_valid),
        present=shard(present), ref_q0=shard(ref_q), ref_t0=shard(ref_t),
        pyramids=[shard(p) for p in pyramids],
        depth_pyramids=([shard(p) for p in depth_pyramids]
                        if depth_pyramids is not None else None),
        extr_q0=jax.device_put(extr_q0, rep),
        extr_t0=jax.device_put(extr_t0, rep),
        icp_ps=shard(padm(cat["ps"])), icp_ns=shard(padm(cat["ns"])),
        icp_pt=shard(padm(cat["pt"])), icp_nt=shard(padm(cat["nt"])),
        icp_w=shard(padm(cat["w"])), icp_scene=shard(padm(cat["scene"])),
        icp_src_s=shard(padm(cat["src"])), icp_tgt_s=shard(padm(cat["tgt"])),
        scan_col_np=scan_col, occlusion_radius=occlusion_radius,
        occlusion_depth_threshold=occlusion_depth_threshold, n_icp=M,
        icp_w0_np=padm(cat["w"]),
    )


# ---------------------------------------------------------------------------
# Device-side kernels (run on LOCAL shards inside shard_map)
# ---------------------------------------------------------------------------


def _slot_pose(extr_q, extr_t, ref_q, ref_t, c: int):
    if c == 0:
        return SE3(ref_q, ref_t)
    return SE3(extr_q[c], extr_t[c]).compose(SE3(ref_q, ref_t))


def _vis_one(pack: RigJointPack, c: int, params_c, corr_q, corr_t,
             extr_q, extr_t, ref_q, ref_t, si, current_scale):
    """Visibility + frozen footprint obs-scale for slot ``c`` of a frame
    (same gates as ``joint_ba._vis_one_image``)."""
    cam = pack.cameras[c]
    pts = _corrected_points(pack, corr_q, corr_t, si)
    radius = pack.scene_radius[si]
    width, height = cam.width, cam.height
    d = pack.occl_downscale
    wo, ho = width // d, height // d

    pose = _slot_pose(extr_q, extr_t, ref_q, ref_t, c)
    p_cam = pose.apply(pts)
    pix, valid = _project_full(cam, params_c, p_cam)
    z = p_cam[:, 2]

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

    eps = 1e-3 * jnp.maximum(z, 1e-6)
    p2 = p_cam + jnp.stack([eps, jnp.zeros_like(eps), jnp.zeros_like(eps)], -1)
    pix2, _ = _project_full(cam, params_c, p2)
    px_per_m = jnp.linalg.norm(pix2 - pix, axis=-1) / eps
    obs_scale = jnp.log2(jnp.maximum(2.0 * radius * px_per_m, 1e-12))
    valid = valid & (obs_scale >= current_scale) & (
        jnp.floor(obs_scale) < pack.scale_count - 1) & (obs_scale >= 0)

    si_lvl = jnp.floor(obs_scale).astype(jnp.int32) + 1
    factor = jnp.exp2(-si_lvl.astype(jnp.float32))
    xs = factor * (pix[:, 0] + 0.5) - 0.5
    ys = factor * (pix[:, 1] + 0.5) - 0.5
    w_si = jnp.floor(width * factor + 0.5)
    h_si = jnp.floor(height * factor + 0.5)
    valid = valid & (xs + 0.5 >= 1.0) & (ys + 0.5 >= 1.0) & (
        xs + 0.5 < w_si - 1.0) & (ys + 0.5 < h_si - 1.0)
    return valid & pack.scene_valid[si], obs_scale


def _rows_one(pack: RigJointPack, c: int, params_c, corr_q, corr_t,
              extr_q, extr_t, ref_q, ref_t, si, image_pyr, vis, obs_scale):
    """Compact per-(frame, slot) Gram: J columns
    [P_c | 6 extr (c>0) | 6*s_max scans | 6 ref]."""
    cam = pack.cameras[c]
    pts = _corrected_points(pack, corr_q, corr_t, si)
    neighbors = pack.scene_neighbors[si]
    desc = pack.scene_desc[si]
    extr0 = SE3(extr_q[c], extr_t[c])
    ref0 = SE3(ref_q, ref_t)

    def geom(eps_e, eps_r, prm):
        extr = SE3.exp(eps_e).compose(extr0)
        ref = SE3.exp(eps_r).compose(ref0)
        pose = extr.compose(ref) if c > 0 else SE3.exp(eps_r).compose(ref0)
        return _project_full(cam, prm, pose.apply(pts))[0]

    z6 = jnp.zeros(6, jnp.float32)
    pose0 = _slot_pose(extr_q, extr_t, ref_q, ref_t, c)
    p_cam0 = pose0.apply(pts)
    pix, valid = _project_full(cam, params_c, p_cam0)
    inten, dpx, dpy, _, okS = _sample_pyramid_with_derivs(
        image_pyr, pix, obs_scale)
    ok = valid & okS

    Jpix_e, Jpix_r, Jpix_p = jax.jacfwd(geom, argnums=(0, 1, 2))(
        z6, z6, params_c)

    def chain(Jp):
        return dpx[:, None] * Jp[:, 0, :] + dpy[:, None] * Jp[:, 1, :]

    # scan columns: dI/dp_world with the full slot pose rotation
    def proj_only(pc):
        return _project_full(cam, params_c, pc)[0]

    cols = []
    for e in range(3):
        tang = jnp.zeros_like(p_cam0).at[:, e].set(1.0)
        _, dp = jax.jvp(proj_only, (p_cam0,), (tang,))
        cols.append(dp)
    Jpix_pc = jnp.stack(cols, -1)
    R = pose0.rotation_matrix()
    Jpix_pw = jnp.einsum("nij,jk->nik", Jpix_pc, R, precision=HI)
    dIdp = dpx[:, None] * Jpix_pw[:, 0, :] + dpy[:, None] * Jpix_pw[:, 1, :]
    J_scan6 = jnp.concatenate([dIdp, jnp.cross(pts, dIdp)], -1)
    onehot = (pack.scene_scan_idx[si][:, None]
              == jnp.arange(pack.s_max)[None, :]).astype(jnp.float32)
    rows_scan = (J_scan6[:, None, :] * onehot[:, :, None]).reshape(
        pts.shape[0], 6 * pack.s_max)

    blocks = []
    if pack.p_len[c]:
        blocks.append(chain(Jpix_p))
    if c > 0:
        blocks.append(chain(Jpix_e))
    blocks.append(rows_scan)
    blocks.append(chain(Jpix_r))  # ref pose (eliminated) LAST
    J = jnp.concatenate(blocks, -1)

    contrib = vis & pack.scene_valid[si]
    return _gram_assemble(J, inten, ok, neighbors, desc, contrib)


def _depth_rows_one(pack: RigJointPack, params0, corr_q, corr_t,
                    ref_q, ref_t, si, depth_pyr, vis, obs_scale):
    """Inverse-depth rows for the REFERENCE slot of a frame (Tukey), same
    compact layout as ``_rows_one`` with c=0. Mirrors
    ``photometric/optimizer._hb_depth_core``."""
    cam = pack.cameras[0]
    pts = _corrected_points(pack, corr_q, corr_t, si)
    ref0 = SE3(ref_q, ref_t)

    def geom(eps_r, eps_s, prm):
        ref = SE3.exp(eps_r).compose(ref0)
        corr = SE3.exp(eps_s)
        scan = pack.scene_scan_idx[si]
        p = quat_rotate(corr.q[scan], pts) + corr.t[scan]
        p_cam = ref.apply(p)
        pix, _ = _project_full(cam, prm, p_cam)
        return pix, p_cam[:, 2]

    z6 = jnp.zeros(6, jnp.float32)
    zs = jnp.zeros((pack.s_max, 6), jnp.float32)
    pix, z = geom(z6, zs, params0)
    _, valid = _project_full(cam, params0, ref0.apply(pts))
    D, dDx, dDy, _, okD = _sample_pyramid_with_derivs(depth_pyr, pix,
                                                      obs_scale)
    inv_D = jnp.where(D > 0, 1.0 / jnp.maximum(D, 1e-9), 0.0)
    safe_z = jnp.where(z == 0, 1.0, z)
    inv_z = jnp.where(z != 0, 1.0 / safe_z, 0.0)
    r0 = inv_D - inv_z
    rho = tukey_rho(r0, DEFAULT_DEPTH_TUKEY)
    w = tukey_weight(r0, DEFAULT_DEPTH_TUKEY)
    ok = valid & okD & (D > 0) & vis & pack.scene_valid[si]
    wfull = jnp.where(ok, w, 0.0)

    (Jpix_r, Jpix_s, Jpix_p), (Jz_r, Jz_s, Jz_p) = jax.jacfwd(
        geom, argnums=(0, 1, 2))(z6, zs, params0)
    dD_coef = -jnp.where(D > 0, 1.0 / jnp.maximum(D * D, 1e-18), 0.0)
    dz_coef = jnp.where(z != 0, 1.0 / (safe_z * safe_z), 0.0)

    def chain(Jpix, Jz):
        return (dD_coef[:, None] * (dDx[:, None] * Jpix[:, 0, :]
                                    + dDy[:, None] * Jpix[:, 1, :])
                + dz_coef[:, None] * Jz)

    n = pts.shape[0]
    rows_scan = chain(Jpix_s.reshape(n, 2, -1),
                      Jz_s.reshape(n, -1))
    blocks = []
    if pack.p_len[0]:
        blocks.append(chain(Jpix_p, Jz_p))
    blocks.append(rows_scan)
    blocks.append(chain(Jpix_r, Jz_r))
    rows = jnp.concatenate(blocks, -1)
    rows = jnp.where(ok[:, None], rows, 0.0)
    sw = jnp.sqrt(wfull)
    rows_w = rows * sw[:, None]
    r_w = jnp.where(ok, r0, 0.0) * sw
    G = jax.lax.dot_general(rows_w, rows_w, (((0,), (0,)), ((), ())),
                            precision=HI,
                            preferred_element_type=jnp.float32)
    g = jnp.sum(rows_w * r_w[:, None], 0)
    cost = jnp.sum(jnp.where(ok, rho, 0.0))
    return G, g, cost, jnp.sum(ok)


def _cost_one(pack: RigJointPack, c: int, params_c, corr_q, corr_t,
              extr_q, extr_t, ref_q, ref_t, si, image_pyr, vis, obs_scale):
    cam = pack.cameras[c]
    pts = _corrected_points(pack, corr_q, corr_t, si)
    neighbors = pack.scene_neighbors[si]
    desc = pack.scene_desc[si]
    pose = _slot_pose(extr_q, extr_t, ref_q, ref_t, c)
    p_cam = pose.apply(pts)
    pix, valid = _project_full(cam, params_c, p_cam)
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


def _depth_cost_one(pack, params0, corr_q, corr_t, ref_q, ref_t, si,
                    depth_pyr, vis, obs_scale):
    cam = pack.cameras[0]
    pts = _corrected_points(pack, corr_q, corr_t, si)
    p_cam = SE3(ref_q, ref_t).apply(pts)
    z = p_cam[:, 2]
    pix, valid = _project_full(cam, params0, p_cam)
    D, okD = _sample_pyramid(depth_pyr, pix, obs_scale)
    ok = valid & okD & (D > 0) & vis & pack.scene_valid[si]
    inv_D = jnp.where(D > 0, 1.0 / jnp.maximum(D, 1e-9), 0.0)
    inv_z = jnp.where(z != 0, 1.0 / jnp.where(z == 0, 1.0, z), 0.0)
    rho = tukey_rho(inv_D - inv_z, DEFAULT_DEPTH_TUKEY)
    return jnp.sum(jnp.where(ok, rho, 0.0)), jnp.sum(ok)


def _local_view(pack: RigJointPack, frame_scene, frame_valid, present,
                pyramids, depth_pyramids, icp) -> RigJointPack:
    p2 = copy.copy(pack)
    p2.frame_scene = frame_scene
    p2.frame_valid = frame_valid
    p2.present = present
    p2.pyramids = pyramids
    p2.depth_pyramids = depth_pyramids
    if icp is not None:
        (p2.icp_ps, p2.icp_ns, p2.icp_pt, p2.icp_nt, p2.icp_w,
         p2.icp_scene, p2.icp_src_s, p2.icp_tgt_s) = icp
    return p2


class RigJointBASystem:
    """Compiled sharded dispatches over a fixed rig pack; same interface
    as ``JointBASystem`` (visibility / step / cost) so ``run_joint_ba``
    drives it unchanged."""

    def __init__(self, pack: RigJointPack, current_scale: float = 0.0):
        self.pack = pack
        self.current_scale = float(current_scale)
        mesh = pack.mesh
        axes = tuple(mesh.axis_names)
        spec_i = P(axes)
        rep = P()
        n_keep = pack.n_keep
        n_cams = pack.n_cams
        n_lvls = pack.scale_count
        cur = self.current_scale
        has_depth = pack.depth_pyramids is not None and pack.depth_weight > 0
        n_dlvls = n_lvls if has_depth else 0

        def split(args):
            pyramids = list(args[:n_lvls])
            dpyr = list(args[n_lvls:n_lvls + n_dlvls]) if n_dlvls else None
            rest = args[n_lvls + n_dlvls:]
            icp = rest[:8] if len(rest) else None
            return pyramids, dpyr, icp

        def state_of(args):
            params = args[:n_cams]
            (extr_q, extr_t, corr_q, corr_t, pose_q, pose_t) = args[n_cams:]
            return params, extr_q, extr_t, corr_q, corr_t, pose_q, pose_t

        ns = n_cams + 6  # state arg count

        def vis_fn(*args):
            st = state_of(args[:ns])
            frame_scene, frame_valid, present = args[ns:ns + 3]
            pyramids, dpyr, _ = split(args[ns + 3:])
            params, extr_q, extr_t, corr_q, corr_t, pose_q, pose_t = st
            p2 = _local_view(self.pack, frame_scene, frame_valid, present,
                             pyramids, dpyr, None)

            def one(i):
                vs, ss = [], []
                for c in range(n_cams):
                    v, s = _vis_one(p2, c, params[c], corr_q, corr_t,
                                    extr_q, extr_t, pose_q[i], pose_t[i],
                                    frame_scene[i], cur)
                    vs.append(v & frame_valid[i] & present[i, c])
                    ss.append(s)
                return jnp.stack(vs), jnp.stack(ss)

            return jax.lax.map(one, jnp.arange(frame_scene.shape[0]))

        def step_fn(*args):
            st = state_of(args[:ns])
            lam = args[ns]
            frame_scene, frame_valid, present, vis, obs_scale = (
                args[ns + 1:ns + 6])
            pyramids, dpyr, icp = split(args[ns + 6:])
            params, extr_q, extr_t, corr_q, corr_t, pose_q, pose_t = st
            p2 = _local_view(self.pack, frame_scene, frame_valid, present,
                             pyramids, dpyr, icp)
            n_int = pack.n_int

            def body(carry, i):
                Hkk, bk, cost, count = carry
                si = frame_scene[i]
                kk = jnp.zeros((n_keep, n_keep))
                ki = jnp.zeros((n_keep, 6))
                ii = jnp.zeros((6, 6))
                bkk = jnp.zeros((n_keep,))
                bii = jnp.zeros((6,))
                c_f = jnp.asarray(0.0)
                n_f = jnp.asarray(0, jnp.int32)
                for c in range(n_cams):
                    image_pyr = [lvl[i, c] for lvl in pyramids]
                    G, g, c_i, n_i = _rows_one(
                        p2, c, params[c], corr_q, corr_t, extr_q, extr_t,
                        pose_q[i], pose_t[i], si, image_pyr, vis[i, c],
                        obs_scale[i, c])
                    pres = present[i, c].astype(jnp.float32)
                    dk = pack.dk(c)
                    E = pack.expand_c[c][si]
                    kk = kk + pres * jnp.matmul(
                        E.T, jnp.matmul(G[:dk, :dk], E, precision=HI),
                        precision=HI)
                    ki = ki + pres * jnp.matmul(E.T, G[:dk, dk:],
                                                precision=HI)
                    ii = ii + pres * G[dk:, dk:]
                    bkk = bkk + pres * jnp.matmul(E.T, g[:dk], precision=HI)
                    bii = bii + pres * g[dk:]
                    c_f = c_f + pres * c_i
                    n_f = n_f + (n_i * present[i, c])
                if dpyr is not None:
                    depth_pyr = [lvl[i] for lvl in dpyr]
                    Gd, gd, cd, nd_ = _depth_rows_one(
                        p2, params[0], corr_q, corr_t, pose_q[i], pose_t[i],
                        si, depth_pyr, vis[i, 0], obs_scale[i, 0])
                    w = pack.depth_weight
                    dk0 = pack.p_len[0] + 6 * pack.s_max
                    E0d = _depth_expand(pack, si)
                    kk = kk + w * jnp.matmul(
                        E0d.T, jnp.matmul(Gd[:dk0, :dk0], E0d, precision=HI),
                        precision=HI)
                    ki = ki + w * jnp.matmul(E0d.T, Gd[:dk0, dk0:],
                                             precision=HI)
                    ii = ii + w * Gd[dk0:, dk0:]
                    bkk = bkk + w * jnp.matmul(E0d.T, gd[:dk0], precision=HI)
                    bii = bii + w * gd[dk0:]
                    c_f = c_f + w * cd
                return ((Hkk + kk, bk + bkk, cost + c_f, count + n_f),
                        (ki, ii, bii))

            init = jax.tree.map(
                lambda x: jax.lax.pcast(x, axes, to="varying"),
                (jnp.zeros((n_keep, n_keep)), jnp.zeros((n_keep,)),
                 jnp.asarray(0.0), jnp.asarray(0, jnp.int32)))
            (Hkk, bk, cost, count), (Hki, Hii, bi) = jax.lax.scan(
                body, init, jnp.arange(frame_scene.shape[0]))

            Hs, bs, c_icp = _icp_local(p2, corr_q, corr_t)
            so = pack.scan_off
            if pack.n_free > 0:
                Hkk = Hkk.at[so:, so:].add(Hs)
                bk = bk.at[so:].add(bs)
            cost = cost + c_icp

            Hii_d = Hii * (1.0 + lam * jnp.eye(6)[None])
            ok_img = frame_valid & (jnp.einsum("mii->m", Hii) > 0)
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
            r_i = bi - jnp.einsum("mki,k->mi", Hki, x_keep, precision=HI)
            x_img = jnp.einsum("mij,mj->mi", inv_Hii, r_i, precision=HI)
            return x_keep, x_img, cost, count

        def cost_fn(*args):
            st = state_of(args[:ns])
            frame_scene, frame_valid, present, vis, obs_scale = (
                args[ns:ns + 5])
            pyramids, dpyr, icp = split(args[ns + 5:])
            params, extr_q, extr_t, corr_q, corr_t, pose_q, pose_t = st
            p2 = _local_view(self.pack, frame_scene, frame_valid, present,
                             pyramids, dpyr, icp)

            def one(i):
                c_f = jnp.asarray(0.0)
                n_f = jnp.asarray(0, jnp.int32)
                for c in range(n_cams):
                    image_pyr = [lvl[i, c] for lvl in pyramids]
                    cc, nn = _cost_one(p2, c, params[c], corr_q, corr_t,
                                       extr_q, extr_t, pose_q[i], pose_t[i],
                                       frame_scene[i], image_pyr, vis[i, c],
                                       obs_scale[i, c])
                    pres = present[i, c].astype(jnp.float32)
                    c_f = c_f + pres * cc
                    n_f = n_f + nn * present[i, c]
                if dpyr is not None:
                    depth_pyr = [lvl[i] for lvl in dpyr]
                    cd, _ = _depth_cost_one(
                        p2, params[0], corr_q, corr_t, pose_q[i], pose_t[i],
                        frame_scene[i], depth_pyr, vis[i, 0],
                        obs_scale[i, 0])
                    c_f = c_f + pack.depth_weight * cd
                return c_f, n_f

            costs, counts = jax.lax.map(one, jnp.arange(frame_scene.shape[0]))
            _, _, c_icp = _icp_local(p2, corr_q, corr_t)
            return (jax.lax.psum(jnp.sum(costs) + c_icp, axes),
                    jax.lax.psum(jnp.sum(counts), axes))

        pyr_specs = tuple(spec_i for _ in range(n_lvls))
        dpyr_specs = tuple(spec_i for _ in range(n_dlvls))
        icp_specs = tuple(spec_i for _ in range(8))
        # params/extr/corr are replicated; the per-frame ref poses are
        # SHARDED (each device owns its frames' poses)
        st_specs = tuple(rep for _ in range(ns - 2)) + (spec_i, spec_i)
        self._vis_jit = jax.jit(jax.shard_map(
            vis_fn, mesh=mesh,
            in_specs=st_specs + (spec_i, spec_i, spec_i) + pyr_specs
            + dpyr_specs,
            out_specs=(spec_i, spec_i), check_vma=False))
        self._step_jit = jax.jit(jax.shard_map(
            step_fn, mesh=mesh,
            in_specs=st_specs + (rep, spec_i, spec_i, spec_i, spec_i,
                                 spec_i) + pyr_specs + dpyr_specs
            + icp_specs,
            out_specs=(rep, spec_i, rep, rep), check_vma=False))
        self._cost_jit = jax.jit(jax.shard_map(
            cost_fn, mesh=mesh,
            in_specs=st_specs + (spec_i, spec_i, spec_i, spec_i, spec_i)
            + pyr_specs + dpyr_specs + icp_specs,
            out_specs=(rep, rep), check_vma=False))

    def _state_args(self, state):
        return tuple(state["params"]) + (
            state["extr_q"], state["extr_t"], state["corr_q"],
            state["corr_t"], state["pose_q"], state["pose_t"])

    def _pyr_args(self):
        p = self.pack
        d = tuple(p.depth_pyramids) if (
            p.depth_pyramids is not None and p.depth_weight > 0) else ()
        return tuple(p.pyramids) + d

    def _icp_args(self):
        p = self.pack
        return (p.icp_ps, p.icp_ns, p.icp_pt, p.icp_nt, p.icp_w,
                p.icp_scene, p.icp_src_s, p.icp_tgt_s)

    def visibility(self, state):
        p = self.pack
        return self._vis_jit(*self._state_args(state), p.frame_scene,
                             p.frame_valid, p.present, *self._pyr_args())

    def step(self, state, vis, obs_scale, lam: float):
        p = self.pack
        return self._step_jit(*self._state_args(state),
                              jnp.asarray(lam, jnp.float32),
                              p.frame_scene, p.frame_valid, p.present, vis,
                              obs_scale, *self._pyr_args(),
                              *self._icp_args())

    def cost(self, state, vis, obs_scale):
        p = self.pack
        return self._cost_jit(*self._state_args(state), p.frame_scene,
                              p.frame_valid, p.present, vis, obs_scale,
                              *self._pyr_args(), *self._icp_args())


def _depth_expand(pack: RigJointPack, si):
    """Expansion for the depth rows' compact layout [P_0 | 6*s_max]: the
    slot-0 expand without its (absent) extr columns."""
    E = pack.expand_c[0][si]
    return E  # slot 0 never has extr columns; layout matches


def apply_rig_delta(pack: RigJointPack, state, x_keep, x_img):
    """Apply a solved step with the exp(-delta) convention to intrinsics,
    rig extrinsics, scan corrections and reference poses."""
    from dataset_pipeline_tpu.icp.moments import quat_mul_np, se3_exp_np
    from dataset_pipeline_tpu.models.lie import quat_to_matrix_np

    x_keep = np.asarray(x_keep, np.float64)
    x_img = np.asarray(x_img, np.float64)
    new = dict(state)
    params = list(state["params"])
    for c in range(pack.n_cams):
        if pack.p_len[c]:
            o = pack.p_off[c]
            params[c] = state["params"][c] - jnp.asarray(
                x_keep[o:o + pack.p_len[c]], jnp.float32)
    new["params"] = tuple(params)

    extr_q = np.asarray(state["extr_q"], np.float64)
    extr_t = np.asarray(state["extr_t"], np.float64)
    for c in range(1, pack.n_cams):
        o = pack.extr_off + 6 * (c - 1)
        dq, dt = se3_exp_np(-x_keep[o:o + 6])
        Rd = quat_to_matrix_np(dq)
        extr_t[c] = Rd @ extr_t[c] + dt
        qn = quat_mul_np(dq, extr_q[c])
        extr_q[c] = qn / np.linalg.norm(qn)
    new["extr_q"] = jnp.asarray(extr_q, jnp.float32)
    new["extr_t"] = jnp.asarray(extr_t, jnp.float32)

    corr_q = np.asarray(state["corr_q"], np.float64)
    corr_t = np.asarray(state["corr_t"], np.float64)
    for si in range(pack.n_scenes):
        for s in range(pack.s_max):
            c = pack.scan_col_np[si, s]
            if c < 0:
                continue
            o = pack.scan_off + 6 * c
            dq, dt = se3_exp_np(-x_keep[o:o + 6])
            Rd = quat_to_matrix_np(dq)
            corr_t[si, s] = Rd @ corr_t[si, s] + dt
            qn = quat_mul_np(dq, corr_q[si, s])
            corr_q[si, s] = qn / np.linalg.norm(qn)
    new["corr_q"] = jnp.asarray(corr_q, jnp.float32)
    new["corr_t"] = jnp.asarray(corr_t, jnp.float32)

    d_img = SE3.exp(jnp.asarray(-x_img, jnp.float32))
    poses = d_img.compose(SE3(state["pose_q"], state["pose_t"]))
    new["pose_q"] = poses.q
    new["pose_t"] = poses.t
    return new


def run_rig_joint_ba(pack: RigJointPack, **kw):
    """LM driver over the rig system (reuses ``run_joint_ba``'s loop)."""
    from dataset_pipeline_tpu.parallel.joint_ba import run_joint_ba

    system = RigJointBASystem(pack, kw.pop("current_scale", 0.0))
    state = make_rig_state(pack)
    return run_joint_ba(pack, system=system, state=state,
                        apply_fn=apply_rig_delta, **kw)
