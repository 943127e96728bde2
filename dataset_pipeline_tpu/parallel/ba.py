"""Sharded joint scan+image bundle adjustment with Schur elimination.

The multi-host north-star component (BASELINE.json): scans and image
keyframes of several scenes are optimized JOINTLY — variables are a small
"kept" block (intrinsics + scan poses, shared structure) plus one 6-dof block
per image. Residual rows (ICP correspondences and photometric observations)
are sharded over a device mesh; each device accumulates its partial normal
equations, ``psum`` reduces them over ICI, the per-image 6x6 diagonal blocks
are eliminated on-device (the classic reduced-camera-system Schur step — here
images play the role of points since the scan geometry provides structure),
and the small reduced system is solved replicated.

No reference counterpart exists (the reference is single-node with a dense
LDLT, ``opt/intrinsics_and_pose_optimizer.cc:217-219`` notes Schur as future
work); designed from the mesh/collective model.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def schur_eliminate_images(H, b, n_keep: int, num_images: int, lam=0.0):
    """Eliminate trailing per-image 6x6 blocks from the damped system.

    H: (n_keep + 6m, n_keep + 6m), b matching. Returns (S, rhs, back) where
    ``back(x_keep) -> x_images (m,6)`` completes the solution.
    """
    m = num_images
    Hkk = H[:n_keep, :n_keep]
    Hki = H[:n_keep, n_keep:]
    Hii = H[n_keep:, n_keep:]
    bk = b[:n_keep]
    bi = b[n_keep:]

    # The Schur complement cancels catastrophically; on TPU the default
    # bf16 MXU pass destroys it (CLAUDE.md precision trap), so every
    # contraction here — including inside linalg.inv — runs at HIGHEST.
    with jax.default_matmul_precision("highest"):
        # block-diagonal 6x6 part of Hii (off-diagonal image-image coupling
        # is zero by construction: no residual touches two images)
        blocks = jnp.stack(
            [Hii[6 * i : 6 * i + 6, 6 * i : 6 * i + 6] for i in range(m)])
        blocks = blocks + lam * jnp.eye(6)[None]
        inv_blocks = jnp.linalg.inv(blocks)  # (m,6,6)

        Hki_b = Hki.reshape(n_keep, m, 6)
        # W = Hki * Hii^-1, blockwise
        W = jnp.einsum("kmi,mij->kmj", Hki_b, inv_blocks)
        S = Hkk + lam * jnp.eye(n_keep) - jnp.einsum("kmi,nmi->kn", W, Hki_b)
        rhs = bk - jnp.einsum("kmi,mi->k", W, bi.reshape(m, 6))

    def back(x_keep):
        with jax.default_matmul_precision("highest"):
            r = bi.reshape(m, 6) - jnp.einsum("kmi,k->mi", Hki_b, x_keep)
            return jnp.einsum("mij,mj->mi", inv_blocks, r)

    return S, rhs, back


@lru_cache(maxsize=64)
def _sharded_hb_jit(mesh: Mesh, row_fn: Callable, axis: str, in_specs):
    """Compiled shard_map'd H,b accumulator, cached on (mesh, row_fn, axis,
    in_specs) so repeated BA steps reuse one executable instead of
    re-tracing (and re-compiling) per call."""

    def local(*inputs):
        rows, r, w = row_fn(*inputs)
        sw = jnp.sqrt(w)[:, None]
        rows_w = rows * sw
        r_w = r * sw[:, 0]
        H = jax.lax.dot_general(
            rows_w, rows_w, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        b = jnp.sum(rows_w * r_w[:, None], 0)
        cost = jnp.sum(r_w * r_w)
        return jax.lax.psum(H, axis), jax.lax.psum(b, axis), jax.lax.psum(cost, axis)

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=(P(), P(), P()), check_vma=False))


def make_sharded_hb(mesh: Mesh, row_fn: Callable, n_vars: int, axis: str = "data"):
    """Build a psum-reduced H,b accumulator over sharded residual inputs.

    ``row_fn(*shard_inputs) -> (rows (R, n_vars), r (R,), w (R,))`` evaluated
    per device on its shard; returns a function producing replicated
    (H (n_vars,n_vars), b (n_vars,), cost).

    CONSTRAINT: the compiled executable is cached on ``row_fn``'s identity
    (``_sharded_hb_jit``), so ``row_fn`` must be pure in its arguments —
    any device arrays it closes over are baked in as constants at first
    trace and silently reused on later calls. Pass varying data through
    ``inputs``, never through the closure.

    NOTE: this dense-row path is the joint BA's *validation twin*; the
    production system produces rows on-device (``parallel/joint_ba.py``).
    """

    def wrapper(*inputs, in_specs):
        return _sharded_hb_jit(mesh, row_fn, axis, tuple(in_specs))(*inputs)

    return wrapper


# ---------------------------------------------------------------------------
# Real residual-row producers
#
# The joint multi-scene BA optimizes, over several scenes sharing one camera:
#   kept block  = [intrinsics P | 6-dof tangent per free scan pose]
#   eliminated  = one 6-dof block per image (Schur)
# Rows are ACTUAL residuals: photometric descriptor rows (the same
# intensity/chain-rule math as ``photometric/optimizer._hb_core``, here with
# the additional d(intensity)/d(scan pose) chain through the moving scan
# points) and symmetric point-to-plane ICP rows between scans
# (``icp/point_to_plane._icp_hb_cost`` math). Reference: variable indexing
# ``opt/intrinsics_and_pose_optimizer.cc:442-473``; Schur named as future
# work ``.cc:70-73,217``.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("optimize_intrinsics", "num_scans"))
def photometric_row_blocks(camera, params, pose_q, pose_t, points, scan_idx,
                           neighbors, desc, image_pyr, obs_scale, contrib_mask,
                           optimize_intrinsics: bool, num_scans: int):
    """Materialized descriptor-residual rows for ONE image on one level.

    ``points`` are scan-LOCAL-in-global-frame positions; each point moves
    with its scan's left-multiplicative correction ``exp(eps_scan[s])``.
    Returns per-block row pieces for the N*K descriptor components:
    (rows_int (NK,P), rows_scan (NK,6*num_scans), rows_img (NK,6),
    r (NK,), w (NK,)) with weights already robust (Huber) and invalid
    components zeroed.
    """
    from dataset_pipeline_tpu.models.lie import SE3, quat_rotate
    from dataset_pipeline_tpu.ops.robust import DEFAULT_COLOR_HUBER, huber_weight
    from dataset_pipeline_tpu.photometric.optimizer import _intensity_ok

    def inten_of(eps_img, eps_scan, prm):
        pose = SE3.exp(eps_img).compose(SE3(pose_q, pose_t))
        corr = SE3.exp(eps_scan)  # (S,) batched correction
        pts = quat_rotate(corr.q[scan_idx], points) + corr.t[scan_idx]
        return _intensity_ok(camera, prm, pose, pts, image_pyr, obs_scale,
                             0.0, False)

    z_img = jnp.zeros(6, jnp.float32)
    z_scan = jnp.zeros((num_scans, 6), jnp.float32)
    inten, ok = inten_of(z_img, z_scan, params)
    J_img, J_scan, J_int = jax.jacfwd(
        lambda a, b, p: inten_of(a, b, p)[0], argnums=(0, 1, 2)
    )(z_img, z_scan, params)
    J_scan = J_scan.reshape(J_scan.shape[0], 6 * num_scans)

    K = neighbors.shape[1]
    all_ok = ok & jnp.all(ok[neighbors], -1) & contrib_mask
    r = (inten[neighbors] - inten[:, None]) - desc  # (N,K)
    r = jnp.where(all_ok[:, None], r, 0.0)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(r * r, -1), 1e-20))
    w = jnp.where(all_ok, huber_weight(norm, DEFAULT_COLOR_HUBER), 0.0)

    def expand(J):
        J = jnp.where(ok[:, None], J, 0.0)
        rows = J[neighbors] - J[:, None, :]  # (N,K,V)
        rows = jnp.where(all_ok[:, None, None], rows, 0.0)
        return rows.reshape(-1, J.shape[-1])

    rows_int = expand(J_int) if optimize_intrinsics else None
    w_rep = jnp.repeat(w[:, None], K, axis=1).reshape(-1)
    return (rows_int, expand(J_scan), expand(J_img), r.reshape(-1), w_rep)


@jax.jit
def icp_row_blocks(ps, ns, pt, nt, w):
    """Symmetric point-to-plane rows for global-frame correspondences
    (``icp_point_to_plane_impl.h:129-211`` math): returns
    (j_rows (2M,6), r (2M,), w (2M,)) where row m applies with sign +1 to
    the TARGET scan's block and -1 to the SOURCE scan's block for the first
    M rows, and the reverse for the second M (the tgt-normal twin)."""
    diff = pt - ps
    r1 = jnp.sum(ns * diff, -1)
    r2 = -jnp.sum(nt * diff, -1)
    j1 = jnp.concatenate([ns, jnp.cross(pt, ns)], -1)  # +tgt / -src
    j2 = jnp.concatenate([nt, jnp.cross(ps, nt)], -1)  # +src / -tgt
    return (jnp.concatenate([j1, j2], 0), jnp.concatenate([r1, r2], 0),
            jnp.concatenate([w, w], 0))


class JointScene:
    """One scene of the joint BA: a single-group PhotoProblem whose level
    points carry per-point scan indices, plus global-frame ICP
    correspondences between its scans."""

    def __init__(self, problem, level_idx: int = 0, icp=None,
                 icp_weight: float = 1.0, allow_rig: bool = False):
        # the dense row builder and joint_ba.pack_scenes take single-group
        # scenes; multi-group (rig) problems go through
        # parallel/joint_ba_rig.pack_rig_scenes, which accepts them here
        assert len(problem.groups) == 1 or any(
            g.rig_cam_index > 0 for g in problem.groups), \
            "joint BA rows: single-group or rig scenes"
        self.problem = problem
        self.level_idx = level_idx
        self.icp = icp  # (ps, ns, pt, nt, src_scan, tgt_scan) or None
        self.icp_weight = icp_weight

    @property
    def num_scans(self) -> int:
        lv = self.problem.levels[self.level_idx]
        return int(np.asarray(lv.scan_indices).max()) + 1

    @property
    def num_images(self) -> int:
        return self.problem.groups[0].num_images


def build_joint_rows(scenes: List[JointScene], obs_scale: float = 0.0,
                     optimize_intrinsics: bool = True,
                     fix_first_scan: bool = True):
    """Assemble the full joint row system over all scenes.

    Layout: [shared intrinsics P | 6 per FREE scan (scene-major; each
    scene's first scan gauge-fixed when ``fix_first_scan``) | 6 per image
    (scene-major)]. Returns (rows (R, n_vars) f32, r (R,), w (R,), n_keep,
    num_images) as numpy arrays ready for sharding.
    """
    cam = scenes[0].problem.groups[0].camera
    n_int = len(np.asarray(cam.params)) if optimize_intrinsics else 0
    scan_cols = []
    col = n_int
    for sc in scenes:
        start = 1 if fix_first_scan else 0
        cols = {}
        for s in range(sc.num_scans):
            if s < start:
                cols[s] = -1
            else:
                cols[s] = col
                col += 6
        scan_cols.append(cols)
    n_keep = col
    # image columns: scene-major running index
    img_base = []
    m = 0
    for sc in scenes:
        img_base.append(n_keep + 6 * m)
        m += sc.num_images
    n_vars = n_keep + 6 * m

    all_rows, all_r, all_w = [], [], []
    for si, sc in enumerate(scenes):
        g = sc.problem.groups[0]
        lv = sc.problem.levels[sc.level_idx]
        S = sc.num_scans
        scan_idx = jnp.asarray(np.asarray(lv.scan_indices), jnp.int32)
        n_pts = lv.points.shape[0]
        contrib = jnp.ones(n_pts, bool)
        scale = jnp.full((n_pts,), obs_scale, jnp.float32)
        for i in range(g.num_images):
            image_pyr = [lvl[i] for lvl in g.pyramid]
            rint, rscan, rimg, r, w = photometric_row_blocks(
                g.camera, g.camera.params, g.poses.q[i], g.poses.t[i],
                lv.points, scan_idx, lv.neighbors, lv.fixed_descriptors,
                image_pyr, scale, contrib, optimize_intrinsics, S)
            r = np.asarray(r)
            w = np.asarray(w)
            keep = w > 0
            if not keep.any():
                continue
            R = int(keep.sum())
            rows = np.zeros((R, n_vars), np.float32)
            if optimize_intrinsics:
                rows[:, :n_int] = np.asarray(rint)[keep]
            rscan = np.asarray(rscan)[keep].reshape(R, S, 6)
            for s in range(S):
                c = scan_cols[si][s]
                if c >= 0:
                    rows[:, c : c + 6] = rscan[:, s]
            o = img_base[si] + 6 * i
            rows[:, o : o + 6] = np.asarray(rimg)[keep]
            all_rows.append(rows)
            all_r.append(r[keep])
            all_w.append(w[keep])
        if sc.icp is not None:
            ps, ns, pt, nt, src_scan, tgt_scan = sc.icp
            M = len(ps)
            jrows, r, w = icp_row_blocks(
                jnp.asarray(ps), jnp.asarray(ns), jnp.asarray(pt),
                jnp.asarray(nt), jnp.full((M,), sc.icp_weight, jnp.float32))
            jrows = np.asarray(jrows)
            r = np.asarray(r)
            w = np.asarray(w)
            rows = np.zeros((2 * M, n_vars), np.float32)
            src2 = np.concatenate([src_scan, tgt_scan])
            tgt2 = np.concatenate([tgt_scan, src_scan])
            for k in range(2 * M):
                ct = scan_cols[si][int(tgt2[k])]
                cs = scan_cols[si][int(src2[k])]
                if ct >= 0:
                    rows[k, ct : ct + 6] += jrows[k]
                if cs >= 0:
                    rows[k, cs : cs + 6] -= jrows[k]
            all_rows.append(rows)
            all_r.append(r)
            all_w.append(w)

    rows = np.concatenate(all_rows, 0)
    return (rows, np.concatenate(all_r, 0), np.concatenate(all_w, 0),
            n_keep, m)


def joint_ba_step(mesh: Mesh, row_fn: Callable, inputs: Tuple, in_specs,
                  n_keep: int, num_images: int, lam: float = 1e-3,
                  axis: str = "data"):
    """One damped GN step of the sharded joint BA.

    Returns (delta_keep (n_keep,), delta_images (m,6), cost). Deltas follow
    the framework convention: apply as ``exp(-delta)`` / subtract.
    """
    n_vars = n_keep + 6 * num_images
    hb = make_sharded_hb(mesh, row_fn, n_vars, axis)
    H, b, cost = hb(*inputs, in_specs=in_specs)
    S, rhs, back = schur_eliminate_images(H, b, n_keep, num_images, lam)
    with jax.default_matmul_precision("highest"):
        x_keep = jnp.linalg.solve(S, rhs)
    x_img = back(x_keep)
    return x_keep, x_img, cost
