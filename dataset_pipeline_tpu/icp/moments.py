"""Moment-matrix (monomial Gram) formulation of the symmetric
point-to-plane Gauss-Newton normal equations.

Key identity: for a correspondence with LOCAL-frame source/target points
and normals ``ps, ns, pt, nt`` under cloud poses ``(R_s, t_s), (R_t, t_t)``,
every entry of the stacked residual/Jacobian row pair (the reference's
``PointToPlaneICPImpl::Accumulate`` math,
``/root/reference/src/icp/icp_point_to_plane_impl.h:129-211``) is LINEAR in
the 42 pose-independent monomials

    m = sqrt(w) * [ns, nt, vec(ps x ns), vec(pt x ns), vec(ps x nt), vec(pt x nt)]

(outer products, row-major).  Hence with the augmented rows ``A1, A2``
(Jacobian blocks + residual, see ``ops/pallas_gn.py``) written as
``A1 = M1(pose) @ m`` per correspondence,

    H_aug = sum_i A1_i A1_i^T + A2_i A2_i^T
          = M1 P M1^T + M2 P M2^T,   with  P = sum_i m_i m_i^T.

``P`` (48x48 padded) does not depend on the poses: it is accumulated ONCE
per correspondence set (one MXU pass over the data), after which EVERY
inner LM iteration -- H, b, cost evaluation included -- costs a few
(6C+1)x48 matrix products on the host in float64.  This replaces the
reference's per-iteration O(M) accumulation (``impl.h:217-291`` re-runs
``Accumulate`` every lambda trial) with O(1) per-iteration work, and is
numerically *better*: the ``R^T R = I`` cancellations are applied
analytically and the final products run in f64.

Monomial row layout (48 rows, zero-padded from 42) — Kronecker block order,
chosen so the kernel builds it with six sublane-broadcast multiplies of the
(6, CH) block ``b = [sns; snt]`` instead of 36 scalar-row products:
    0:6                 b = [sqrt(w)*ns (3), sqrt(w)*nt (3)]
    6+6k : 12+6k        a_k * b,  a = (ps_0, ps_1, ps_2, pt_0, pt_1, pt_2)
i.e. ps_i*sns_j at 6+6i+j, ps_i*snt_j at 9+6i+j,
     pt_i*sns_j at 24+6i+j, pt_i*snt_j at 27+6i+j.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MONO_ROWS = 48  # 42 monomials padded to a multiple of 8 sublanes

# index arrays into the 42 monomials for each outer-product family,
# flattened row-major over (i, j)
_I6 = np.arange(3)
IDX_PS_SNS = (6 + 6 * _I6[:, None] + _I6[None, :]).reshape(9)
IDX_PS_SNT = (9 + 6 * _I6[:, None] + _I6[None, :]).reshape(9)
IDX_PT_SNS = (24 + 6 * _I6[:, None] + _I6[None, :]).reshape(9)
IDX_PT_SNT = (27 + 6 * _I6[:, None] + _I6[None, :]).reshape(9)


@partial(jax.jit, static_argnames=())
def monomials_xla(ps, ns, pt, nt, w):
    """(M, 42) monomial matrix (XLA path, used on CPU and in tests)."""
    sw = jnp.sqrt(w)[:, None]
    b = jnp.concatenate([ns * sw, nt * sw], axis=1)  # (M, 6)
    a = jnp.concatenate([ps, pt], axis=1)  # (M, 6)
    prod = (a[:, :, None] * b[:, None, :]).reshape(a.shape[0], 36)
    return jnp.concatenate([b, prod], axis=1)


@partial(jax.jit, static_argnames=())
def moment_gram_xla(ps, ns, pt, nt, w):
    """P = sum m m^T for one correspondence group (42x42, f32-HIGHEST)."""
    m = monomials_xla(ps, ns, pt, nt, w)
    return jax.lax.dot_general(
        m, m, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _skew(v):
    return np.asarray([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ])


def group_row_maps(Rs, ts, Rt, tt):
    """Linear maps from the 42 monomials to the two augmented row vectors.

    Returns (J1, r1, J2, r2): J* (6, 42) map to the 6-dof Jacobian vectors
    ``j1 = [Ns, Pt x Ns]`` / ``j2 = [Nt, Ps x Nt]`` in the GLOBAL frame,
    r* (42,) map to the residuals ``r1 = Ns.(Pt-Ps)``, ``r2 = Nt.(Ps-Pt)``.
    All f64.
    """
    Rs = np.asarray(Rs, np.float64)
    Rt = np.asarray(Rt, np.float64)
    ts = np.asarray(ts, np.float64)
    tt = np.asarray(tt, np.float64)

    # cross products of columns: cc[a, e*3+f] = (Rt[:,e] x Rs[:,f])_a
    def col_cross(A, B):
        c = np.cross(A.T[:, None, :], B.T[None, :, :])  # (e, f, a)
        return c.reshape(9, 3).T  # (3, 9)

    eye9 = np.eye(3).reshape(9)
    J1 = np.zeros((6, 42))
    J1[0:3, 0:3] = Rs                       # Ns on ns
    J1[3:6, 0:3] = _skew(tt) @ Rs           # (t_t x Ns) on ns
    J1[3:6, IDX_PT_SNS] = col_cross(Rt, Rs)  # (R_t pt x R_s ns) on pt (x) ns
    r1 = np.zeros(42)
    r1[0:3] = Rs.T @ (tt - ts)              # Ns.(t_t - t_s) on ns
    r1[IDX_PS_SNS] = -eye9                  # -ps.ns  (R_s^T R_s = I)
    # (Rt.T @ Rs)[e, f] = Rt[:,e].Rs[:,f]  -> row-major e*3+f
    r1[IDX_PT_SNS] = (Rt.T @ Rs).reshape(9)
    J2 = np.zeros((6, 42))
    J2[0:3, 3:6] = Rt
    J2[3:6, 3:6] = _skew(ts) @ Rt
    J2[3:6, IDX_PS_SNT] = col_cross(Rs, Rt)  # (R_s ps x R_t nt) on ps (x) nt
    r2 = np.zeros(42)
    r2[3:6] = Rt.T @ (ts - tt)
    r2[IDX_PT_SNT] = -eye9
    r2[IDX_PS_SNT] = (Rs.T @ Rt).reshape(9)
    return J1, r1, J2, r2


def hb_cost_from_moments(P_groups: Sequence[np.ndarray],
                         group_pairs: Sequence[Tuple[int, int]],
                         q: np.ndarray, t: np.ndarray,
                         num_clouds: int):
    """H (6C,6C), b (6C,), cost from per-group moment matrices. All f64.

    ``q`` (C,4) wxyz, ``t`` (C,3): per-cloud correction poses (the transform
    applied on top of the stored global poses, exactly as in
    ``_icp_hb_cost``).
    """
    from dataset_pipeline_tpu.models.lie import quat_to_matrix_np

    C = num_clouds
    n = 6 * C
    G = np.zeros((n + 1, n + 1))
    Rs_all = [quat_to_matrix_np(np.asarray(q[c], np.float64)) for c in range(C)]
    for P, (s, tg) in zip(P_groups, group_pairs):
        P = np.asarray(P, np.float64)[:42, :42]
        J1, r1, J2, r2 = group_row_maps(Rs_all[s], t[s], Rs_all[tg], t[tg])
        A1 = np.zeros((n + 1, 42))
        A1[6 * s:6 * s + 6] = -J1
        A1[6 * tg:6 * tg + 6] += J1
        A1[n] = r1
        A2 = np.zeros((n + 1, 42))
        A2[6 * s:6 * s + 6] = J2
        A2[6 * tg:6 * tg + 6] += -J2
        A2[n] = r2
        G += A1 @ P @ A1.T + A2 @ P @ A2.T
    return G[:n, :n], G[:n, n], G[n, n]


def _group_row_maps_jax(Rs, ts, Rt, tt):
    """jnp twin of :func:`group_row_maps` (f32, traceable): linear maps from
    the 42 monomials to the augmented row pair."""
    def col_cross(A, B):
        c = jnp.cross(A.T[:, None, :], B.T[None, :, :])  # (e, f, a)
        return c.reshape(9, 3).T

    def skew(v):
        return jnp.asarray([[0.0, -v[2], v[1]],
                            [v[2], 0.0, -v[0]],
                            [-v[1], v[0], 0.0]])

    eye9 = jnp.eye(3).reshape(9)
    J1 = jnp.zeros((6, 42))
    J1 = J1.at[0:3, 0:3].set(Rs)
    J1 = J1.at[3:6, 0:3].set(skew(tt) @ Rs)
    J1 = J1.at[3:6, IDX_PT_SNS].set(col_cross(Rt, Rs))
    r1 = jnp.zeros(42)
    r1 = r1.at[0:3].set(Rs.T @ (tt - ts))
    r1 = r1.at[IDX_PS_SNS].set(-eye9)
    r1 = r1.at[IDX_PT_SNS].set((Rt.T @ Rs).reshape(9))
    J2 = jnp.zeros((6, 42))
    J2 = J2.at[0:3, 3:6].set(Rt)
    J2 = J2.at[3:6, 3:6].set(skew(ts) @ Rt)
    J2 = J2.at[3:6, IDX_PS_SNT].set(col_cross(Rs, Rt))
    r2 = jnp.zeros(42)
    r2 = r2.at[3:6].set(Rt.T @ (ts - tt))
    r2 = r2.at[IDX_PT_SNT].set(-eye9)
    r2 = r2.at[IDX_PS_SNT].set((Rs.T @ Rt).reshape(9))
    return J1, r1, J2, r2


def hb_cost_from_moments_jax(P, group_pairs, q, t, num_clouds: int):
    """On-device H,b,cost from stacked (G,48,48) moment matrices — lets the
    whole inner LM schedule run as ONE dispatch (``lax.scan`` over
    iterations) with O(1) per-iteration flops. ``group_pairs`` is static.

    Vectorized over groups: each group's augmented Gram ``A P A^T`` only
    touches the (s,s),(s,t),(t,s),(t,t) blocks plus the b column and cost
    scalar, so we batch the compact 7x7 Grams ``B P B^T`` with
    ``B = [J; r]`` over all G groups (one batched MXU contraction instead of
    an unrolled Python loop — 10 scans give G=90 groups) and scatter-add
    the 6x6 blocks.
    """
    from dataset_pipeline_tpu.models.lie import quat_to_matrix

    C = num_clouds
    pairs = np.asarray(group_pairs, np.int64)
    s_idx = jnp.asarray(pairs[:, 0])
    t_idx = jnp.asarray(pairs[:, 1])
    R = quat_to_matrix(q)
    J1, r1, J2, r2 = jax.vmap(_group_row_maps_jax)(
        R[s_idx], t[s_idx], R[t_idx], t[t_idx])
    hi = jax.lax.Precision.HIGHEST
    B1 = jnp.concatenate([J1, r1[:, None, :]], axis=1)  # (G, 7, 42)
    B2 = jnp.concatenate([J2, r2[:, None, :]], axis=1)
    Pg = P[:, :42, :42]
    S1 = jnp.matmul(jnp.matmul(B1, Pg, precision=hi),
                    jnp.swapaxes(B1, -1, -2), precision=hi)  # (G, 7, 7)
    S2 = jnp.matmul(jnp.matmul(B2, Pg, precision=hi),
                    jnp.swapaxes(B2, -1, -2), precision=hi)
    # A1 rows: block s = -J1, block t = +J1, last row r1 (A2: s=+J2, t=-J2)
    Hblk = S1[:, :6, :6] + S2[:, :6, :6]
    bs = -S1[:, :6, 6] + S2[:, :6, 6]
    cost = jnp.sum(S1[:, 6, 6] + S2[:, 6, 6])
    Hq = jnp.zeros((C, C, 6, 6))
    Hq = Hq.at[s_idx, s_idx].add(Hblk)
    Hq = Hq.at[t_idx, t_idx].add(Hblk)
    Hq = Hq.at[s_idx, t_idx].add(-Hblk)
    Hq = Hq.at[t_idx, s_idx].add(-jnp.swapaxes(Hblk, -1, -2))
    H = Hq.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    b = jnp.zeros((C, 6)).at[s_idx].add(bs).at[t_idx].add(-bs)
    return H, b.reshape(-1), cost


def se3_exp_np(tangent):
    """f64 host twin of ``SE3.exp`` ([u, w] -> (q wxyz, t), Sophus V(w)u)."""
    tangent = np.asarray(tangent, np.float64)
    u, w = tangent[:3], tangent[3:]
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        q = np.asarray([1.0, 0.5 * w[0], 0.5 * w[1], 0.5 * w[2]])
        q /= np.linalg.norm(q)
        K = _skew(w)
        V = np.eye(3) + 0.5 * K + K @ K / 6.0
    else:
        axis = w / theta
        q = np.concatenate([[np.cos(theta / 2)], np.sin(theta / 2) * axis])
        K = _skew(w)
        V = (np.eye(3) + (1 - np.cos(theta)) / theta**2 * K
             + (theta - np.sin(theta)) / theta**3 * (K @ K))
    return q, V @ u


def quat_mul_np(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.asarray([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def icp_lm_from_moments(P_groups, group_pairs, num_clouds: int,
                        max_iterations: int = 150,
                        convergence_threshold: float = 1e-7,
                        lam0: float = 0.1, center=None, cost_fn=None,
                        trunc_rel: float = 1e-4, basis=None,
                        cost_batch_fn=None, cost_floor_rel: float = 0.0,
                        cost_floor_abs: float = 0.0):
    """The ENTIRE inner LM loop from precomputed moment matrices.

    Mirrors ``PointToPlaneICPImpl::compute``
    (``/root/reference/src/icp/icp_point_to_plane_impl.h:217-291``): damped
    solve over the gauge-fixed system (cloud 0 excluded), accept iff cost
    decreases, lambda halve/double with 10 tries, stop when no update
    applies or |x| < threshold.  All math f64 on host; per-iteration cost is
    O(groups * 42^2) regardless of correspondence count.

    ``center``: if the moment matrices were accumulated from CENTERED
    correspondences (points minus ``center`` — the f32-precision guard for
    far-from-origin clouds), pass it here: the state stays the GLOBAL
    correction, H,b are evaluated at the conjugated centered state and
    converted back to the ORIGIN tangent basis with the exact block map
    G^-1 = [[I,0],[ [c]x, I ]] per cloud, so the damped LM trajectory is
    IDENTICAL to the uncentered algorithm (damping is basis-dependent) —
    only the accumulation precision differs.

    ``cost_fn(q, t) -> float``: exact accept-test cost. The moment-form
    cost carries an ABSOLUTE f32 noise floor of ~1e-7 * ||P|| (it can even
    go negative near the optimum), which breaks accept/reject once the true
    cost falls below it; a direct residual evaluation is RELATIVELY
    accurate there. H,b always come from the moments (1e-7 relative). When
    omitted, the moment cost is used (fine far from convergence, e.g. the
    fused bench schedule).

    ``trunc_rel``: steps along eigendirections of the gauge-fixed H with
    curvature below ``trunc_rel * lambda_max`` are ZEROED. In the direct
    accumulation a null direction (e.g. in-plane rotation of a plane) has
    exactly zero gradient/curvature so LM never moves there; in the moment
    form both are ~1e-7*||H|| noise, and undamped null components would
    random-walk. Genuinely small-curvature directions are polished by the
    caller's exact direct finisher.

    ``basis``: optional (n_var, k) f64 orthonormal columns; when given,
    steps are confined EXACTLY to span(basis) (and ``trunc_rel`` is
    ignored). The caller derives it from one DIRECTLY-accumulated H, whose
    structural zeros are exact — this removes the residual eigenvector
    leakage of truncating the noisy moment H itself.

    ``cost_batch_fn(q_batch (K,C,4), t_batch (K,C,3)) -> (K,) costs``:
    when given, the whole 10-candidate lambda ladder of each iteration is
    evaluated in ONE batched call (one device dispatch) and the FIRST
    improving candidate is accepted — trajectory-identical to the
    sequential ladder (H, b are fixed within it) at 1 dispatch/iteration
    instead of one per try.

    Returns (q (C,4) f64, t (C,3) f64, final_cost).
    """
    from dataset_pipeline_tpu.models.lie import quat_to_matrix_np

    C = num_clouds
    q = np.tile(np.asarray([1.0, 0, 0, 0]), (C, 1))
    t = np.zeros((C, 3))
    lam = lam0
    n_var = 6 * (C - 1)

    if center is not None:
        center = np.asarray(center, np.float64)
        Ginv_blk = np.eye(6)
        Ginv_blk[3:6, 0:3] = _skew(center)
        Ginv = np.kron(np.eye(C), Ginv_blk)

    def eval_G(q_, t_):
        if center is None:
            return hb_cost_from_moments(P_groups, group_pairs, q_, t_, C)
        # conjugate the global correction into the centered frame:
        # X' = T_{-c} X T_{c}  =>  R' = R, t' = R c + t - c
        tc = np.stack([quat_to_matrix_np(q_[e]) @ center + t_[e] - center
                       for e in range(C)])
        Hc, bc, cost = hb_cost_from_moments(P_groups, group_pairs, q_, tc, C)
        return Ginv @ Hc @ Ginv.T, Ginv @ bc, cost

    if cost_fn is None:
        cost_fn = lambda q_, t_: eval_G(q_, t_)[2]  # noqa: E731

    H, b, _ = eval_G(q, t)
    cost = cost_fn(q, t)
    cost0 = max(abs(cost), 1e-30)
    if n_var == 0:
        return q, t, cost
    if basis is not None and basis.shape[1] == 0:
        return q, t, cost  # fully rank-deficient: nothing the LM may move
    # the RELATIVE floor never triggers when the phase STARTS near
    # convergence; the ABSOLUTE floor (tied by the caller to ~1e-7*||P||,
    # the f32 moment noise) covers that case — running past it would make
    # the ladder accept noise steps the exact finisher must undo
    floor = max(cost_floor_rel * cost0, cost_floor_abs)
    if cost_floor_abs > 0.0 and abs(cost) < cost_floor_abs:
        return q, t, cost

    for _ in range(max_iterations):
        Hv, bv = H[6:, 6:], b[6:]
        if basis is not None:
            Hp = basis.T @ Hv @ basis
            bp = basis.T @ bv
            k = basis.shape[1]
        else:
            try:
                evals, V = np.linalg.eigh(0.5 * (Hv + Hv.T))
            except np.linalg.LinAlgError:
                break
            lam_max = max(float(evals.max()), 1e-30)
            keep = evals > trunc_rel * lam_max
            bb = V.T @ bv
        def solve_at(lam_k):
            if basis is not None:
                try:
                    xp = np.linalg.solve(Hp + lam_k * np.eye(k), bp)
                except np.linalg.LinAlgError:
                    return None
                return basis @ xp
            return V @ np.where(keep, bb / (evals + lam_k), 0.0)

        def apply_x(x):
            qc = q.copy()
            tc = t.copy()
            for c in range(1, C):
                dq, dt = se3_exp_np(np.concatenate([
                    -x[6 * (c - 1):6 * (c - 1) + 3],
                    -x[6 * (c - 1) + 3:6 * c]]))
                Rd = quat_to_matrix_np(dq)
                qc[c] = quat_mul_np(dq, q[c])
                qc[c] /= np.linalg.norm(qc[c])
                tc[c] = Rd @ t[c] + dt
            return qc, tc

        applied = False
        x = None
        if cost_batch_fn is not None:
            # whole ladder in ONE dispatch; accept the first improvement
            lams = [lam * (2.0 ** j) for j in range(10)]
            cands = [solve_at(lj) for lj in lams]
            states = [apply_x(xj) if xj is not None else None for xj in cands]
            qs = np.stack([s[0] if s is not None else q for s in states])
            ts = np.stack([s[1] if s is not None else t for s in states])
            costs = np.asarray(cost_batch_fn(qs, ts), np.float64)
            costs = np.where([s is None for s in states], np.inf, costs)
            hit = next((j for j in range(10) if costs[j] < cost), None)
            if hit is None:
                lam = lams[-1] * 2.0
            else:
                x = cands[hit]
                q, t = states[hit]
                cost = float(costs[hit])
                H, b, _ = eval_G(q, t)
                lam = lams[hit] * 0.5
                applied = True
        else:
            for _ in range(10):
                x = solve_at(lam)
                if x is None:
                    lam *= 2.0
                    continue
                qc, tc = apply_x(x)
                new_cost = cost_fn(qc, tc)
                if new_cost < cost:
                    q, t, cost = qc, tc, new_cost
                    H, b, _ = eval_G(q, t)
                    lam *= 0.5
                    applied = True
                    break
                lam *= 2.0
        if not applied:
            break
        if floor > 0.0 and abs(cost) < floor:
            # the moment-form cost is approaching its noise floor
            # (~1e-7 * ||P|| absolute): stop the accelerated phase and hand
            # over to the caller's exact finisher
            break
        if x is not None and np.linalg.norm(x) < convergence_threshold:
            break
    return q, t, cost


def _tri_sub_for_chunk(chunk: int) -> int:
    """Largest valid sub-tile for ``icp_moment_pallas_tri_sub``: the kernel
    requires ``sub % 128 == 0`` and ``chunk % (3 * sub) == 0``; prefer the
    VMEM-sized 8192 when it divides, else the largest 128-multiple divisor
    of ``chunk // 3`` (advisor round-4: the old ``chunk // 3`` fallback
    produced invalid subs for any chunk not divisible by 384)."""
    if chunk % 384 != 0:
        raise ValueError(
            "moment chunk must be a multiple of 384 (three 128-lane "
            f"sub-tiles per contraction); got {chunk}")
    m = chunk // 384  # chunk // 3 == 128 * m
    for d in range(min(m, 64), 0, -1):  # 128 * 64 == 8192 VMEM tile cap
        if m % d == 0:
            return 128 * d
    return 128


def pack_group_data(groups, chunk: int = 16384, rows: int = 16):
    """Pack per-group correspondence arrays into the fused (rows, Mp) layout
    with each group padded to a chunk multiple (padding rows have w=0 and
    thus vanish from the Gram).

    ``groups``: list of dicts with ps/ns/pt/nt (Mg,3) float32 arrays and
    optional 'w'.  Returns (data (rows, Mp) np.float32, chunk_gid (grid,)
    int32 mapping each chunk to its group). ``rows=13`` drops the three
    zero padding rows of the original 16-row layout (the tri moment kernel
    reads rows 0-12 only; 18.75% less HBM traffic).
    """
    assert rows in (13, 16), rows
    blocks = []
    chunk_gid = []
    for gi, g in enumerate(groups):
        Mg = len(g["ps"])
        pad = (-Mg) % chunk
        Mp = Mg + pad
        d = np.zeros((rows, Mp), np.float32)
        d[0:3, :Mg] = g["ps"].T
        d[3:6, :Mg] = g["ns"].T
        d[6:9, :Mg] = g["pt"].T
        d[9:12, :Mg] = g["nt"].T
        d[12, :Mg] = g.get("w", np.ones(Mg, np.float32))
        blocks.append(d)
        chunk_gid.extend([gi] * (Mp // chunk))
    data = np.concatenate(blocks, axis=1)
    return data, np.asarray(chunk_gid, np.int32)


def compute_group_moments_from_packed(data_dev, chunk_gid, n_groups: int,
                                      chunk: int = 49152):
    """Per-group 42x42 f64 moment matrices from an ALREADY-UPLOADED packed
    (16, Mp) device tensor (``pack_group_data`` layout, per-group padded) —
    the engine path: one upload serves both the fused H,b/cost kernel and
    the moment pass (a second 0.5 GB host->device transfer through the
    relay would cost seconds)."""
    from dataset_pipeline_tpu.ops.pallas_gn import (
        icp_moment_pallas_tri_sub,
        moment_tri_extract,
    )

    sub = _tri_sub_for_chunk(chunk)
    parts = np.asarray(
        icp_moment_pallas_tri_sub(data_dev, chunk=chunk, sub=sub),
        np.float64)
    parts = moment_tri_extract(parts)
    return [parts[chunk_gid == gi].sum(0) for gi in range(n_groups)]


def compute_group_moments(groups, chunk: int = 49152,
                          force_xla: bool = False) -> List[np.ndarray]:
    """Per-group 42x42 moment matrices, f64 on host.

    On TPU: single Pallas dispatch of the MXU-filling tri kernel
    (``ops/pallas_gn.py:icp_moment_pallas_tri_sub`` — three 42-row monomial
    groups of column-thirds per 128-wide contraction) producing per-chunk
    partial Grams, summed on host in f64 (better than sequential f32
    accumulation). On CPU: one XLA HIGHEST-precision Gram per group.
    """
    if force_xla or jax.default_backend() == "cpu":
        out = []
        for g in groups:
            w = g.get("w")
            if w is None:
                w = np.ones(len(g["ps"]), np.float32)
            P = moment_gram_xla(jnp.asarray(g["ps"]), jnp.asarray(g["ns"]),
                                jnp.asarray(g["pt"]), jnp.asarray(g["nt"]),
                                jnp.asarray(w))
            out.append(np.asarray(P, np.float64))
        return out

    from dataset_pipeline_tpu.ops.pallas_gn import (
        icp_moment_pallas_tri_sub,
        moment_tri_extract,
    )

    sub = _tri_sub_for_chunk(chunk)
    data, chunk_gid = pack_group_data(groups, chunk)
    parts = np.asarray(
        icp_moment_pallas_tri_sub(jnp.asarray(data), chunk=chunk, sub=sub),
        np.float64)  # (grid, 128, 128)
    parts = moment_tri_extract(parts)  # (grid, 42, 42)
    out = []
    for gi in range(len(groups)):
        out.append(parts[chunk_gid == gi].sum(0))
    return out
