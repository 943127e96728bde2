"""Moment-matrix GN formulation vs. direct row accumulation.

The moment path (``icp/moments.py``) must reproduce the H, b, cost of the
direct per-correspondence accumulation (``icp/point_to_plane.py:_icp_hb_cost``)
for arbitrary poses, since H_aug = sum_g M_g(pose) P_g M_g(pose)^T exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dataset_pipeline_tpu.icp.moments import (
    compute_group_moments,
    hb_cost_from_moments,
    icp_lm_from_moments,
    moment_gram_xla,
    pack_group_data,
    se3_exp_np,
)
from dataset_pipeline_tpu.icp.point_to_plane import PointToPlaneICP, _icp_hb_cost
from dataset_pipeline_tpu.models.lie import SE3, quat_to_matrix_np


def _random_groups(rng, C=3, per_group=257):
    groups, pairs, flat = [], [], {k: [] for k in ("ps", "ns", "pt", "nt", "sid", "tid", "w")}
    for s in range(C):
        for tg in range(C):
            if s == tg:
                continue
            ps = rng.randn(per_group, 3).astype(np.float32)
            ns = rng.randn(per_group, 3).astype(np.float32)
            ns /= np.linalg.norm(ns, axis=1, keepdims=True)
            pt = (ps + 0.05 * rng.randn(per_group, 3)).astype(np.float32)
            nt = rng.randn(per_group, 3).astype(np.float32)
            nt /= np.linalg.norm(nt, axis=1, keepdims=True)
            w = rng.rand(per_group).astype(np.float32)
            groups.append({"ps": ps, "ns": ns, "pt": pt, "nt": nt, "w": w})
            pairs.append((s, tg))
            for k, v in (("ps", ps), ("ns", ns), ("pt", pt), ("nt", nt), ("w", w)):
                flat[k].append(v)
            flat["sid"].append(np.full(per_group, s, np.int32))
            flat["tid"].append(np.full(per_group, tg, np.int32))
    flat = {k: np.concatenate(v) for k, v in flat.items()}
    return groups, pairs, flat


def _random_poses(rng, C):
    q = []
    t = []
    for c in range(C):
        qq, tt = se3_exp_np(0.3 * rng.randn(6))
        q.append(qq)
        t.append(tt)
    return np.stack(q), np.stack(t)


def test_moments_match_direct_hb():
    rng = np.random.RandomState(7)
    C = 3
    groups, pairs, flat = _random_groups(rng, C)
    q, t = _random_poses(rng, C)

    P = compute_group_moments(groups, force_xla=True)
    H_m, b_m, cost_m = hb_cost_from_moments(P, pairs, q, t, C)

    H_d, b_d, cost_d = _icp_hb_cost(
        jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32),
        jnp.asarray(flat["ps"]), jnp.asarray(flat["ns"]),
        jnp.asarray(flat["pt"]), jnp.asarray(flat["nt"]),
        jnp.asarray(flat["sid"]), jnp.asarray(flat["tid"]),
        jnp.asarray(flat["w"]), C)

    scale = np.abs(np.asarray(H_d)).max()
    np.testing.assert_allclose(H_m, np.asarray(H_d), atol=2e-4 * scale)
    np.testing.assert_allclose(b_m, np.asarray(b_d),
                               atol=2e-4 * np.abs(np.asarray(b_d)).max())
    np.testing.assert_allclose(cost_m, float(cost_d), rtol=2e-5)


def test_moments_jax_matches_numpy():
    from dataset_pipeline_tpu.icp.moments import hb_cost_from_moments_jax

    rng = np.random.RandomState(17)
    C = 2
    groups, pairs, _ = _random_groups(rng, C, per_group=123)
    q, t = _random_poses(rng, C)
    P = compute_group_moments(groups, force_xla=True)
    H_np, b_np, c_np = hb_cost_from_moments(P, pairs, q, t, C)
    Pj = jnp.asarray(np.stack([np.pad(p, ((0, 6), (0, 6))) for p in P]),
                     jnp.float32)
    H_j, b_j, c_j = hb_cost_from_moments_jax(
        Pj, pairs, jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32), C)
    scale = np.abs(H_np).max()
    np.testing.assert_allclose(np.asarray(H_j), H_np, atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(b_j), b_np,
                               atol=2e-4 * max(np.abs(b_np).max(), 1e-9))
    np.testing.assert_allclose(float(c_j), c_np, rtol=2e-4)


def test_moments_jax_many_groups():
    """C=6 -> 30 ordered pair groups: the batched (vmapped) group path must
    match the f64 host path without unrolling per group."""
    from dataset_pipeline_tpu.icp.moments import hb_cost_from_moments_jax

    rng = np.random.RandomState(23)
    C = 6
    groups, pairs, _ = _random_groups(rng, C, per_group=57)
    assert len(pairs) == 30
    q, t = _random_poses(rng, C)
    P = compute_group_moments(groups, force_xla=True)
    H_np, b_np, c_np = hb_cost_from_moments(P, pairs, q, t, C)
    Pj = jnp.asarray(np.stack([np.pad(p, ((0, 6), (0, 6))) for p in P]),
                     jnp.float32)
    H_j, b_j, c_j = hb_cost_from_moments_jax(
        Pj, pairs, jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32), C)
    scale = np.abs(H_np).max()
    np.testing.assert_allclose(np.asarray(H_j), H_np, atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(b_j), b_np,
                               atol=2e-4 * max(np.abs(b_np).max(), 1e-9))
    np.testing.assert_allclose(float(c_j), c_np, rtol=2e-4)


def test_batched_ladder_matches_sequential():
    """The one-dispatch lambda ladder (cost_batch_fn) must reproduce the
    sequential try loop's trajectory EXACTLY — H, b are fixed within a
    ladder, so accepting the first improving candidate is equivalent."""
    rng = np.random.RandomState(3)
    C = 3
    groups, pairs, _ = _random_groups(rng, C, per_group=301)
    P = compute_group_moments(groups, force_xla=True)

    def exact(q_, t_):
        from dataset_pipeline_tpu.icp.moments import hb_cost_from_moments

        return hb_cost_from_moments(P, pairs, q_, t_, C)[2]

    def exact_batch(qs_, ts_):
        return np.asarray([exact(np.asarray(qs_[k]), np.asarray(ts_[k]))
                           for k in range(len(qs_))])

    q_seq, t_seq, c_seq = icp_lm_from_moments(
        P, pairs, C, max_iterations=12, cost_fn=exact)
    q_bat, t_bat, c_bat = icp_lm_from_moments(
        P, pairs, C, max_iterations=12, cost_fn=exact,
        cost_batch_fn=exact_batch)
    np.testing.assert_array_equal(q_bat, q_seq)
    np.testing.assert_array_equal(t_bat, t_seq)
    assert c_bat == c_seq


def test_moment_pallas_interpret_matches_xla():
    rng = np.random.RandomState(3)
    groups, pairs, _ = _random_groups(rng, C=2, per_group=100)
    from dataset_pipeline_tpu.ops.pallas_gn import icp_moment_pallas

    chunk = 128
    data, chunk_gid = pack_group_data(groups, chunk=chunk)
    parts = np.asarray(
        icp_moment_pallas(jnp.asarray(data), chunk=chunk, interpret=True),
        np.float64)
    for gi, g in enumerate(groups):
        P_ref = np.asarray(moment_gram_xla(
            jnp.asarray(g["ps"]), jnp.asarray(g["ns"]), jnp.asarray(g["pt"]),
            jnp.asarray(g["nt"]), jnp.asarray(g["w"])), np.float64)
        P_k = parts[chunk_gid == gi, :42, :42].sum(0)
        np.testing.assert_allclose(P_k, P_ref, rtol=2e-5,
                                   atol=2e-5 * np.abs(P_ref).max())


def test_moment_tri_kernels_interpret_match_xla():
    """MXU-filling tri kernels (3 x 42-row groups of column-thirds) must
    reproduce the XLA HIGHEST Gram; covers both the plain and the
    sub-tiled-accumulator variants and the 13-row packed layout."""
    from dataset_pipeline_tpu.ops.pallas_gn import (
        icp_moment_pallas_tri,
        icp_moment_pallas_tri_sub,
        moment_tri_extract,
    )

    rng = np.random.RandomState(5)
    M = 2000
    g = {"ps": rng.randn(M, 3).astype(np.float32),
         "ns": rng.randn(M, 3).astype(np.float32),
         "pt": rng.randn(M, 3).astype(np.float32),
         "nt": rng.randn(M, 3).astype(np.float32),
         "w": rng.rand(M).astype(np.float32)}
    P_ref = np.asarray(moment_gram_xla(
        jnp.asarray(g["ps"]), jnp.asarray(g["ns"]), jnp.asarray(g["pt"]),
        jnp.asarray(g["nt"]), jnp.asarray(g["w"])), np.float64)

    for rows in (13, 16):
        chunk = 3 * 128 * 2
        data, gid = pack_group_data([g], chunk=chunk, rows=rows)
        parts = np.asarray(icp_moment_pallas_tri(
            jnp.asarray(data), chunk=chunk, interpret=True), np.float64)
        P = moment_tri_extract(parts).sum(0)
        np.testing.assert_allclose(P, P_ref, rtol=2e-5,
                                   atol=2e-5 * np.abs(P_ref).max())

        parts = np.asarray(icp_moment_pallas_tri_sub(
            jnp.asarray(data), chunk=chunk, sub=128, interpret=True),
            np.float64)
        P = moment_tri_extract(parts).sum(0)
        np.testing.assert_allclose(P, P_ref, rtol=2e-5,
                                   atol=2e-5 * np.abs(P_ref).max())


def test_moment_lm_converges_like_direct():
    """End-to-end: the default (moment) ICP matches the direct-kernel ICP on
    the 3-perturbed-clouds problem and reaches the same pose."""
    rng = np.random.RandomState(11)
    base = rng.rand(400, 3).astype(np.float32) * 2
    base[:, 2] = 0.2 * np.sin(4 * base[:, 0]) + 0.1 * np.cos(3 * base[:, 1])
    n = np.zeros_like(base)
    n[:, 2] = 1.0
    # crude analytic normals of the surface
    n[:, 0] = -0.8 * np.cos(4 * base[:, 0])
    n[:, 1] = 0.3 * np.sin(3 * base[:, 1])
    n /= np.linalg.norm(n, axis=1, keepdims=True)

    def perturbed(seed):
        r = np.random.RandomState(seed)
        dq, dt = se3_exp_np(np.concatenate([0.02 * r.randn(3), 0.02 * r.randn(3)]))
        R = quat_to_matrix_np(dq)
        return (base @ R.T + dt).astype(np.float32), (n @ R.T).astype(np.float32)

    results = []
    for use_moments in (True, False):
        icp = PointToPlaneICP(use_moments=use_moments)
        icp.add_point_cloud(base, n)
        p1, n1 = perturbed(5)
        icp.add_point_cloud(p1, n1)
        res = icp.run(max_correspondence_distance=0.3, max_num_iterations=20,
                      convergence_threshold_max_movement=1e-9)
        results.append(res)
    T_m, T_d = results[0].poses[1], results[1].poses[1]
    np.testing.assert_allclose(T_m, T_d, atol=1e-4)
    # both must have actually moved the cloud back toward the base frame
    assert np.abs(T_m[:3, 3]).max() < 0.05


def test_moment_icp_far_from_origin():
    """Production scans sit tens of meters from the origin; the centered
    moment path must recover poses there as accurately as at the origin
    (uncentered f32 monomial Grams lose ~1e-3 of the cost to cancellation
    at offset ~100, corrupting LM accept/reject)."""
    rng = np.random.RandomState(11)
    base0 = rng.rand(3000, 3).astype(np.float32) * 2
    base0[:, 2] = 0.2 * np.sin(4 * base0[:, 0]) + 0.1 * np.cos(3 * base0[:, 1])
    n = np.zeros_like(base0)
    n[:, 0] = -0.8 * np.cos(4 * base0[:, 0])
    n[:, 1] = 0.3 * np.sin(3 * base0[:, 1])
    n[:, 2] = 1.0
    n /= np.linalg.norm(n, axis=1, keepdims=True)

    dq, dt = se3_exp_np(np.r_[0.01 * np.ones(3) * [1, -1, 1],
                              0.01 * np.ones(3) * [-1, 1, 1]])
    R = quat_to_matrix_np(dq)

    errs = {}
    for offset in (0.0, 100.0):
        base = base0 + np.asarray([offset, offset * 0.5, 0], np.float32)
        # perturb ABOUT the cloud centroid (a far scan misaligned in place,
        # not swung around the world origin)
        c = base.mean(0, dtype=np.float64)
        p1 = (((base - c) @ R.T) + c + dt).astype(np.float32)
        n1 = (n @ R.T).astype(np.float32)
        icp = PointToPlaneICP()
        icp.add_point_cloud(base, n)
        icp.add_point_cloud(p1, n1)
        res = icp.run(max_correspondence_distance=0.3, max_num_iterations=20,
                      convergence_threshold_max_movement=1e-10)
        T = res.poses[1]
        # recovered: T(p1) ~ base, i.e. T = [R^T, c - R^T (c + dt)]
        t_exp = c - R.T @ (c + dt)
        errs[offset] = max(np.abs(T[:3, :3] - R.T).max(),
                           np.abs(T[:3, 3] - t_exp).max())
    assert errs[0.0] < 2e-4, errs
    assert errs[100.0] < 1e-3, errs
