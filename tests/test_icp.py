"""ICP tests mirroring the reference ``opt/test/test_icp.cc`` strategy."""

import numpy as np
import pytest

from dataset_pipeline_tpu.icp.point_to_plane import PointToPlaneICP

RNG = np.random.RandomState(0)


def _random_rotation(max_angle_deg):
    axis = RNG.randn(3)
    axis /= np.linalg.norm(axis)
    angle = np.deg2rad(RNG.uniform(-max_angle_deg, max_angle_deg))
    K = np.asarray(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


@pytest.mark.slow
def test_identical_cloud_alignment():
    """20 randomly perturbed copies of one cloud must align to a common pose
    (reference tolerance 1e-5 per matrix entry; we allow 5e-5 for f32 H,b)."""
    n = 50
    pts = RNG.uniform(-1, 1, (n, 3)).astype(np.float32)
    normals = RNG.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)

    icp = PointToPlaneICP()
    num_clouds = 20
    for i in range(num_clouds):
        T = np.eye(4)
        T[:3, :3] = _random_rotation(10.0)
        T[:3, 3] = RNG.uniform(-0.05, 0.05, 3)
        icp.add_point_cloud(pts, normals, T)

    res = icp.run(0.15 * np.sqrt(3), max_num_iterations=100,
                  convergence_threshold_max_movement=1e-7)
    T0 = res.poses[0]
    for i in range(1, num_clouds):
        np.testing.assert_allclose(res.poses[i], T0, atol=5e-5)


def test_plane_with_single_point():
    """Reference TestPlaneWithSinglePoint: a 50x50 unit grid plus one point at
    (0,0,20) with normal (1,0,1)/sqrt(2); a second copy of the cloud offset by
    one grid cell must snap to the SAME pose as the first copy (the off-plane
    point disambiguates the one-cell aliasing)."""
    xs, ys = np.meshgrid(np.arange(50.0), np.arange(50.0))
    plane = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], -1).astype(np.float32)
    plane_n = np.tile(np.asarray([[0, 0, 1]], np.float32), (len(plane), 1))
    extra = np.asarray([[0.0, 0.0, 20.0]], np.float32)
    extra_n = np.asarray([[1.0, 0.0, 1.0]], np.float32) / np.sqrt(2.0)
    pts = np.concatenate([plane, extra])
    nrm = np.concatenate([plane_n, extra_n])

    icp = PointToPlaneICP()
    icp.add_point_cloud(pts, nrm, np.eye(4))
    T = np.eye(4)
    T[:3, 3] = [1.0, 0.0, 0.0]
    icp.add_point_cloud(pts, nrm, T)

    res = icp.run(1.5, max_num_iterations=100, convergence_threshold_max_movement=1e-7)
    np.testing.assert_allclose(res.poses[1], res.poses[0], atol=1e-5)


def test_fixed_cloud_stays_fixed():
    pts = RNG.uniform(-1, 1, (200, 3)).astype(np.float32)
    normals = RNG.randn(200, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    icp = PointToPlaneICP()
    icp.add_point_cloud(pts, normals, np.eye(4), fixed=True)
    T = np.eye(4)
    T[:3, 3] = [0.03, -0.02, 0.04]
    icp.add_point_cloud(pts, normals, T)
    res = icp.run(0.3, max_num_iterations=50, convergence_threshold_max_movement=1e-7)
    # movable cloud must come back to identity (the fixed cloud's frame)
    np.testing.assert_allclose(res.poses[0], np.eye(4), atol=5e-4)


def test_pallas_gn_kernel_matches_xla():
    """Pallas fused GN accumulation (interpret mode on CPU) vs the XLA path."""
    import jax.numpy as jnp

    from dataset_pipeline_tpu.icp.point_to_plane import _icp_hb_cost
    from dataset_pipeline_tpu.ops.pallas_gn import icp_hb_cost_pallas

    m = 1024
    rng = np.random.RandomState(2)
    ps = jnp.asarray(rng.randn(m, 3).astype(np.float32))
    ns = rng.randn(m, 3).astype(np.float32)
    ns /= np.linalg.norm(ns, axis=1, keepdims=True)
    ns = jnp.asarray(ns)
    pt = ps + 0.01 * jnp.asarray(rng.randn(m, 3).astype(np.float32))
    nt = ns
    sid = jnp.asarray(rng.randint(0, 3, m).astype(np.int32))
    tid = jnp.asarray(((np.asarray(sid) + 1) % 3).astype(np.int32))
    w = jnp.asarray((rng.rand(m) > 0.1).astype(np.float32))
    q = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (3, 1))
    t = jnp.asarray(rng.randn(3, 3).astype(np.float32) * 0.01)

    H1, b1, c1 = _icp_hb_cost(q, t, ps, ns, pt, nt, sid, tid, w, 3)
    H2, b2, c2 = icp_hb_cost_pallas(q, t, ps, ns, pt, nt, sid, tid, w, 3,
                                    chunk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-5)


def test_pallas_fused_kernel_matches_v1():
    """The fully fused GN kernel (pose transform + Jacobians in-kernel from
    the packed (16,M) tensor, SMEM poses) must reproduce the v1 kernel."""
    import jax.numpy as jnp

    from dataset_pipeline_tpu.ops.pallas_gn import (
        icp_hb_cost_pallas,
        icp_hb_cost_pallas_fused,
        pack_icp_inputs,
    )

    rng = np.random.RandomState(0)
    m, C = 5000, 3
    ps = rng.randn(m, 3).astype(np.float32)
    ns = rng.randn(m, 3).astype(np.float32)
    ns /= np.linalg.norm(ns, axis=1, keepdims=True)
    pt = ps + 0.01 * rng.randn(m, 3).astype(np.float32)
    nt = ns + 0.05 * rng.randn(m, 3).astype(np.float32)
    nt /= np.linalg.norm(nt, axis=1, keepdims=True)
    sid = rng.randint(0, C, m).astype(np.int32)
    tid = ((sid + 1) % C).astype(np.int32)
    w = rng.rand(m).astype(np.float32)
    ax = rng.randn(C, 3) * 0.1
    q = np.stack([
        np.concatenate([[np.cos(np.linalg.norm(a) / 2)],
                        np.sin(np.linalg.norm(a) / 2) * a / max(np.linalg.norm(a), 1e-9)])
        for a in ax
    ]).astype(np.float32)
    t = (rng.randn(C, 3) * 0.2).astype(np.float32)

    args = [jnp.asarray(x) for x in (q, t, ps, ns, pt, nt, sid, tid, w)]
    H1, b1, c1 = icp_hb_cost_pallas(*args, num_clouds=C, chunk=1024, interpret=True)
    data = pack_icp_inputs(*[jnp.asarray(x) for x in (ps, ns, pt, nt, w)], chunk=1024)
    H2, b2, c2 = icp_hb_cost_pallas_fused(
        jnp.asarray(q), jnp.asarray(t), data, jnp.asarray(sid), jnp.asarray(tid),
        num_clouds=C, chunk=1024, interpret=True)
    assert np.allclose(H1, H2, rtol=2e-4, atol=1e-2)
    assert np.allclose(b1, b2, rtol=2e-4, atol=1e-2)
    assert abs(float(c1) - float(c2)) < 1e-3 * abs(float(c1))
