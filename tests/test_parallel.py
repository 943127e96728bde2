"""Sharded normal equations + Schur-complement BA tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dataset_pipeline_tpu.parallel.ba import joint_ba_step, schur_eliminate_images
from dataset_pipeline_tpu.parallel.mesh import make_data_mesh, replicated, shard_rows
from dataset_pipeline_tpu.parallel.normal_equations import sharded_icp_hb

RNG = np.random.RandomState(23)


def test_mesh_has_8_devices():
    mesh = make_data_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_sharded_icp_hb_matches_single_device():
    from dataset_pipeline_tpu.icp.point_to_plane import _icp_hb_cost

    C = 3
    m = 8 * 64
    ps = RNG.randn(m, 3).astype(np.float32)
    ns = RNG.randn(m, 3).astype(np.float32)
    ns /= np.linalg.norm(ns, axis=1, keepdims=True)
    pt = ps + 0.01 * RNG.randn(m, 3).astype(np.float32)
    nt = ns.copy()
    sid = RNG.randint(0, C, m).astype(np.int32)
    tid = ((sid + 1) % C).astype(np.int32)
    w = np.ones(m, np.float32)
    q = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (C, 1))
    t = np.zeros((C, 3), np.float32)

    H1, b1, c1 = _icp_hb_cost(*(jnp.asarray(x) for x in (q, t, ps, ns, pt, nt, sid, tid, w)), C)

    mesh = make_data_mesh()
    args = [shard_rows(mesh, jnp.asarray(x)) for x in (ps, ns, pt, nt, sid, tid, w)]
    H2, b2, c2 = sharded_icp_hb(mesh, replicated(mesh, jnp.asarray(q)),
                                replicated(mesh, jnp.asarray(t)), *args, C)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-5)


def test_schur_elimination_matches_direct_solve():
    n_keep, m = 10, 5
    n = n_keep + 6 * m
    A = RNG.randn(n, n)
    H = A @ A.T + n * np.eye(n)
    # zero out image-image off-diagonal coupling (the structure Schur exploits)
    for i in range(m):
        for j in range(m):
            if i != j:
                H[n_keep + 6 * i : n_keep + 6 * i + 6,
                  n_keep + 6 * j : n_keep + 6 * j + 6] = 0
    b = RNG.randn(n)
    x_direct = np.linalg.solve(H, b)

    S, rhs, back = schur_eliminate_images(
        jnp.asarray(H, jnp.float32), jnp.asarray(b, jnp.float32), n_keep, m)
    xk = jnp.linalg.solve(S, rhs)
    xi = back(xk)
    x_schur = np.concatenate([np.asarray(xk), np.asarray(xi).reshape(-1)])
    np.testing.assert_allclose(x_schur, x_direct, rtol=2e-3, atol=2e-3)


def test_joint_ba_step_reduces_synthetic_cost():
    """Joint 'scan+image' toy problem: rows couple a kept variable block and
    one image block each; one damped GN step must reduce the quadratic cost."""
    n_keep, m = 8, 4
    n_vars = n_keep + 6 * m
    R = 8 * 32
    # random Jacobian rows with the BA sparsity: kept block + one image block
    rows = np.zeros((R, n_vars), np.float32)
    rows[:, :n_keep] = RNG.randn(R, n_keep) * 0.3
    img_of_row = RNG.randint(0, m, R)
    for i in range(R):
        o = n_keep + 6 * img_of_row[i]
        rows[i, o : o + 6] = RNG.randn(6)
    x_true = RNG.randn(n_vars).astype(np.float32) * 0.1
    r = (rows @ x_true).astype(np.float32)  # residual = J x_true (pull toward -x_true)
    w = np.ones(R, np.float32)

    mesh = make_data_mesh()

    def row_fn(rows, r, w):
        return rows, r, w

    sharded_inputs = (
        shard_rows(mesh, jnp.asarray(rows)),
        shard_rows(mesh, jnp.asarray(r)),
        shard_rows(mesh, jnp.asarray(w)),
    )
    xk, xi, cost = joint_ba_step(
        mesh, row_fn, sharded_inputs, (P("data"), P("data"), P("data")),
        n_keep, m, lam=1e-4,
    )
    x = np.concatenate([np.asarray(xk), np.asarray(xi).reshape(-1)])
    # GN on a linear problem solves it in one step: x ~= x_true
    np.testing.assert_allclose(x, x_true, atol=5e-3)
    # applying -x zeroes the residual
    new_r = r - rows @ x
    assert np.linalg.norm(new_r) < 1e-2 * np.linalg.norm(r)


@pytest.mark.slow
def test_host_device_mesh_icp_hb_matches_single_device():
    """2-axis ("hosts","devices") mesh (SURVEY.md §5 multi-host backend):
    the psum spans both axes (DCN across hosts + ICI within) and must give
    the same H,b as the single-device accumulation. Runs as a 2x4 split of
    the forced-8-device CPU platform."""
    from dataset_pipeline_tpu.icp.point_to_plane import _icp_hb_cost
    from dataset_pipeline_tpu.parallel.mesh import make_host_device_mesh

    C = 2
    m = 8 * 32
    ps = RNG.randn(m, 3).astype(np.float32)
    ns = RNG.randn(m, 3).astype(np.float32)
    ns /= np.linalg.norm(ns, axis=1, keepdims=True)
    pt = ps + 0.01 * RNG.randn(m, 3).astype(np.float32)
    nt = ns.copy()
    sid = RNG.randint(0, C, m).astype(np.int32)
    tid = ((sid + 1) % C).astype(np.int32)
    w = np.ones(m, np.float32)
    q = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (C, 1))
    t = np.zeros((C, 3), np.float32)

    H1, b1, c1 = _icp_hb_cost(*(jnp.asarray(x) for x in (q, t, ps, ns, pt, nt, sid, tid, w)), C)

    mesh = make_host_device_mesh(2, 4)
    assert mesh.devices.shape == (2, 4)
    args = [shard_rows(mesh, jnp.asarray(x)) for x in (ps, ns, pt, nt, sid, tid, w)]
    H2, b2, c2 = sharded_icp_hb(mesh, replicated(mesh, jnp.asarray(q)),
                                replicated(mesh, jnp.asarray(t)), *args, C)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-5)


def test_initialize_distributed_noop_single_process():
    """Without a coordinator the multi-host entry is a safe no-op."""
    from dataset_pipeline_tpu.parallel.mesh import initialize_distributed

    assert initialize_distributed() is False


@pytest.mark.slow
def test_sharded_moment_gram_matches_single_device():
    """psum-reduced monomial Gram == single-device Gram (the sharded path of
    the default moment ICP inner loop)."""
    from dataset_pipeline_tpu.icp.moments import (
        hb_cost_from_moments,
        moment_gram_xla,
        se3_exp_np,
    )
    from dataset_pipeline_tpu.parallel.normal_equations import (
        sharded_moment_gram,
    )

    rng = np.random.RandomState(9)
    mesh = make_data_mesh()
    nd = mesh.devices.size
    M = 1024 * nd
    ps = rng.randn(M, 3).astype(np.float32)
    ns = rng.randn(M, 3).astype(np.float32)
    ns /= np.linalg.norm(ns, axis=1, keepdims=True)
    pt = (ps + 0.03 * rng.randn(M, 3)).astype(np.float32)
    nt = ns.copy()
    w = rng.rand(M).astype(np.float32)

    P_sh = np.asarray(sharded_moment_gram(
        mesh, jnp.asarray(ps), jnp.asarray(ns), jnp.asarray(pt),
        jnp.asarray(nt), jnp.asarray(w)), np.float64)
    P_ref = np.asarray(moment_gram_xla(
        jnp.asarray(ps), jnp.asarray(ns), jnp.asarray(pt), jnp.asarray(nt),
        jnp.asarray(w)), np.float64)
    np.testing.assert_allclose(P_sh, P_ref, rtol=1e-5,
                               atol=1e-5 * np.abs(P_ref).max())

    # and the downstream H,b agree with the direct sharded accumulation
    q = np.tile(np.asarray([1.0, 0, 0, 0]), (2, 1))
    t = np.zeros((2, 3))
    q[1], t[1] = se3_exp_np(np.asarray([0.01, -0.02, 0.005, 0.004, -0.003, 0.002]))
    H_m, b_m, cost_m = hb_cost_from_moments([P_sh], [(0, 1)], q, t, 2)
    from dataset_pipeline_tpu.parallel.normal_equations import sharded_icp_hb

    H_d, b_d, cost_d = sharded_icp_hb(
        mesh, jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32),
        jnp.asarray(ps), jnp.asarray(ns), jnp.asarray(pt), jnp.asarray(nt),
        jnp.zeros(M, jnp.int32), jnp.ones(M, jnp.int32), jnp.asarray(w), 2)
    scale = np.abs(np.asarray(H_d)).max()
    np.testing.assert_allclose(H_m, np.asarray(H_d), atol=3e-4 * scale)
    np.testing.assert_allclose(cost_m, float(cost_d), rtol=1e-4)


def test_host_device_mesh_moment_gram_matches_single_device():
    """The moment-Gram psum spanning a 2-axis ("hosts","devices") mesh (DCN
    across hosts + ICI within) equals the single-device Gram — the
    multi-host slice of the default ICP accelerator path."""
    from dataset_pipeline_tpu.icp.moments import moment_gram_xla
    from dataset_pipeline_tpu.parallel.mesh import make_host_device_mesh
    from dataset_pipeline_tpu.parallel.normal_equations import (
        sharded_moment_gram,
    )

    mesh = make_host_device_mesh(2, 4)
    M = 8 * 64
    ps = RNG.randn(M, 3).astype(np.float32)
    ns = RNG.randn(M, 3).astype(np.float32)
    ns /= np.linalg.norm(ns, axis=1, keepdims=True)
    pt = (ps + 0.02 * RNG.randn(M, 3)).astype(np.float32)
    nt = ns.copy()
    w = RNG.rand(M).astype(np.float32)

    def sh(x):
        return shard_rows(mesh, jnp.asarray(x))

    P_sh = np.asarray(sharded_moment_gram(
        mesh, sh(ps), sh(ns), sh(pt), sh(nt), sh(w)), np.float64)
    P_ref = np.asarray(moment_gram_xla(
        jnp.asarray(ps), jnp.asarray(ns), jnp.asarray(pt), jnp.asarray(nt),
        jnp.asarray(w)), np.float64)
    np.testing.assert_allclose(P_sh, P_ref, rtol=1e-5,
                               atol=1e-5 * np.abs(P_ref).max())
