"""SO3/SE3/Sim3 round-trip and consistency tests (seeded, deterministic)."""

import jax
import jax.numpy as jnp
import numpy as np

from dataset_pipeline_tpu.models.lie import (
    SE3,
    Sim3,
    average_quaternions,
    quat_from_matrix,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    so3_exp_quat,
    so3_log,
)

RNG = np.random.RandomState(7)


def random_quats(n):
    q = RNG.randn(n, 4).astype(np.float32)
    return quat_normalize(jnp.asarray(q))


def test_quat_matrix_roundtrip():
    q = random_quats(64)
    m = quat_to_matrix(q)
    q2 = quat_from_matrix(m)
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_rotate_matches_matrix():
    q = random_quats(32)
    v = jnp.asarray(RNG.randn(32, 3).astype(np.float32))
    r1 = quat_rotate(q, v)
    r2 = jnp.einsum("nij,nj->ni", quat_to_matrix(q), v)
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_so3_exp_log_roundtrip():
    w = jnp.asarray(RNG.uniform(-2.0, 2.0, (64, 3)).astype(np.float32))
    q = so3_exp_quat(w)
    w2 = so3_log(q)
    np.testing.assert_allclose(w, w2, atol=1e-4)
    # small-angle branch
    ws = jnp.asarray(RNG.uniform(-1e-6, 1e-6, (8, 3)).astype(np.float32))
    np.testing.assert_allclose(so3_log(so3_exp_quat(ws)), ws, atol=1e-8)


def test_se3_exp_log_roundtrip():
    # f32 rounding dominates at large angles (formulas verified to 2e-14 in f64)
    x = jnp.asarray(RNG.uniform(-1.0, 1.0, (64, 6)).astype(np.float32))
    T = SE3.exp(x)
    np.testing.assert_allclose(T.log(), x, atol=3e-3)
    xs = jnp.asarray(RNG.uniform(-0.05, 0.05, (64, 6)).astype(np.float32))
    np.testing.assert_allclose(SE3.exp(xs).log(), xs, atol=1e-5)


def test_se3_compose_inverse():
    a = SE3.exp(jnp.asarray(RNG.uniform(-1, 1, (16, 6)).astype(np.float32)))
    b = SE3.exp(jnp.asarray(RNG.uniform(-1, 1, (16, 6)).astype(np.float32)))
    p = jnp.asarray(RNG.randn(16, 3).astype(np.float32))
    np.testing.assert_allclose((a @ b).apply(p), a.apply(b.apply(p)), atol=1e-5)
    ident = a @ a.inverse()
    np.testing.assert_allclose(ident.apply(p), p, atol=1e-5)


def test_se3_matrix_agrees():
    a = SE3.exp(jnp.asarray(RNG.uniform(-1, 1, (8, 6)).astype(np.float32)))
    p = jnp.asarray(RNG.randn(8, 3).astype(np.float32))
    ph = jnp.concatenate([p, jnp.ones((8, 1), jnp.float32)], -1)
    r = jnp.einsum("nij,nj->ni", a.matrix(), ph)[:, :3]
    np.testing.assert_allclose(a.apply(p), r, atol=1e-5)


def test_sim3_roundtrip():
    q = random_quats(8)
    t = jnp.asarray(RNG.randn(8, 3).astype(np.float32))
    s = jnp.asarray(RNG.uniform(0.5, 2.0, (8,)).astype(np.float32))
    S = Sim3(q, t, s)
    S2 = Sim3.from_matrix(S.matrix())
    p = jnp.asarray(RNG.randn(8, 3).astype(np.float32))
    np.testing.assert_allclose(S.apply(p), S2.apply(p), atol=1e-4)
    np.testing.assert_allclose((S @ S.inverse()).apply(p), p, atol=1e-4)


def test_se3_jit_and_vmap():
    x = jnp.asarray(RNG.uniform(-1, 1, (4, 6)).astype(np.float32))
    f = jax.jit(lambda x: SE3.exp(x).log())
    np.testing.assert_allclose(f(x), x, atol=1e-4)
    g = jax.vmap(lambda xi: SE3.exp(xi).apply(jnp.ones(3)))
    assert g(x).shape == (4, 3)


def test_average_quaternions():
    base = random_quats(1)[0]
    # small perturbations around base
    noise = jnp.asarray(RNG.uniform(-0.01, 0.01, (32, 3)).astype(np.float32))
    qs = quat_multiply(jnp.broadcast_to(base, (32, 4)), so3_exp_quat(noise))
    avg = average_quaternions(qs)
    dot = jnp.abs(jnp.sum(avg * base))
    assert dot > 0.9999
