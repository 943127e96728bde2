"""The C++ reference-loop baseline must agree with the JAX ICP H,b.

``native/ref_icp_loop.cc`` mirrors the reference's inner accumulation
(``icp_point_to_plane_impl.h:115-211``); if its H, b, cost match our
``_icp_hb_cost`` on the same correspondences, both the baseline measurement
and our kernel mirror the same math.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dataset_pipeline_tpu.icp.point_to_plane import _icp_hb_cost
from dataset_pipeline_tpu.native.refbench import ref_icp_inner


def test_ref_loop_matches_jax_hb():
    rng = np.random.RandomState(0)
    M = 20_000
    half = M // 2
    ps = rng.randn(M, 3).astype(np.float32)
    ns = rng.randn(M, 3).astype(np.float32)
    ns /= np.linalg.norm(ns, axis=1, keepdims=True)
    pt = ps + 0.01 * rng.randn(M, 3).astype(np.float32)
    nt = rng.randn(M, 3).astype(np.float32)
    nt /= np.linalg.norm(nt, axis=1, keepdims=True)

    out = ref_icp_inner(ps, ns, pt, nt)
    if out is None:
        pytest.skip("no C++ compiler available")
    secs, H_ref, b_ref, cost_ref = out
    # upper-triangular diagonal-block storage -> full symmetric
    H_ref_full = np.triu(H_ref) + np.triu(H_ref, 1).T

    sid = np.concatenate([np.zeros(half, np.int32), np.ones(half, np.int32)])
    tid = 1 - sid
    H, b, cost = _icp_hb_cost(
        jnp.asarray(np.tile([[1.0, 0, 0, 0]], (2, 1)), jnp.float32),
        jnp.asarray(np.zeros((2, 3)), jnp.float32),
        jnp.asarray(ps), jnp.asarray(ns), jnp.asarray(pt), jnp.asarray(nt),
        jnp.asarray(sid), jnp.asarray(tid),
        jnp.asarray(np.ones(M, np.float32)), 2)
    H_j = np.asarray(H, np.float64)[6:, 6:]
    b_j = np.asarray(b, np.float64)[6:]
    scale = np.abs(H_ref_full).max()
    np.testing.assert_allclose(H_j, H_ref_full, atol=2e-4 * scale)
    np.testing.assert_allclose(b_j, b_ref,
                               atol=2e-4 * max(np.abs(b_ref).max(), 1e-9))
    np.testing.assert_allclose(float(cost), cost_ref, rtol=1e-4)
    assert secs > 0
