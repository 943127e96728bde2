"""Mesh-sharded photometric H,b accumulation == sequential (8-dev CPU mesh).

The photometric mirror of ``test_parallel.py``'s ICP equality test
(VERDICT r1 item 1): the shard_map'ed per-image H,b blocks and psum'd
cost/count must match the single-device vmapped dispatch, and a full LM
schedule driven through the sharded kernels must land on the same state.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dataset_pipeline_tpu.parallel.mesh import make_data_mesh
from dataset_pipeline_tpu.parallel.photometric import make_sharded_hb_batch
from dataset_pipeline_tpu.photometric.optimizer import PhotometricOptimizer, _hb_batch
from tests.scenes import synthetic_two_frame_problem


def _perturbed_problem(seed=5):
    from dataset_pipeline_tpu.models.lie import SE3

    problem = synthetic_two_frame_problem()
    g = problem.groups[0]
    rng = np.random.RandomState(seed)
    delta = np.zeros((2, 6), np.float32)
    delta[1] = 0.004 * rng.randn(6)
    g.poses = SE3.exp(jnp.asarray(delta)).compose(g.poses)
    return problem


def test_sharded_hb_batch_matches_sequential():
    problem = _perturbed_problem()
    mesh = make_data_mesh()
    opt = PhotometricOptimizer(problem, optimize_intrinsics=True)
    opt.current_scale = 0
    occl = opt._occlusion_depths()
    vis = opt._visibility(occl)

    g = problem.groups[0]
    l = 0
    batch = opt._batches[(0, l)][0]
    mask, s = vis[0][l][0]
    level = problem.levels[l]
    radius = jnp.asarray(level.radius, jnp.float32)

    args = (g.camera, g.camera.params,
            g.poses.q[batch.idx_dev], g.poses.t[batch.idx_dev],
            batch.points, batch.neighbors, batch.fixed_desc,
            batch.pyr, s, mask, radius)
    H1, b1, c1, n1 = _hb_batch(*args, True, True, geom_batched=False)

    # sharded path needs the image axis divisible by the mesh: pad to 8
    nb = batch.nb
    pad = 8 - nb
    rep = lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)
    q8, t8 = rep(g.poses.q[batch.idx_dev]), rep(g.poses.t[batch.idx_dev])
    pyr8 = tuple(rep(p) for p in batch.pyr)
    s8 = rep(s)
    mask8 = jnp.concatenate([mask, jnp.zeros((pad,) + mask.shape[1:], bool)], 0)

    sharded = make_sharded_hb_batch(mesh)
    H2, b2, c2, n2 = sharded(g.camera, g.camera.params, q8, t8,
                             batch.points, batch.neighbors, batch.fixed_desc,
                             pyr8, s8, mask8, radius, True, True,
                             geom_batched=False)
    np.testing.assert_allclose(np.asarray(H2)[:nb], np.asarray(H1),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b2)[:nb], np.asarray(b1),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-5)
    assert int(n2) == int(n1)
    # padding rows contributed nothing
    assert np.abs(np.asarray(H2)[nb:]).max() == 0.0


@pytest.mark.slow
def test_host_device_mesh_optimizer_matches_sequential():
    """The SURVEY §5 2-axis ("hosts","devices") topology through the FULL
    engine: a 2x4 mesh optimizer (image axis sharded over both axes, psum
    spanning the tuple) must land on the same state as the sequential
    schedule — the path ImageRegistrator's --mesh HxD flag enables."""
    from dataset_pipeline_tpu.parallel.mesh import make_host_device_mesh

    problem_a = _perturbed_problem()
    problem_b = _perturbed_problem()
    mesh = make_host_device_mesh(2, 4)

    opt_a = PhotometricOptimizer(problem_a, optimize_intrinsics=False)
    opt_b = PhotometricOptimizer(problem_b, optimize_intrinsics=False,
                                 mesh=mesh)
    assert opt_b._kernels.axis == ("hosts", "devices")

    for opt in (opt_a, opt_b):
        opt.current_scale = 0
        opt.run_on_current_scale(max_iterations=3)

    qa, ta = (np.asarray(problem_a.groups[0].poses.q),
              np.asarray(problem_a.groups[0].poses.t))
    qb, tb = (np.asarray(problem_b.groups[0].poses.q),
              np.asarray(problem_b.groups[0].poses.t))
    np.testing.assert_allclose(qb, qa, rtol=0, atol=5e-6)
    np.testing.assert_allclose(tb, ta, rtol=0, atol=5e-5)


@pytest.mark.slow
def test_mesh_optimizer_matches_sequential_schedule():
    problem_a = _perturbed_problem()
    problem_b = _perturbed_problem()
    mesh = make_data_mesh()

    opt_a = PhotometricOptimizer(problem_a, optimize_intrinsics=False)
    opt_b = PhotometricOptimizer(problem_b, optimize_intrinsics=False,
                                 mesh=mesh)
    assert opt_b._chunk_min_bucket == 8

    for opt in (opt_a, opt_b):
        opt.current_scale = 0
        opt.run_on_current_scale(max_iterations=4)

    qa, ta = np.asarray(problem_a.groups[0].poses.q), np.asarray(problem_a.groups[0].poses.t)
    qb, tb = np.asarray(problem_b.groups[0].poses.q), np.asarray(problem_b.groups[0].poses.t)
    np.testing.assert_allclose(qb, qa, rtol=0, atol=5e-6)
    np.testing.assert_allclose(tb, ta, rtol=0, atol=5e-5)
