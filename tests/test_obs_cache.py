"""Observations cache tests.

Mirror of the reference's observations-cache behavior
(``opt/observations_cache.cc:37-158``): candidate lists are computed once,
later iterations re-project only those, results persist to disk and are
regenerated on mismatch. Here the lists are fixed-shape compacted level
views (``photometric/obs_cache.py``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.ops.splat import (
    fill_color_from_depth,
    flood_fill_colors,
    render_points_depth_color,
)
from dataset_pipeline_tpu.photometric.obs_cache import (
    ObservationsCache,
    build_level_view,
)
from dataset_pipeline_tpu.photometric.multiscale import build_multiscale_cloud
from scenes import synthetic_two_frame_problem
from dataset_pipeline_tpu.photometric.optimizer import PhotometricOptimizer
from dataset_pipeline_tpu.photometric.problem import (
    ImageGroup,
    PhotoLevel,
    PhotoProblem,
    build_image_pyramid,
    build_photo_level,
)


def _toy_level(n=20, k=3, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32)
    nbr = np.stack([(np.arange(n) + d) % n for d in range(1, k + 1)], -1).astype(np.int32)
    desc = rng.randn(n, k).astype(np.float32)
    return PhotoLevel(jnp.asarray(pts), jnp.asarray(np.zeros(n, np.float32)),
                      jnp.asarray(np.zeros(n, np.uint8)), jnp.asarray(nbr),
                      jnp.asarray(desc), 0.1)


def test_level_view_closure_and_remap():
    level = _toy_level()
    cand = np.zeros(20, bool)
    cand[[2, 7]] = True
    view = build_level_view(level, cand)
    gi = np.asarray(view.gather_idx)
    core = np.asarray(view.core)
    m = view.count
    # the view contains the candidates and all their neighbors
    expected = {2, 7, 3, 4, 5, 8, 9, 10}
    assert set(gi[:m].tolist()) == expected
    # core marks exactly the candidates
    assert set(gi[:m][core[:m]].tolist()) == {2, 7}
    # remapped neighbors of core rows point at the right geometry
    nbr_v = np.asarray(view.neighbors)
    pts_v = np.asarray(view.points)
    pts = np.asarray(level.points)
    nbr = np.asarray(level.neighbors)
    for r in np.flatnonzero(core[:m]):
        orig = gi[r]
        assert np.allclose(pts_v[nbr_v[r]], pts[nbr[orig]])
        assert np.allclose(np.asarray(view.fixed_descriptors)[r],
                           np.asarray(level.fixed_descriptors)[orig])
    # padding rows: core False, scatter index == N (drop), size is a 2^k bucket
    assert not core[m:].any()
    assert (np.asarray(view.scatter_idx)[m:] == 20).all()
    assert view.size >= m and (view.size & (view.size - 1)) == 0


def test_cache_save_load_roundtrip(tmp_path):
    level = _toy_level(50, seed=1)
    cache = ObservationsCache()
    rng = np.random.RandomState(2)
    for b in range(3):
        cache.set_candidates(0, b, 0, level, rng.rand(50) > 0.6)
    path = str(tmp_path / "observations_cache.npz")
    cache.save(path, [level])
    loaded = ObservationsCache.load(path, [level])
    assert loaded is not None
    for b in range(3):
        v0, v1 = cache.view(0, b, 0), loaded.view(0, b, 0)
        assert v0.count == v1.count
        assert np.array_equal(np.asarray(v0.gather_idx), np.asarray(v1.gather_idx))
        assert np.array_equal(np.asarray(v0.core), np.asarray(v1.core))


def test_cache_load_rejects_size_mismatch(tmp_path):
    level = _toy_level(50, seed=1)
    cache = ObservationsCache()
    cache.set_candidates(0, 0, 0, level, np.ones(50, bool))
    path = str(tmp_path / "observations_cache.npz")
    cache.save(path, [level])
    other = _toy_level(40, seed=1)
    assert ObservationsCache.load(path, [other]) is None




def test_cached_visibility_and_cost_match_dense():
    """The compacted views must reproduce the dense pipeline exactly: the
    candidate set is a superset of every gated observation set."""
    problem = synthetic_two_frame_problem()
    opt = PhotometricOptimizer(problem, optimize_intrinsics=False)
    opt.current_scale = 0
    occl = opt._occlusion_depths()

    def per_image_count(vis, b, l):
        bi, j = opt._batch_row[(0, l)][b]
        return int(np.asarray(vis[0][l][bi][0][j]).sum())

    vis_dense = opt._visibility(occl)
    params = [g.camera.params for g in problem.groups]
    poses = [g.poses for g in problem.groups]
    c_dense = opt._total_cost(params, poses, vis_dense)
    counts_dense = [
        per_image_count(vis_dense, b, l)
        for b in range(2) for l in range(len(problem.levels))
    ]

    opt.build_observations_cache()
    real, padded = opt.obs_cache.stats()
    dense_rows = sum(len(l.points) for l in problem.levels) * 2
    assert 0 < real <= dense_rows

    vis_view = opt._visibility(occl)
    c_view = opt._total_cost(params, poses, vis_view)
    counts_view = [
        per_image_count(vis_view, b, l)
        for b in range(2) for l in range(len(problem.levels))
    ]
    assert counts_view == counts_dense
    assert abs(c_view - c_dense) <= 1e-4 * max(abs(c_dense), 1.0)


def test_lm_step_runs_on_views():
    """A full LM iteration must work on compacted geometry."""
    problem = synthetic_two_frame_problem()
    opt = PhotometricOptimizer(problem, optimize_intrinsics=False)
    opt.current_scale = 0
    opt.build_observations_cache()
    occl = opt._occlusion_depths()
    opt._frozen_vis = opt._visibility(occl)
    applied, max_change = opt._lm_step(opt._frozen_vis)
    assert applied
    assert np.isfinite(max_change)


def test_obs_cache_drift_guardrail():
    """Core-hit-rate logging + rebuild trigger: after the cache is built, a
    large pose change must drop the hit rate below 1, and the drift check
    must rebuild the cache (restoring the rate). The reference has no such
    guardrail (``observations_cache.cc:84-88`` only FATALs on parameter
    mismatch) — this is the pose-drift counterpart."""
    problem = synthetic_two_frame_problem()
    # move the cameras forward so each image sees only PART of the cloud —
    # otherwise every point is a candidate and no drift is possible
    g = problem.groups[0]
    g.poses = SE3(g.poses.q, g.poses.t + jnp.asarray([0.0, 0.0, 1.2]))
    opt = PhotometricOptimizer(problem, optimize_intrinsics=False)
    opt.build_observations_cache()
    r0 = opt.obs_cache_hit_rate()
    assert r0 > 0.999  # fresh cache: every visible point is a candidate

    # drift: pan both cameras sideways so new points enter the frustum
    g = opt.p.groups[0]
    g.poses = SE3(g.poses.q, g.poses.t + jnp.asarray([0.35, 0.0, 0.0]))
    r1 = opt.obs_cache_hit_rate()
    assert r1 < 0.98, f"hit rate did not drop: {r1}"

    cache_before = opt.obs_cache
    opt.obs_cache_min_hit_rate = 0.98
    opt._check_obs_cache_drift()
    assert opt.obs_cache is not cache_before  # rebuilt
    assert opt.obs_cache_hit_log[-1] == pytest.approx(r1, abs=1e-6)
    r2 = opt.obs_cache_hit_rate()
    assert r2 > 0.999
