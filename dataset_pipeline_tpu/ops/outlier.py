"""Local statistical outlier removal.

Counterpart of ``geometry/local_statistical_outlier_removal.{h,hpp}``:
two passes — (1) per-point mean distance to its k nearest neighbors,
(2) keep a point iff its mean distance <= (mean of its NEIGHBORS' mean
distances) * factor (local statistics, not global;
``local_statistical_outlier_removal.hpp:92-166``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dataset_pipeline_tpu.ops.knn import VoxelGrid, knn_bruteforce, knn_grid


def _filter_from_knn(d2, idx):
    """Shared logic given (Q,k+1) self-inclusive sorted kNN results."""
    # drop self (first column)
    d2n, idxn = d2[:, 1:], idx[:, 1:]
    valid = idxn >= 0
    dist = jnp.where(valid, jnp.sqrt(jnp.maximum(d2n, 0.0)), 0.0)
    count = jnp.maximum(jnp.sum(valid, -1), 1)
    mean_dist = jnp.sum(dist, -1) / count  # (Q,)

    # pass 2: mean of neighbors' mean distances
    safe = jnp.maximum(idxn, 0)
    nbr_mean = jnp.where(valid, mean_dist[safe], 0.0)
    nbr_valid = valid & (mean_dist[safe] > 0)
    n_count = jnp.maximum(jnp.sum(nbr_valid, -1), 1)
    local_mean = jnp.sum(jnp.where(nbr_valid, nbr_mean, 0.0), -1) / n_count
    return mean_dist, local_mean


@partial(jax.jit, static_argnames=("k",))
def local_statistical_outliers_bruteforce(points, k: int, factor: float):
    """Inlier mask via exact kNN."""
    d2, idx = knn_bruteforce(points, points, k + 1)
    mean_dist, local_mean = _filter_from_knn(d2, idx)
    return mean_dist <= local_mean * factor


@partial(jax.jit, static_argnames=("k", "max_per_cell", "rings"))
def local_statistical_outliers_grid(grid: VoxelGrid, points, k: int, factor: float,
                                    max_per_cell: int = 32, rings: int = 1):
    d2, idx, _ = knn_grid(grid, points, k + 1, max_per_cell, rings=rings)
    mean_dist, local_mean = _filter_from_knn(d2, idx)
    return mean_dist <= local_mean * factor


def _outliers_from_adaptive_knn(points, k: int, factor: float):
    """Inlier mask via the checked adaptive grid search (production scale,
    supports large k like the reference cleaner's ``--filter 270,1.15``)."""
    from dataset_pipeline_tpu.ops.knn import knn_adaptive

    d2, idx = knn_adaptive(points, points, k + 1)
    mean_dist, local_mean = _filter_from_knn(d2, idx)
    return mean_dist <= local_mean * factor


def remove_outliers(points, filters, use_grid_above: int = 200_000):
    """Iterated filtering like the reference PointCloudCleaner CLI
    (``exe/point_cloud_cleaner.cc:80-112``): ``filters`` is a list of
    (k, factor) applied in sequence; returns the final inlier mask into the
    ORIGINAL array.
    """
    import numpy as np

    from dataset_pipeline_tpu.ops.knn import build_grid

    pts = jnp.asarray(points, jnp.float32)
    alive = np.arange(pts.shape[0])
    for k, factor in filters:
        cur = pts[alive]
        if cur.shape[0] > use_grid_above:
            from dataset_pipeline_tpu import native

            out_n = native.grid_knn(np.asarray(cur), np.asarray(cur), k + 1)
            if out_n is not None:
                # exact threaded host kNN (handles the reference cleaner's
                # k=270 at multi-million-point scale)
                mean_dist, local_mean = _filter_from_knn(
                    jnp.asarray(out_n[0]), jnp.asarray(out_n[1]))
                mask = mean_dist <= local_mean * factor
            else:
                # checked adaptive grid search: auto-sizes cell/rings/cap for
                # the requested k and retries on drop/coverage violations
                mask = _outliers_from_adaptive_knn(cur, k, factor)
        else:
            mask = local_statistical_outliers_bruteforce(cur, k, factor)
        alive = alive[np.asarray(mask)]
    out = np.zeros(pts.shape[0], bool)
    out[alive] = True
    return out
