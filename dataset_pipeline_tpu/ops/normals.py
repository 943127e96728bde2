"""Two-pass PCA normal estimation, batched over all points.

Counterpart of the reference's ``NormalEstimationTwoPass[OMP]``
(``geometry/two_pass_normal_3d.{h,hpp}``, ``two_pass_centroid.h:69-160``):
per point, mean and covariance of its k nearest neighbors are accumulated in
two passes (subtract-the-mean, numerically stable in f32), the normal is the
smallest-eigenvalue direction, flipped toward a per-point viewpoint (the scan
origin, ``exe/normal_estimator.cc:188-191``). OpenMP-over-points becomes one
vectorized program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dataset_pipeline_tpu.ops.knn import VoxelGrid, knn_bruteforce, knn_grid
from dataset_pipeline_tpu.ops.sym3 import sym3_smallest_eigenvector


def _normals_from_neighbors(points, queries, nbr_idx, viewpoints):
    """PCA normals given padded neighbor indices (-1 = invalid)."""
    valid = nbr_idx >= 0
    safe = jnp.maximum(nbr_idx, 0)
    nbrs = points[safe]  # (Q,K,3)
    w = valid[..., None].astype(points.dtype)
    count = jnp.maximum(jnp.sum(w, -2), 1.0)  # (Q,1)

    # pass 1: mean
    mean = jnp.sum(nbrs * w, -2) / count
    # pass 2: covariance of centered coordinates
    c = (nbrs - mean[:, None, :]) * w
    cov = jnp.einsum("qki,qkj->qij", c, c, precision=jax.lax.Precision.HIGHEST)
    cov = cov / count[..., None]

    normal = sym3_smallest_eigenvector(cov)
    # flip toward viewpoint
    to_vp = viewpoints - queries
    flip = jnp.sum(normal * to_vp, -1, keepdims=True) < 0
    normal = jnp.where(flip, -normal, normal)
    ok = jnp.sum(valid, -1) >= 3
    return jnp.where(ok[..., None], normal, 0.0), ok


@partial(jax.jit, static_argnames=("k",))
def estimate_normals_bruteforce(points, viewpoints, k: int):
    """Normals via exact kNN (small/medium clouds). ``viewpoints``: (N,3) or (3,)."""
    _, idx = knn_bruteforce(points, points, k + 1)
    idx = idx[:, 1:]  # drop self
    vp = jnp.broadcast_to(viewpoints, points.shape)
    return _normals_from_neighbors(points, points, idx, vp)


def estimate_normals(points, viewpoints, k: int = 8, grid: VoxelGrid | None = None,
                     max_per_cell: int = 32):
    """Normals + validity for every point. Uses the grid path when provided."""
    points = jnp.asarray(points, jnp.float32)
    vp = jnp.broadcast_to(jnp.asarray(viewpoints, jnp.float32), points.shape)
    if grid is None:
        return estimate_normals_bruteforce(points, vp, k)
    d2, idx, _ = knn_grid(grid, points, k + 1, max_per_cell)
    idx = idx[:, 1:]
    return _normals_from_neighbors(points, points, idx, vp)
