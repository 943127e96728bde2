"""TPU-native neighbor search: tiled brute force + voxel-grid search.

Replaces the reference's PCL KdTree usage (ICP correspondences
``icp/icp_point_to_plane.cc:42-105``, normal estimation
``geometry/two_pass_normal_3d.hpp``, outlier removal, point merging
``opt/multi_scale_point_cloud.cc:44-125``) with two array-first strategies:

- **Brute force, tiled**: a (Q,N) squared-distance matrix computed chunk-wise
  (`-2 q.p` on the MXU at float32-highest precision plus norm terms), reduced
  with `top_k`. Exact; right choice up to ~10^5 x 10^6 scale.
- **Voxel grid**: points are binned into a bounded uniform grid (cell size =
  search radius), sorted by cell id once; each query gathers up to
  ``max_per_cell`` candidates from its 27 neighboring cells via two
  `searchsorted` binary searches per cell, then exact distances select the
  result. Fully static shapes; scales to tens of millions of points.

All functions are jit-safe with static output shapes; invalid slots are
filled with ``fill_index=-1`` / inf distances.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Brute force (tiled)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn_bruteforce(queries, points, k: int, chunk: int = 4096):
    """Exact k nearest neighbors of each query among ``points``.

    Returns (distances_sq (Q,k), indices (Q,k)), sorted ascending.
    """
    n = points.shape[0]
    k = min(k, n)
    p_norm = jnp.sum(points * points, -1)  # (N,)

    def one_chunk(q):
        q_norm = jnp.sum(q * q, -1, keepdims=True)  # (C,1)
        # MXU matmul at highest precision: f32 exactness matters for distances
        cross = jax.lax.dot_general(
            q, points.T, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d2 = q_norm + p_norm[None, :] - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        neg_d, idx = jax.lax.top_k(-d2, k)
        return -neg_d, idx

    q = queries
    Q = q.shape[0]
    pad = (-Q) % chunk
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    qc = qp.reshape(-1, chunk, 3)
    d2, idx = jax.lax.map(one_chunk, qc)
    return d2.reshape(-1, k)[:Q], idx.reshape(-1, k)[:Q]


# ---------------------------------------------------------------------------
# Voxel grid
# ---------------------------------------------------------------------------


class VoxelGrid(NamedTuple):
    """Points sorted by voxel cell id over a bounded uniform grid."""

    points: jnp.ndarray  # (N,3) sorted by cell id
    order: jnp.ndarray  # (N,) original index of each sorted point
    cell_ids: jnp.ndarray  # (N,) sorted cell id per point
    origin: jnp.ndarray  # (3,)
    cell_size: jnp.ndarray  # scalar
    dims: tuple  # static (nx, ny, nz)


def build_grid(points, cell_size: float, origin=None, dims=None) -> VoxelGrid:
    """Bin points into a uniform grid and sort by cell id.

    ``origin``/``dims`` may be provided for jit-compatibility; by default they
    are computed on host from the data (requires concrete values).
    """
    if origin is None or dims is None:
        pts_np = np.asarray(points)
        lo = pts_np.min(0) - 0.5 * cell_size
        hi = pts_np.max(0) + 0.5 * cell_size
        origin = lo
        dims = tuple(int(v) for v in np.maximum(np.ceil((hi - lo) / cell_size), 1))
    origin = jnp.asarray(origin, jnp.float32)
    cs = jnp.asarray(cell_size, jnp.float32)
    return _build_grid_jit(jnp.asarray(points, jnp.float32), origin, cs, tuple(dims))


@partial(jax.jit, static_argnames=("dims",))
def _build_grid_jit(points, origin, cell_size, dims):
    nx, ny, nz = dims
    ijk = jnp.clip(
        jnp.floor((points - origin) / cell_size).astype(jnp.int32),
        0,
        jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32),
    )
    ids = ijk[:, 0] + nx * (ijk[:, 1] + ny * ijk[:, 2])
    order = jnp.argsort(ids)
    return VoxelGrid(points[order], order, ids[order], origin, cell_size, dims)


def _neighbor_cell_ids(grid: VoxelGrid, queries):
    """(Q,27) cell ids around each query; -1 for out-of-grid cells."""
    nx, ny, nz = grid.dims
    base = jnp.floor((queries - grid.origin) / grid.cell_size).astype(jnp.int32)  # (Q,3)
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"
        ),
        -1,
    ).reshape(27, 3)
    cells = base[:, None, :] + offs[None]  # (Q,27,3)
    inside = jnp.all(
        (cells >= 0) & (cells < jnp.asarray([nx, ny, nz])), axis=-1
    )
    ids = cells[..., 0] + nx * (cells[..., 1] + ny * cells[..., 2])
    return jnp.where(inside, ids, -1)


@partial(jax.jit, static_argnames=("max_per_cell", "chunk"))
def _gather_candidates(grid: VoxelGrid, queries, max_per_cell: int, chunk: int):
    """For each query: candidate point indices (into sorted order) from the 27
    surrounding cells, padded to 27*max_per_cell with -1."""

    def one_chunk(q):
        ids = _neighbor_cell_ids(grid, q)  # (C,27)
        start = jnp.searchsorted(grid.cell_ids, ids, side="left")  # (C,27)
        end = jnp.searchsorted(grid.cell_ids, ids, side="right")
        count = jnp.where(ids >= 0, end - start, 0)
        slots = jnp.arange(max_per_cell)  # (M,)
        cand = start[..., None] + slots[None, None, :]  # (C,27,M)
        valid = slots[None, None, :] < jnp.minimum(count, max_per_cell)[..., None]
        cand = jnp.where(valid, cand, -1)
        return cand.reshape(q.shape[0], -1)  # (C, 27*M)

    Q = queries.shape[0]
    pad = (-Q) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    out = jax.lax.map(one_chunk, qp.reshape(-1, chunk, 3))
    return out.reshape(-1, 27 * max_per_cell)[:Q]


@partial(jax.jit, static_argnames=("k", "max_per_cell", "chunk"))
def knn_grid(grid: VoxelGrid, queries, k: int, max_per_cell: int = 32, chunk: int = 2048):
    """k nearest neighbors within the 27-cell neighborhood (i.e. within
    ``cell_size`` of the query, possibly more along diagonals).

    Returns (d2 (Q,k), idx (Q,k)) with ORIGINAL point indices; empty slots
    are (inf, -1). Neighbors beyond the cell neighborhood are not found —
    choose ``cell_size`` >= the search radius you care about.
    """
    queries = jnp.asarray(queries, jnp.float32)

    def one_chunk(args):
        q, cand = args  # (C,3), (C,27M)
        valid = cand >= 0
        safe = jnp.maximum(cand, 0)
        pts = grid.points[safe]  # (C,27M,3)
        diff = pts - q[:, None, :]
        d2 = jnp.sum(diff * diff, -1)
        d2 = jnp.where(valid, d2, jnp.inf)
        neg_d, sel = jax.lax.top_k(-d2, k)
        sel_cand = jnp.take_along_axis(safe, sel, axis=1)
        sel_valid = jnp.take_along_axis(valid, sel, axis=1)
        orig = jnp.where(sel_valid, grid.order[sel_cand], -1)
        return -neg_d, orig

    Q = queries.shape[0]
    cand = _gather_candidates(grid, queries, max_per_cell, chunk)
    pad = (-Q) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    cp = jnp.pad(cand, ((0, pad), (0, 0)), constant_values=-1)
    d2, idx = jax.lax.map(
        one_chunk,
        (qp.reshape(-1, chunk, 3), cp.reshape(-1, chunk, cand.shape[1])),
    )
    k_ = d2.shape[-1]
    return d2.reshape(-1, k_)[:Q], idx.reshape(-1, k_)[:Q]


@partial(jax.jit, static_argnames=("max_results", "max_per_cell", "chunk"))
def radius_search(grid: VoxelGrid, queries, radius, max_results: int,
                  max_per_cell: int = 32, chunk: int = 2048):
    """All neighbors within ``radius`` (up to ``max_results`` nearest).

    Requires ``radius <= cell_size``. Returns (d2, idx) padded with (inf,-1).
    """
    d2, idx = knn_grid(grid, queries, max_results, max_per_cell, chunk)
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    keep = d2 <= r2
    return jnp.where(keep, d2, jnp.inf), jnp.where(keep, idx, -1)


def nearest_neighbor(grid: VoxelGrid, queries, max_per_cell: int = 32, chunk: int = 2048):
    """Single nearest neighbor within the cell neighborhood: (d2 (Q,), idx (Q,))."""
    d2, idx = knn_grid(grid, queries, 1, max_per_cell, chunk)
    return d2[:, 0], idx[:, 0]
