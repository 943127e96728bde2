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


def _neighbor_cell_ids(grid: VoxelGrid, queries, rings: int = 1):
    """(Q,(2r+1)^3) cell ids around each query; -1 for out-of-grid cells."""
    nx, ny, nz = grid.dims
    base = jnp.floor((queries - grid.origin) / grid.cell_size).astype(jnp.int32)  # (Q,3)
    r = jnp.arange(-rings, rings + 1)
    offs = jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    cells = base[:, None, :] + offs[None]  # (Q,ncells,3)
    inside = jnp.all(
        (cells >= 0) & (cells < jnp.asarray([nx, ny, nz])), axis=-1
    )
    ids = cells[..., 0] + nx * (cells[..., 1] + ny * cells[..., 2])
    return jnp.where(inside, ids, -1)


@partial(jax.jit, static_argnames=("max_per_cell", "chunk", "rings"))
def _gather_candidates(grid: VoxelGrid, queries, max_per_cell: int, chunk: int,
                       rings: int = 1):
    """For each query: candidate point indices (into sorted order) from the
    (2*rings+1)^3 surrounding cells, padded with -1, plus the number of
    candidates DROPPED per query by the ``max_per_cell`` cap (no silent
    caps — callers can detect and retry with a larger cap)."""
    ncells = (2 * rings + 1) ** 3

    def one_chunk(q):
        ids = _neighbor_cell_ids(grid, q, rings)  # (C,ncells)
        start = jnp.searchsorted(grid.cell_ids, ids, side="left")
        end = jnp.searchsorted(grid.cell_ids, ids, side="right")
        count = jnp.where(ids >= 0, end - start, 0)
        dropped = jnp.sum(jnp.maximum(count - max_per_cell, 0), -1)  # (C,)
        slots = jnp.arange(max_per_cell)  # (M,)
        cand = start[..., None] + slots[None, None, :]  # (C,ncells,M)
        valid = slots[None, None, :] < jnp.minimum(count, max_per_cell)[..., None]
        cand = jnp.where(valid, cand, -1)
        return cand.reshape(q.shape[0], -1), dropped

    Q = queries.shape[0]
    pad = (-Q) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    out, dropped = jax.lax.map(one_chunk, qp.reshape(-1, chunk, 3))
    return (out.reshape(-1, ncells * max_per_cell)[:Q],
            dropped.reshape(-1)[:Q])


@partial(jax.jit, static_argnames=("k", "max_per_cell", "chunk", "rings"))
def knn_grid(grid: VoxelGrid, queries, k: int, max_per_cell: int = 32,
             chunk: int = 2048, rings: int = 1):
    """k nearest neighbors within the (2*rings+1)^3-cell neighborhood (i.e.
    within ``rings * cell_size`` of the query guaranteed, more along
    diagonals).

    Returns (d2 (Q,k), idx (Q,k), dropped (Q,)) with ORIGINAL point indices;
    empty slots are (inf, -1). ``dropped[q] > 0`` means the ``max_per_cell``
    cap truncated some cells for this query and the result may be inexact —
    use ``knn_adaptive`` for a checked, auto-sized search.
    """
    queries = jnp.asarray(queries, jnp.float32)

    def one_chunk(args):
        q, cand = args  # (C,3), (C,ncells*M)
        valid = cand >= 0
        safe = jnp.maximum(cand, 0)
        pts = grid.points[safe]  # (C,ncells*M,3)
        diff = pts - q[:, None, :]
        d2 = jnp.sum(diff * diff, -1)
        d2 = jnp.where(valid, d2, jnp.inf)
        neg_d, sel = jax.lax.top_k(-d2, k)
        sel_cand = jnp.take_along_axis(safe, sel, axis=1)
        sel_valid = jnp.take_along_axis(valid, sel, axis=1)
        orig = jnp.where(sel_valid, grid.order[sel_cand], -1)
        return -neg_d, orig

    Q = queries.shape[0]
    cand, dropped = _gather_candidates(grid, queries, max_per_cell, chunk, rings)
    pad = (-Q) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    cp = jnp.pad(cand, ((0, pad), (0, 0)), constant_values=-1)
    d2, idx = jax.lax.map(
        one_chunk,
        (qp.reshape(-1, chunk, 3), cp.reshape(-1, chunk, cand.shape[1])),
    )
    k_ = d2.shape[-1]
    return d2.reshape(-1, k_)[:Q], idx.reshape(-1, k_)[:Q], dropped


def knn_adaptive(points, queries, k: int, chunk: int = 1024,
                 target_per_cell: int = 48, verbose: bool = False):
    """EXACT kNN at production scale: sized voxel-grid pass + brute-force
    repair of the queries the grid could not certify.

    The grid is sized from a sampled density estimate; after the pass, a
    query's result is certified exact iff (1) none of its cells hit the
    ``max_per_cell`` cap and (2) its k-th neighbor distance is within the
    guaranteed ring reach ``rings * cell_size``. Uncertified queries (dense
    hotspots, sparse fringes — a minority on real scans) are recomputed with
    the tiled brute-force kernel, so the result is always exact; the repair
    fraction is logged, never silently truncated (reference cleaner uses
    k=270, ``README.md:372``).

    Returns (d2 (Q,k), idx (Q,k)) sorted ascending.
    """
    pts = jnp.asarray(points, jnp.float32)
    queries = jnp.asarray(queries, jnp.float32)
    n = pts.shape[0]
    Q = queries.shape[0]
    k = min(k, n)
    if n <= max(4 * k, 20_000):
        return knn_bruteforce(queries, pts, k)

    rng = np.random.RandomState(0)
    sample = pts[rng.choice(n, size=min(n, 4096), replace=False)]
    d2s, _ = knn_bruteforce(sample, pts, 2)
    typical = float(np.median(np.sqrt(np.asarray(d2s)[:, 1])))
    typical = max(typical, 1e-9)
    # cell sized for ~target_per_cell points per cell at typical density;
    # rings sized so the gathered block holds ~3k points at that density
    cell = typical * target_per_cell ** (1.0 / 3.0)
    # ring reach must cover the expected k-th neighbor distance
    # ~ typical * k^(1/3) with headroom; cap the candidate tensor size
    rings = 1
    want_reach = 1.5 * typical * k ** (1.0 / 3.0)
    while (rings * cell < want_reach
           and (2 * rings + 3) ** 3 * target_per_cell <= 500_000):
        rings += 1

    grid = build_grid(pts, cell)
    d2, idx, dropped = knn_grid(grid, queries, k, target_per_cell, chunk, rings)
    d2 = np.array(d2)
    idx = np.array(idx)

    def _uncertified(d2_, idx_, dropped_, reach):
        kth = np.sqrt(np.maximum(d2_[:, -1], 0.0))
        return (np.asarray(dropped_) > 0) | (idx_[:, -1] < 0) | ~(kth <= reach)

    bad = _uncertified(d2, idx, dropped, rings * float(cell))
    # Repair pass 1..2: re-query ONLY the uncertified queries with wider
    # rings and a larger per-cell cap (still O(local block), never all-N).
    rep_rings, rep_cap = rings, target_per_cell
    for _ in range(2):
        n_bad = int(bad.sum())
        if n_bad == 0:
            break
        rep_rings += 2
        rep_cap *= 2
        if verbose:
            print(f"knn_adaptive: grid repair of {n_bad}/{Q} queries "
                  f"(rings={rep_rings}, cap={rep_cap})")
        sel = np.flatnonzero(bad)
        d2r, idxr, dropr = knn_grid(grid, queries[sel], k, rep_cap,
                                    min(chunk, 256), rep_rings)
        d2[sel] = np.asarray(d2r)
        idx[sel] = np.asarray(idxr)
        still = _uncertified(np.asarray(d2r), np.asarray(idxr), dropr,
                             rep_rings * float(cell))
        nxt = np.zeros_like(bad)
        nxt[sel[still]] = True
        bad = nxt
    n_bad = int(bad.sum())
    if n_bad:
        # last resort: tiled brute force for the residual handful
        if verbose or n_bad > Q // 10:
            print(f"knn_adaptive: brute-force repair of {n_bad}/{Q} queries "
                  f"(cell={cell:.4g}, rings={rings})")
        d2b, idxb = knn_bruteforce(queries[np.flatnonzero(bad)], pts, k)
        d2[bad] = np.asarray(d2b)
        idx[bad] = np.asarray(idxb)
    return jnp.asarray(d2), jnp.asarray(idx)


@partial(jax.jit, static_argnames=("max_results", "max_per_cell", "chunk"))
def radius_search(grid: VoxelGrid, queries, radius, max_results: int,
                  max_per_cell: int = 32, chunk: int = 2048):
    """All neighbors within ``radius`` (up to ``max_results`` nearest).

    Requires ``radius <= cell_size``. Returns (d2, idx) padded with (inf,-1).
    """
    d2, idx, _ = knn_grid(grid, queries, max_results, max_per_cell, chunk)
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    keep = d2 <= r2
    return jnp.where(keep, d2, jnp.inf), jnp.where(keep, idx, -1)


def nearest_neighbor(grid: VoxelGrid, queries, max_per_cell: int = 32, chunk: int = 2048):
    """Single nearest neighbor within the cell neighborhood: (d2 (Q,), idx (Q,))."""
    d2, idx, _ = knn_grid(grid, queries, 1, max_per_cell, chunk)
    return d2[:, 0], idx[:, 0]
