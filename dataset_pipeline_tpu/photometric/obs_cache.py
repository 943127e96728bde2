"""Observations cache: per-image visible-point compaction.

Counterpart of ``opt/observations_cache.{h,cc}``: the reference computes each
image's visible point-index lists ONCE at full resolution and later
iterations re-project only those indices instead of all points
(``observations_cache.cc:37-158``); lists persist to per-image binary files
and are regenerated when parameters change (``:84-88``).

TPU-first redesign: ragged index lists become fixed-shape **level views** —
for every (group, image, point level) the candidate set is

  1. computed with the LOOSEST visibility gate the schedule will ever use
     (``current_scale = 0``, doubled occlusion slack, no mask filter), so it
     is a superset of every later iteration's observations (modulo pose
     drift, the same approximation the reference accepts);
  2. closed under the K-neighbor relation, so descriptor residuals of every
     candidate can be evaluated inside the view;
  3. padded to a power-of-two bucket, keeping XLA shape specialization to
     O(log N) distinct compilations.

Per-iteration visibility / cost / H,b then run on the view's M points
(M << N for images that see a fraction of the scan) and results scatter back
to dense level arrays with drop-mode indices where needed.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

CACHE_VERSION = 1


def _bucket(n: int, minimum: int = 256) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclass
class LevelView:
    """Compacted geometry of one point level as seen by one image.

    ``gather_idx`` (M,) indexes the full level (padding repeats index 0 with
    ``core=False``); ``scatter_idx`` pads with N so drop-mode scatters ignore
    padding rows. ``neighbors`` are remapped into the view; every core
    point's K neighbors are guaranteed present.
    """

    gather_idx: jnp.ndarray  # (M,) int32, padded with 0
    scatter_idx: jnp.ndarray  # (M,) int32, padded with N
    core: jnp.ndarray  # (M,) bool — True for candidate (non-padding) rows
    points: jnp.ndarray  # (M,3)
    neighbors: jnp.ndarray  # (M,K) indices into the view
    fixed_descriptors: jnp.ndarray  # (M,K)
    count: int  # number of real (non-padding) rows

    @property
    def size(self) -> int:
        return int(self.gather_idx.shape[0])


def build_level_view(level, candidate_mask: np.ndarray) -> LevelView:
    """Close ``candidate_mask`` under the neighbor relation and compact."""
    neighbors = np.asarray(level.neighbors)
    n = neighbors.shape[0]
    core = np.asarray(candidate_mask, bool)
    ext_mask = core.copy()
    ext_mask[neighbors[core].ravel()] = True
    ext = np.flatnonzero(ext_mask).astype(np.int32)
    m = len(ext)
    mp = _bucket(max(m, 1))
    inv = np.zeros(n, np.int32)
    inv[ext] = np.arange(m, dtype=np.int32)
    # neighbors of non-core rows may fall outside the view; map them to the
    # row itself — their residuals are masked out anyway (only core rows can
    # contribute, and core rows have all K neighbors present by closure)
    nb = neighbors[ext]
    outside = ~ext_mask[nb]
    nb = inv[nb]
    nb[outside] = np.repeat(np.arange(m, dtype=np.int32)[:, None],
                            nb.shape[1], 1)[outside]

    gather = np.zeros(mp, np.int32)
    gather[:m] = ext
    scatter = np.full(mp, n, np.int32)
    scatter[:m] = ext
    core_v = np.zeros(mp, bool)
    core_v[:m] = core[ext]
    pts = np.asarray(level.points)[gather]
    pts[m:] = np.asarray([0.0, 0.0, -1.0], np.float32)  # behind any camera
    nb_full = np.zeros((mp, neighbors.shape[1]), np.int32)
    nb_full[:m] = nb
    nb_full[m:] = np.arange(m, mp, dtype=np.int32)[:, None]
    desc = np.asarray(level.fixed_descriptors)[gather]
    desc[m:] = 0.0
    return LevelView(
        jnp.asarray(gather), jnp.asarray(scatter), jnp.asarray(core_v),
        jnp.asarray(pts), jnp.asarray(nb_full), jnp.asarray(desc), m,
    )


class ObservationsCache:
    """Candidate-index store keyed by (group, image, level).

    Built once (typically after the first coarse scale, mirroring
    ``exe/image_registrator.cc:230-235``) and reused for all remaining
    iterations and scales.
    """

    def __init__(self):
        self._views: Dict[Tuple[int, int, int], LevelView] = {}
        self._masks: Dict[Tuple[int, int, int], np.ndarray] = {}

    def set_candidates(self, gi: int, b: int, l: int, level,
                       candidate_mask: np.ndarray) -> None:
        self._masks[(gi, b, l)] = np.asarray(candidate_mask, bool)
        self._views[(gi, b, l)] = build_level_view(level, candidate_mask)

    def view(self, gi: int, b: int, l: int) -> Optional[LevelView]:
        return self._views.get((gi, b, l))

    def candidates(self, gi: int, b: int, l: int) -> Optional[np.ndarray]:
        """The raw candidate mask this view was built from (drift checks)."""
        return self._masks.get((gi, b, l))

    def __contains__(self, key) -> bool:
        return key in self._views

    def stats(self) -> Tuple[int, int]:
        """(total candidate rows, total padded rows) across all views."""
        real = sum(v.count for v in self._views.values())
        padded = sum(v.size for v in self._views.values())
        return real, padded

    # -- persistence (``observations_cache.cc:43-158`` equivalent) ----------

    def save(self, path: str, levels) -> None:
        arrays = {"__version__": np.asarray([CACHE_VERSION])}
        for (gi, b, l), mask in self._masks.items():
            arrays[f"m_{gi}_{b}_{l}"] = np.packbits(mask)
            arrays[f"n_{gi}_{b}_{l}"] = np.asarray([len(mask)])
        tmp = path + ".tmp.npz"
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str, levels) -> Optional["ObservationsCache"]:
        """Returns None (regenerate) on any mismatch — the TPU replacement
        for the reference's LOG(FATAL)+delete-to-regenerate contract."""
        if not os.path.exists(path):
            return None
        try:
            data = np.load(path)
        except Exception:
            return None
        if "__version__" not in data or int(data["__version__"][0]) != CACHE_VERSION:
            return None
        cache = cls()
        for key in data.files:
            if not key.startswith("m_"):
                continue
            gi, b, l = (int(x) for x in key[2:].split("_"))
            if l >= len(levels):
                return None
            n = int(data["n_" + key[2:]][0])
            if n != int(levels[l].points.shape[0]):
                return None
            mask = np.unpackbits(data[key])[:n].astype(bool)
            cache.set_candidates(gi, b, l, levels[l], mask)
        return cache
