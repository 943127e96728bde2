"""Disk caches for expensive preprocessing (restart resilience).

Counterpart of the reference's multi-resolution point cloud cache
(``opt/problem.cc:62-159,364-411``: versioned metadata + per-scale payloads +
neighbor blobs, with a hard error asking the user to delete the cache on
parameter mismatch) and the observations cache
(``opt/observations_cache.cc``). Stored as one .npz per point level plus a
JSON metadata file; parameter mismatches invalidate automatically (we
regenerate instead of aborting, logging what changed).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from dataset_pipeline_tpu.photometric.multiscale import PointLevel

CACHE_VERSION = 1


def _meta(params: dict) -> dict:
    return {"version": CACHE_VERSION, **{k: float(v) if isinstance(v, (int, float)) else v
                                          for k, v in params.items()}}


def save_multiscale_cache(cache_dir: str, levels: List[PointLevel], params: dict) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    with open(os.path.join(cache_dir, "metadata.json"), "w") as f:
        json.dump({**_meta(params), "num_levels": len(levels)}, f)
    for i, lv in enumerate(levels):
        np.savez(
            os.path.join(cache_dir, f"level_{i}.npz"),
            points=lv.points, intensities=lv.intensities,
            scan_indices=lv.scan_indices, radius=np.float64(lv.radius),
        )


def save_photo_levels_cache(cache_dir: str, photo_levels, params: dict) -> None:
    """Persist the processed point levels INCLUDING the seeded K-neighbor
    indices and fixed descriptors (the reference caches this neighbor blob
    alongside the per-scale PLYs, ``opt/problem.cc:364-411``) so restarts
    skip both the kNN search and the gradient filter."""
    import numpy as np_

    os.makedirs(cache_dir, exist_ok=True)
    with open(os.path.join(cache_dir, "photo_metadata.json"), "w") as f:
        json.dump({**_meta(params), "num_levels": len(photo_levels)}, f)
    for i, pl in enumerate(photo_levels):
        np.savez(
            os.path.join(cache_dir, f"photo_level_{i}.npz"),
            points=np_.asarray(pl.points),
            intensities=np_.asarray(pl.intensities),
            scan_indices=np_.asarray(pl.scan_indices),
            neighbors=np_.asarray(pl.neighbors),
            fixed_descriptors=np_.asarray(pl.fixed_descriptors),
            radius=np.float64(pl.radius),
        )


def load_photo_levels_cache(cache_dir: str, params: dict):
    """Load cached PhotoLevels (device-uploaded); None on miss/mismatch."""
    import jax.numpy as jnp

    from dataset_pipeline_tpu.photometric.problem import PhotoLevel

    meta_path = os.path.join(cache_dir, "photo_metadata.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    expected = _meta(params)
    mismatched = [k for k in expected if meta.get(k) != expected[k]]
    if mismatched:
        print(f"photo-level cache invalidated (changed: {', '.join(mismatched)}); regenerating")
        return None
    levels = []
    for i in range(int(meta["num_levels"])):
        path = os.path.join(cache_dir, f"photo_level_{i}.npz")
        if not os.path.exists(path):
            return None
        z = np.load(path)
        levels.append(PhotoLevel(
            jnp.asarray(z["points"]), jnp.asarray(z["intensities"]),
            jnp.asarray(z["scan_indices"]), jnp.asarray(z["neighbors"]),
            jnp.asarray(z["fixed_descriptors"]), float(z["radius"]),
        ))
    return levels


def load_multiscale_cache(cache_dir: str, params: dict) -> Optional[List[PointLevel]]:
    meta_path = os.path.join(cache_dir, "metadata.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    expected = _meta(params)
    mismatched = [k for k in expected if meta.get(k) != expected[k]]
    if mismatched:
        print(f"multiscale cache invalidated (changed: {', '.join(mismatched)}); regenerating")
        return None
    levels = []
    for i in range(int(meta["num_levels"])):
        path = os.path.join(cache_dir, f"level_{i}.npz")
        if not os.path.exists(path):
            return None
        z = np.load(path)
        levels.append(PointLevel(z["points"], z["intensities"],
                                 z["scan_indices"], float(z["radius"])))
    return levels
