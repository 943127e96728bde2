"""Disk-cache round trips: multiscale levels + neighbor/descriptor blobs.

Counterpart of the reference's multi-res cloud cache incl. the raw
neighbor-index blob (``opt/problem.cc:62-159,364-411``).
"""

import numpy as np
import pytest

from dataset_pipeline_tpu.photometric.cache import (
    load_multiscale_cache,
    load_photo_levels_cache,
    save_multiscale_cache,
    save_photo_levels_cache,
)
from dataset_pipeline_tpu.photometric.multiscale import PointLevel
from dataset_pipeline_tpu.photometric.problem import build_photo_level

PARAMS = {"num_points": 400, "scale_count": 2, "num_images": 2}


def _levels(rng):
    pts = rng.rand(400, 3).astype(np.float32)
    inten = (rng.rand(400) * 255).astype(np.float32)
    scans = (rng.rand(400) < 0.5).astype(np.uint8)
    return [PointLevel(pts, inten, scans, 0.01),
            PointLevel(pts[:100], inten[:100], scans[:100], 0.02)]


def test_multiscale_cache_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    levels = _levels(rng)
    save_multiscale_cache(str(tmp_path), levels, PARAMS)
    loaded = load_multiscale_cache(str(tmp_path), PARAMS)
    assert loaded is not None and len(loaded) == 2
    np.testing.assert_array_equal(loaded[0].points, levels[0].points)
    np.testing.assert_array_equal(loaded[1].intensities, levels[1].intensities)
    assert loaded[0].radius == levels[0].radius
    # parameter mismatch invalidates
    assert load_multiscale_cache(str(tmp_path), {**PARAMS, "num_points": 7}) is None


def test_photo_level_cache_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    raw = _levels(rng)
    photo = [build_photo_level(lv, seed=i, apply_gradient_filter=False)
             for i, lv in enumerate(raw)]
    save_photo_levels_cache(str(tmp_path), photo, PARAMS)
    loaded = load_photo_levels_cache(str(tmp_path), PARAMS)
    assert loaded is not None and len(loaded) == 2
    for a, b in zip(photo, loaded):
        np.testing.assert_array_equal(np.asarray(a.neighbors),
                                      np.asarray(b.neighbors))
        np.testing.assert_array_equal(np.asarray(a.fixed_descriptors),
                                      np.asarray(b.fixed_descriptors))
        np.testing.assert_array_equal(np.asarray(a.points), np.asarray(b.points))
        assert a.radius == b.radius
    # determinism across a rebuild: same seed -> same neighbor picks
    photo2 = [build_photo_level(lv, seed=i, apply_gradient_filter=False)
              for i, lv in enumerate(raw)]
    for a, b in zip(photo, photo2):
        np.testing.assert_array_equal(np.asarray(a.neighbors),
                                      np.asarray(b.neighbors))
    # parameter mismatch invalidates
    assert load_photo_levels_cache(str(tmp_path), {**PARAMS, "num_images": 9}) is None


@pytest.mark.slow
def test_neighbor_selection_scales_to_1m_points():
    """10^6-point level processed in seconds via the native threaded
    grid-kNN (``native/gridder.cc:grid_knn``): exact expanding-ring
    search, no all-N brute force anywhere. Observed ~10s on the 2-core
    CI box (was 475s via the device grid path); budget leaves >3x."""
    import time

    from dataset_pipeline_tpu.photometric.problem import determine_point_neighbors

    rng = np.random.RandomState(9)
    n = 1_000_000
    pts = rng.rand(n, 3).astype(np.float32) * 20.0
    scans = (rng.rand(n) < 0.5).astype(np.uint8)
    t0 = time.time()
    nbr = determine_point_neighbors(pts, scans, seed=0)
    dt = time.time() - t0
    assert nbr.shape == (n, 5)
    assert (nbr >= 0).all() and (nbr < n).all()
    assert not (nbr == np.arange(n)[:, None]).any()
    print(f"\n1M-point neighbor selection: {dt:.1f}s")
    assert dt < 60.0, f"neighbor selection too slow: {dt:.1f}s"


@pytest.mark.slow
def test_native_knn_smoke_10m_points():
    """Production-scale smoke: exact kNN (k=26, the reference's 25
    candidates + self) over 10^7 points. The reference's scans reach
    28M points (``README.md:303-306``); observed ~60s here, so 28M is
    ~3 min on this 2-core box — plausibly reachable. Time is logged."""
    import time

    from dataset_pipeline_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable (no compiler)")
    rng = np.random.RandomState(1)
    n = 10_000_000
    pts = (rng.rand(n, 3).astype(np.float32) * 40.0)
    t0 = time.time()
    d2, idx = native.grid_knn(pts, pts, 26, skip_self=True)
    dt = time.time() - t0
    print(f"\n10M-point exact kNN k=26: {dt:.1f}s")
    assert idx.shape == (n, 26)
    assert (idx[:, :5] >= 0).all()
    assert not (idx == np.arange(n)[:, None]).any()
    # exactness spot check against brute force on a random subset
    for qi in rng.choice(n, 5, replace=False):
        d = np.sum((pts - pts[qi]) ** 2, -1).astype(np.float64)
        d[qi] = np.inf
        ref = np.sort(d)[:26]
        np.testing.assert_allclose(np.sort(d2[qi]), ref, rtol=1e-4, atol=1e-9)
    assert dt < 240.0, f"10M kNN too slow: {dt:.1f}s"
