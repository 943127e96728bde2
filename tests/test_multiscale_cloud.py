"""Multi-scale point cloud builder unit tests.

Mirror of the reference's ``Test_MultiScalePointCloud`` binary
(``opt/test/test_multi_scale_point_cloud.cc:37,107,164``): PreprocessScans
(luma), MergeClosePoints (position averaged over ALL members, color from the
DOMINANT scan only), and CreateMultiScalePointCloud (octave radii).
"""

import numpy as np
import jax.numpy as jnp

from dataset_pipeline_tpu.models import cameras as cm
from dataset_pipeline_tpu.models.lie import SE3
from dataset_pipeline_tpu.photometric.multiscale import (
    build_multiscale_cloud,
    compute_min_max_point_radius,
    intensity_from_rgb,
    merge_close_points,
)


def test_intensity_luma_coefficients():
    """PreprocessScans grayscale = 0.299r + 0.587g + 0.114b
    (``multi_scale_point_cloud.cc:186-212``)."""
    c = np.asarray([[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]], np.uint8)
    i = intensity_from_rgb(c)
    assert np.allclose(i, [0.299 * 255, 0.587 * 255, 0.114 * 255, 255.0], atol=1e-3)


def test_merge_keeps_far_points():
    pts = np.asarray([[0, 0, 0], [10, 0, 0], [0, 10, 0]], np.float32)
    inten = np.asarray([10.0, 20.0, 30.0], np.float32)
    scans = np.zeros(3, np.uint8)
    maxr = np.asarray([1.0, 2.0, 3.0], np.float32)
    pos, mi, dom, mr = merge_close_points(pts, inten, scans, maxr, 0.5, 1)
    assert len(pos) == 3
    order = np.lexsort(pos.T)
    assert np.allclose(sorted(mi.tolist()), [10, 20, 30])
    assert np.allclose(sorted(mr.tolist()), [1, 2, 3])


def test_merge_position_all_scans_color_dominant_only():
    """Position averages over all member points; intensity averages over the
    dominant scan's members only (``MergeClosePoints``, ``.cc:44-125``)."""
    pts = np.asarray(
        [[0.40, 0.40, 0.40], [0.50, 0.40, 0.40], [0.45, 0.50, 0.40],
         [10.0, 10.0, 10.0]], np.float32)
    inten = np.asarray([10.0, 20.0, 90.0, 7.0], np.float32)
    scans = np.asarray([0, 0, 1, 0], np.uint8)  # cluster: 2x scan0 + 1x scan1
    maxr = np.asarray([1.0, 3.0, 2.0, 5.0], np.float32)
    pos, mi, dom, mr = merge_close_points(pts, inten, scans, maxr, 1.0, 2)
    assert len(pos) == 2
    ci = int(np.argmin(pos[:, 0]))  # the cluster cell
    fi = 1 - ci
    assert np.allclose(pos[ci], pts[:3].mean(0), atol=1e-6)
    assert dom[ci] == 0
    assert abs(mi[ci] - 15.0) < 1e-5  # mean of scan-0 members 10,20 — NOT 90
    assert abs(mr[ci] - 3.0) < 1e-6  # max over members
    assert abs(mi[fi] - 7.0) < 1e-5


def test_greedy_merge_done_neighbor_reinclusion():
    """Reference quirk (``.cc:88-109``): merged neighbors are marked done as
    SEEDS but still contribute to later clusters. A chain spaced 0.9d must
    produce clusters {p0,p1} and {p1,p2} — p1 averaged into both."""
    d = 1.0
    pts = np.asarray([[0, 0, 0], [0.9 * d, 0, 0], [1.8 * d, 0, 0]], np.float32)
    inten = np.asarray([10.0, 20.0, 40.0], np.float32)
    scans = np.zeros(3, np.uint8)
    maxr = np.asarray([1.0, 2.0, 3.0], np.float32)
    pos, mi, dom, mr = merge_close_points(pts, inten, scans, maxr, d, 1)
    assert len(pos) == 2
    order = np.argsort(pos[:, 0])
    assert np.allclose(pos[order[0]], [0.45, 0, 0], atol=1e-6)
    assert np.allclose(pos[order[1]], [1.35, 0, 0], atol=1e-6)
    assert np.allclose(sorted(mi.tolist()), [15.0, 30.0])
    assert np.allclose(sorted(mr.tolist()), [2.0, 3.0])


def test_native_greedy_matches_numpy_reference_impl():
    from dataset_pipeline_tpu import native
    from dataset_pipeline_tpu.photometric.multiscale import _greedy_merge_numpy

    if native.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.RandomState(0)
    n = 2000
    pts = rng.rand(n, 3).astype(np.float32) * 4
    inten = rng.rand(n).astype(np.float32) * 255
    scans = np.zeros(n, np.uint8)  # single scan: no dominant-scan tie ambiguity
    maxr = rng.rand(n).astype(np.float32)
    a = native.greedy_merge(pts, inten, scans, maxr, 0.12, 1)
    b = _greedy_merge_numpy(pts, inten, scans, maxr, 0.12, 1)
    assert a is not None
    assert len(a[0]) == len(b[0])
    assert np.allclose(a[0], b[0], atol=1e-5)
    assert np.allclose(a[1], b[1], atol=1e-3)
    assert np.allclose(a[3], b[3], atol=1e-6)


def _identity_pose(b=1):
    q = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (b, 1))
    t = jnp.zeros((b, 3), jnp.float32)
    return SE3(q, t)


def test_min_max_radius_pinhole():
    """For an on-axis pinhole point the 0.5-px radius is 0.5*z/f and the max
    radius divides by the min scaling factor (``ComputeMinMaxPointRadius``)."""
    cam = cm.make_camera("PINHOLE", 64, 64, [50.0, 50.0, 31.5, 31.5])
    pts = np.asarray([[0, 0, 2.0], [0, 0, 4.0]], np.float32)
    min_r, max_r = compute_min_max_point_radius(pts, _identity_pose(), cam, 0.25)
    assert np.allclose(min_r, [0.5 * 2 / 50, 0.5 * 4 / 50], rtol=1e-3)
    assert np.allclose(max_r, min_r / 0.25, rtol=1e-3)


def test_build_multiscale_octave_radii():
    rng = np.random.RandomState(0)
    cam = cm.make_camera("PINHOLE", 64, 64, [50.0, 50.0, 31.5, 31.5])
    n = 300
    z = rng.uniform(1.0, 8.0, n).astype(np.float32)
    x = rng.uniform(-0.15, 0.15, n).astype(np.float32) * z
    y = rng.uniform(-0.15, 0.15, n).astype(np.float32) * z
    pts = np.stack([x, y, z], -1)
    colors = rng.randint(0, 255, (n, 3)).astype(np.uint8)
    scans = np.zeros(n, np.uint8)
    levels = build_multiscale_cloud(pts, colors, scans, _identity_pose(), cam,
                                    image_scale_count=3)
    assert len(levels) >= 3
    # octave: radius doubles per level, starting at global_min * 1.05
    for a, b in zip(levels, levels[1:]):
        assert abs(b.radius / a.radius - 2.0) < 1e-6
    assert abs(levels[0].radius - (0.5 * 1.0 / 50) * 1.05) < 0.2 * levels[0].radius
    for lv in levels:
        assert len(lv.points) > 0
        assert lv.intensities.min() >= 0 and lv.intensities.max() <= 255
        assert len(lv.intensities) == len(lv.points) == len(lv.scan_indices)
    # each level's active set only contains points whose [min_r, max_r]
    # interval contains the level radius: with min_r = 0.5 z / f and
    # max_r = 4 min_r, a level at radius R only admits z in [fR/2, 2fR]
    for lv in levels:
        z = lv.points[:, 2]
        assert (z >= 50 * lv.radius / 2 / 1.3).all()
        assert (z <= 2 * 50 * lv.radius * 1.3).all()


def test_build_multiscale_unobserved_points_dropped():
    """Points behind the camera are never observed and must not appear."""
    cam = cm.make_camera("PINHOLE", 64, 64, [50.0, 50.0, 31.5, 31.5])
    pts = np.asarray([[0, 0, 2.0], [0, 0, 3.0], [0, 0, -5.0]], np.float32)
    colors = np.full((3, 3), 128, np.uint8)
    scans = np.zeros(3, np.uint8)
    levels = build_multiscale_cloud(pts, colors, scans, _identity_pose(), cam,
                                    image_scale_count=2)
    total = sum(len(lv.points) for lv in levels)
    assert total >= 1
    for lv in levels:
        assert (lv.points[:, 2] > 0).all()
