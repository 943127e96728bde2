"""Cost display-mode rendering tests (the GUI's cost fixed/variable/combined
modes, ``dataset_inspector/gui_main_window.h:47-61``)."""

import numpy as np

from dataset_pipeline_tpu.photometric.optimizer import PhotometricOptimizer

from scenes import synthetic_two_frame_problem


def test_render_cost_image_modes():
    problem = synthetic_two_frame_problem()
    opt = PhotometricOptimizer(problem, optimize_intrinsics=False,
                               variable_weight=1.0)
    opt.current_scale = 0
    vis = opt._visibility(opt._occlusion_depths())

    imgs = {}
    for which in ("fixed", "variable", "combined"):
        c = opt.render_cost_image(0, 0, which, vis=vis)
        assert c.shape == (120, 160)
        finite = np.isfinite(c)
        assert finite.sum() > 500, which
        assert (c[finite] >= 0).all(), which
        imgs[which] = c

    # at the ground-truth poses the variable-color residuals are near zero
    # (descriptors are re-estimated from these very images), so the variable
    # map must be substantially cheaper than the fixed map
    f = np.isfinite(imgs["fixed"]) & np.isfinite(imgs["variable"])
    assert imgs["variable"][f].mean() < imgs["fixed"][f].mean()

    try:
        opt.render_cost_image(0, 0, "nope", vis=vis)
    except ValueError:
        return
    raise AssertionError("expected ValueError for unknown mode")
