"""Offline batched fused step == the per-frame production step.

VisualHull.process_frames_offline runs the whole mask pipeline batched
over (frame, camera) and the frame-packed Pallas counts carve; these
gates require bit-identical per-frame occupancy and colors vs the
per-frame paths (process_frame / masks), including the chunk-padding
case where frames_per_launch does not divide F.  Reference analog: the
whole-video loop of assignment.py:94-149.
"""

import dataclasses

import numpy as np
import pytest

from vbr_tpu.pipelines import background
from vbr_tpu.utils import synthetic
from vbr_tpu.utils.config import (
    DEFAULT_MASK_PARAMS,
    GridConfig,
    MOGParams,
    RigConfig,
)

H, W = 64, 96
C = 4


@pytest.fixture(scope="module")
def model_and_frames():
    from vbr_tpu.models.visual_hull import VisualHull

    cams = synthetic.synthetic_cameras(C, image_hw=(H, W), f=80.0)
    grid = GridConfig(
        nx=32, ny=32, nz=32,
        x_min=-900, x_max=1100, y_min=-1050, y_max=950,
        z_min=-1700, z_max=300,
    )
    mask_params = tuple(
        dataclasses.replace(p, figure_threshold=40.0, inner_threshold=8.0)
        for p in DEFAULT_MASK_PARAMS[:C]
    )
    model = VisualHull(
        cams, grid, RigConfig(image_height=H, image_width=W),
        mask_params=mask_params,
    )
    rng = np.random.default_rng(7)
    bg = rng.integers(0, 200, size=(C, 6, H, W, 3), dtype=np.uint8)
    p = MOGParams(history=6)
    model.bg_states = [
        background.train_background_model(bg[c], p) for c in range(C)
    ]
    model.mog_params = [p] * C

    # 3 distinct frame-sets: a standing figure, a shifted one, a taller one
    base = bg[:, 0].copy()
    f0 = base.copy()
    f0[:, 14:44, 22:60] = 255
    f1 = base.copy()
    f1[:, 18:48, 30:68] = 255
    f2 = base.copy()
    f2[:, 8:50, 26:58] = 255
    return model, np.stack([f0, f1, f2])  # F=3


def test_offline_matches_per_frame(model_and_frames):
    model, frames = model_and_frames
    # frames_per_launch=2 with F=3 exercises the repeat-last-frame padding
    occ, colors = model.process_frames_offline(
        frames, frames_per_launch=2, interpret=True
    )
    assert occ.shape == (3, model.grid.num_voxels)
    assert occ.any(), "degenerate fixture: nothing carved"
    for f in range(3):
        occ_ref, col_ref = model.process_frame(frames[f])
        occ_ref = np.asarray(occ_ref)
        np.testing.assert_array_equal(occ[f], occ_ref)
        idx, col = colors[f]
        np.testing.assert_array_equal(idx, np.flatnonzero(occ_ref))
        np.testing.assert_array_equal(col, np.asarray(col_ref)[idx])
    # the three inputs differ → the three hulls should too
    assert not (occ[0] == occ[1]).all()


def test_offline_no_colors(model_and_frames):
    model, frames = model_and_frames
    occ, colors = model.process_frames_offline(
        frames[:2], frames_per_launch=2, with_colors=False, interpret=True
    )
    assert colors is None
    assert occ.shape[0] == 2


def test_offline_rejects_non_divisible_grid():
    from vbr_tpu.models.visual_hull import VisualHull

    cams = synthetic.synthetic_cameras(C, image_hw=(H, W), f=80.0)
    grid = GridConfig(nx=12, ny=12, nz=12)  # not 8-divisible
    model = VisualHull(cams, grid, RigConfig(image_height=H, image_width=W))
    model.bg_states = [None] * C
    with pytest.raises(ValueError, match="8-divisible"):
        model._ensure_fast_state = lambda: None  # skip GMM state for the check
        model.process_frames_offline(
            np.zeros((1, C, H, W, 3), np.uint8), interpret=True
        )
