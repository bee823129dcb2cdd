"""Reduced-byte YUV 4:2:0 ingest (r5, VERDICT r4 #6).

The wire format halves the host→device upload on link-bound tunnels and
is explicitly lossy; these gates pin (a) the conversion's error
structure (luma path exact to ±1, chroma loss bounded on 2×2-constant
content), (b) the fused-program wiring: ingest="yuv420" in interpret
mode is BIT-IDENTICAL to running the BGR program on the reconstructed
frames (the loss happens in the format, never in the pipeline), and
(c) the measured guard (VisualHull.validate_reduced_ingest) that makes
enabling it an evidence-based decision.
"""

import dataclasses

import numpy as np
import pytest

from vbr_tpu.ops import color as color_ops
from vbr_tpu.pipelines import background
from vbr_tpu.utils import synthetic
from vbr_tpu.utils.config import (
    DEFAULT_MASK_PARAMS,
    GridConfig,
    MOGParams,
    RigConfig,
)

import jax.numpy as jnp

H, W = 64, 96
C = 4


def test_yuv420_shapes_and_dtype():
    rng = np.random.default_rng(0)
    fr = rng.integers(0, 256, size=(C, H, W, 3), dtype=np.uint8)
    packed = color_ops.bgr_to_yuv420_host(fr)
    assert packed.shape == (C, H * 3 // 2, W) and packed.dtype == np.uint8
    recon = np.asarray(color_ops.yuv420_to_bgr_u8(jnp.asarray(packed)))
    assert recon.shape == fr.shape and recon.dtype == np.uint8


def test_yuv420_luma_path_near_exact():
    # grayscale content: U=V=128 exactly, so reconstruction error is just
    # the integer luma rounding — at most 1 count
    v = np.arange(256, dtype=np.uint8)
    fr = np.broadcast_to(v[None, None, :, None], (1, 64, 256, 3)).copy()
    recon = np.asarray(color_ops.yuv420_to_bgr_u8(
        jnp.asarray(color_ops.bgr_to_yuv420_host(fr))))
    assert np.abs(recon.astype(int) - fr.astype(int)).max() <= 1


def test_yuv420_blocky_content_bounded():
    # 2×2-constant random content: chroma subsampling loses nothing, so
    # the total error is the round-trip arithmetic rounding (small)
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, size=(2, H // 2, W // 2, 3), dtype=np.uint8)
    fr = np.repeat(np.repeat(base, 2, axis=1), 2, axis=2)
    recon = np.asarray(color_ops.yuv420_to_bgr_u8(
        jnp.asarray(color_ops.bgr_to_yuv420_host(fr))))
    assert np.abs(recon.astype(int) - fr.astype(int)).max() <= 4


def test_unknown_ingest_rejected():
    from vbr_tpu.models.visual_hull import VisualHull

    cams = synthetic.synthetic_cameras(C, image_hw=(H, W), f=80.0)
    model = VisualHull(cams, GridConfig(nx=16, ny=16, nz=16),
                       RigConfig(image_height=H, image_width=W))
    with pytest.raises(ValueError, match="ingest"):
        next(iter(model.stream_viewer(iter([]), ingest="jpeg")))


@pytest.fixture(scope="module")
def model_and_frame():
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
    frame = bg[:, 0].copy()
    frame[:, 14:44, 22:60] = 255
    return model, frame


def test_fused_step_yuv_equals_bgr_on_reconstructed(model_and_frame):
    """ingest='yuv420' == the BGR program on the reconstructed frames,
    bitwise (interpret-mode production kernels): the format is the only
    lossy element."""
    from vbr_tpu.models import visual_hull as vhm

    model, frame = model_and_frame
    model._ensure_fast_state()
    model._ensure_btab()
    packed = color_ops.bgr_to_yuv420_host(frame)
    recon = np.asarray(color_ops.yuv420_to_bgr_u8(jnp.asarray(packed)))
    common = dict(
        btab_static=vhm._btab_static(model._btab),
        mask_params=model._mask_params_t,
        use_hsv=model.mog_params[0].use_hsv,
        fig_thresholds=model._fig_thresholds,
        inner_thresholds=model._inner_thresholds,
        views_threshold=model.rig.views_threshold,
        layout="canonical", interpret=True,
    )
    targs = (model._stacked_fz,)
    btargs = (model._btab.pk, model._btab.lcc, model._btab.vorig,
              model._btab.uorig, model._btab.allv, model._btab.ry,
              model._btab.rx)
    occ_y, col_y, ovf_y = vhm._full_step_pallas(
        *targs, jnp.asarray(packed), *btargs, ingest="yuv420", **common)
    occ_b, col_b, ovf_b = vhm._full_step_pallas(
        *targs, jnp.asarray(recon), *btargs, ingest="bgr", **common)
    np.testing.assert_array_equal(np.asarray(occ_y), np.asarray(occ_b))
    np.testing.assert_array_equal(np.asarray(col_y), np.asarray(col_b))
    np.testing.assert_array_equal(np.asarray(ovf_y), np.asarray(ovf_b))
    assert np.asarray(occ_y).sum() > 0  # non-degenerate


def test_validate_reduced_ingest_guard(model_and_frame):
    model, frame = model_and_frame
    report = model.validate_reduced_ingest(frame)
    assert set(report) == {
        "mask_iou", "mask_iou_min", "occ_diff_voxels", "occ_exact",
        "max_channel_err",
    }
    assert len(report["mask_iou"]) == C
    # high-contrast synthetic figure: the subsampling must be invisible
    # at the mask level
    assert report["mask_iou_min"] >= 0.98
    assert report["occ_exact"] > 0
    assert report["occ_diff_voxels"] <= 0.02 * report["occ_exact"]
