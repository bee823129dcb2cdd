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


# ---------------------------------------------------------------------------
# ROI ingest (r5: fixed-window upload on top of YUV 4:2:0)
# ---------------------------------------------------------------------------


def _toy_tracker(Ht, Wt, roi, figure_threshold=300.0):
    """Tracker over a single-mixture BGR background at value 60."""
    from vbr_tpu.utils.roi import MotionROITracker

    mean = np.full((2, Ht, Wt, 1, 3), 60.0, np.float32)
    thr = np.full((2, Ht, Wt, 1), 900.0, np.float32)  # |d|<~17/chan = bg
    bcount = np.ones((2, Ht, Wt), np.int32)
    return MotionROITracker(mean, thr, bcount, roi, use_hsv=False,
                            figure_threshold=figure_threshold,
                            margin=8, stride=4)


def test_roi_tracker_follows_and_guards():
    Ht, Wt = 128, 192
    tr = _toy_tracker(Ht, Wt, (64, 64))

    def frame_with_square(y, x):
        f = np.full((2, Ht, Wt, 3), 60, np.uint8)
        f[:, y:y + 24, x:x + 24] = 200
        return f

    offs, full = tr.update(frame_with_square(40, 60))
    assert full  # first frame always full
    offs, full = tr.update(frame_with_square(42, 64))
    assert not full
    for c in range(2):
        y0, x0 = offs[c]
        assert y0 <= 42 and y0 + 64 >= 42 + 24
        assert x0 <= 64 and x0 + 64 >= 64 + 24
        assert y0 % 2 == 0 and x0 % 2 == 0
    # a stationary subject keeps its window (classifier-based, not
    # frame-difference — it cannot go blind on a still subject)
    offs2, full = tr.update(frame_with_square(42, 64))
    assert not full and (offs2 == offs).all()
    # subject bigger than the window → guarded full fallback
    f = np.full((2, Ht, Wt, 3), 60, np.uint8)
    f[:, 10:120, 20:180] = 200
    _, full = tr.update(f)
    assert full


def test_roi_tracker_tolerates_specks_but_not_blobs():
    # figure_threshold 300 → keeper components need ≥ 15 strided cells:
    # the 24×24 subject qualifies, 4×4 specks never do
    Ht, Wt = 128, 192
    tr = _toy_tracker(Ht, Wt, (64, 64), figure_threshold=300.0)
    base = np.full((2, Ht, Wt, 3), 60, np.uint8)
    f = base.copy()
    f[:, 40:64, 60:84] = 200  # subject
    tr.update(f)  # first frame
    # a few isolated specks far away: provably below figure_threshold →
    # no fallback (the CCL cleanup would remove them anyway)
    f2 = f.copy()
    for (y, x) in ((8, 8), (120, 180), (100, 12)):
        f2[:, y:y + 4, x:x + 4] = 200
    _, full = tr.update(f2)
    assert not full
    # a second KEEPER-SIZE blob far from the subject: the union of
    # keepers cannot fit one window → fallback
    f3 = f.copy()
    f3[:, 90:126, 130:180] = 200
    _, full = tr.update(f3)
    assert full
    # ...whereas a blob the cleanup would drop anyway (< threshold)
    # does not force a fallback even when it cannot be covered
    tr2 = _toy_tracker(Ht, Wt, (64, 64), figure_threshold=20000.0)
    tr2.update(f)
    _, full = tr2.update(f3)
    assert not full


def test_raw_masks_roi_bit_identical_when_contained(model_and_frame):
    """The ROI mask stage == the full-frame stage, bitwise, whenever the
    window contains all foreground and the exact path has no raw
    positives outside it (frames equal the model mean there)."""
    import jax.numpy as jnp

    model, _ = model_and_frame
    model._ensure_fast_state()
    # frames exactly at the background mean -> raw mask 0 everywhere...
    mean0 = np.asarray(model._stacked_fz.mean)[:, :, :, 0]
    # build BGR frames whose HSV equals the lead mean is hard; instead
    # use the fixture background frames (raw noise possible) and CHECK
    # the premise instead of assuming it
    rng = np.random.default_rng(7)
    bg = rng.integers(0, 200, size=(C, 6, H, W, 3), dtype=np.uint8)
    frame = bg[:, 0].copy()
    frame[:, 20:44, 30:62] = 255  # fg strictly inside the window below
    raw_full = np.asarray(background.raw_masks_batched_fz(
        model._stacked_fz, jnp.asarray(frame), model._mask_params_t,
        model.mog_params[0].use_hsv,
    ))
    y0, x0, rh, rw = 8, 16, 48, 64
    outside = np.ones((C, H, W), bool)
    outside[:, y0:y0 + rh, x0:x0 + rw] = False
    if (raw_full[outside] > 0).any():
        pytest.skip("fixture premise violated: raw positives outside ROI")
    offsets = jnp.asarray(np.tile([y0, x0], (C, 1)).astype(np.int32))
    rois = jnp.asarray(frame[:, y0:y0 + rh, x0:x0 + rw])
    raw_roi = np.asarray(background.raw_masks_batched_fz_roi(
        model._stacked_fz, rois, offsets, model._mask_params_t,
        model.mog_params[0].use_hsv, image_hw=(H, W),
    ))
    np.testing.assert_array_equal(raw_roi, raw_full)


def test_fused_step_roi_matches_mask_pipeline(model_and_frame):
    """ingest='yuv420_roi' through the fused interpret-mode program ==
    the same masks computed via the ROI mask stage + tables carve."""
    import jax.numpy as jnp

    from vbr_tpu.models import visual_hull as vhm
    from vbr_tpu.ops import carve as carve_ops

    model, frame = model_and_frame
    model._ensure_fast_state()
    model._ensure_btab()
    y0, x0, rh, rw = 8, 16, 48, 64
    offsets = np.tile([y0, x0], (C, 1)).astype(np.int32)
    crops = frame[:, y0:y0 + rh, x0:x0 + rw]
    packed = color_ops.bgr_to_yuv420_host(crops)
    occ_y, col_y, ovf = vhm._full_step_pallas(
        model._stacked_fz, jnp.asarray(packed),
        model._btab.pk, model._btab.lcc, model._btab.vorig,
        model._btab.uorig, model._btab.allv, model._btab.ry,
        model._btab.rx, btab_static=vhm._btab_static(model._btab),
        mask_params=model._mask_params_t,
        use_hsv=model.mog_params[0].use_hsv,
        fig_thresholds=model._fig_thresholds,
        inner_thresholds=model._inner_thresholds,
        views_threshold=model.rig.views_threshold,
        layout="canonical", interpret=True,
        ingest="yuv420_roi", roi_offsets=jnp.asarray(offsets),
    )
    assert not bool(np.asarray(ovf).any())
    # reference: same recon ROI through the mask stage + tables carve
    recon = color_ops.yuv420_to_bgr_u8(jnp.asarray(packed))
    raw = background.raw_masks_batched_fz_roi(
        model._stacked_fz, recon, jnp.asarray(offsets),
        model._mask_params_t, model.mog_params[0].use_hsv,
        image_hw=(H, W),
    )
    cleaned, _ = background.ccl.clean_masks_batched(
        raw, model._fig_thresholds, model._inner_thresholds
    )
    masks = background.finalize_masks_batched(
        cleaned, model._mask_params_t
    )
    frames_full = background.paste_rois(
        recon, jnp.asarray(offsets), (H, W))
    occ_ref, col_ref = carve_ops.carve_from_tables(
        masks, frames_full, model.tables.valid, model.tables.lin_idx,
        views_threshold=model.rig.views_threshold,
        color_camera=model.rig.color_camera,
    )
    occ_ref = np.asarray(occ_ref)
    assert occ_ref.any(), "degenerate: nothing carved through the ROI"
    np.testing.assert_array_equal(np.asarray(occ_y), occ_ref)
    np.testing.assert_array_equal(
        np.asarray(col_y)[occ_ref], np.asarray(col_ref)[occ_ref])


def test_validate_reduced_ingest_roi_guard(model_and_frame):
    model, frame = model_and_frame
    report = model.validate_reduced_ingest(frame, ingest="yuv420_roi",
                                           roi_hw=(48, 64))
    # this fixture keeps 40-px noise blobs (figure_threshold=40), an
    # adversarial setting for windowed ingest — the production-rig
    # guard (threshold 5000, measured in scripts/bench_pipeline.py) is
    # the meaningful number; here only sanity is gated
    assert report["mask_iou_min"] >= 0.90
    assert report["occ_exact"] > 0
    assert report["occ_diff_voxels"] <= 0.15 * report["occ_exact"]


def test_native_pack_matches_numpy_reference():
    """The C++ pack is byte-identical to the numpy reference (which the
    device unpack inverts); skip cleanly where the toolchain is absent."""
    try:
        from vbr_tpu.native import yuv420_pack
    except Exception:
        pytest.skip("native host lib unavailable")
    rng = np.random.default_rng(3)
    fr = rng.integers(0, 256, size=(3, 34, 48, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        yuv420_pack(fr), color_ops._bgr_to_yuv420_numpy(fr))
