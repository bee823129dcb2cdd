"""Background-subtraction pipeline: GMM training + mask extraction.

The TPU-native counterpart of the reference's
``train_MOG_background_model`` + ``extract_foreground_mask``
(background_subtraction.py:49-87,129-208): per-pixel mixture models
trained with ``lax.scan`` over the background video, then a frozen apply
followed by morphology and the CCL-based contour cleanup.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vbr_tpu.ops import ccl, gmm, morphology
from vbr_tpu.ops import color as _color_ops
from vbr_tpu.utils.config import DEFAULT_MASK_PARAMS, MaskParams, MOGParams
from vbr_tpu.utils import video as video_io


def train_background_model(
    background_frames: np.ndarray,  # (T, H, W, 3) u8 BGR
    params: MOGParams = MOGParams(),
) -> gmm.MOGState:
    """Train the production MOG model (HSV, auto lr) over the sequence."""
    return gmm.train_mog(background_frames, params)


def extract_foreground_mask(
    state: gmm.MOGState,
    frame: np.ndarray,  # (H, W, 3) u8 BGR
    mask_params: MaskParams = MaskParams(),
    mog_params: MOGParams = MOGParams(),
    ccl_backend: str = "device",
) -> jnp.ndarray:
    """Full mask pipeline for one frame (reference
    background_subtraction.py:129-208):

      BGR→HSV → frozen GMM apply → optional pre open/close (3×3) →
      contour-hierarchy cleanup (fill big components, re-carve big holes) →
      optional post open/close (2×2) → binarize.

    ``ccl_backend``: "device" (default) keeps the cleanup on-TPU via the
    batched Pallas CCL (ops.ccl.clean_masks_batched; falls back to host
    per-frame on component-table overflow, preserving exactness);
    "host" routes the connectivity analysis through the native OpenCV CCL
    (identical output); "device-xla" uses the pure-XLA while-loop CCL.
    """
    raw = gmm.extract_mask(state, frame, mog_params)
    if mask_params.opening_pre:
        raw = morphology.opening(raw, (3, 3))
    if mask_params.closing_pre:
        raw = morphology.closing(raw, (3, 3))
    if ccl_backend == "host":
        cleaned = jnp.asarray(
            ccl.clean_mask_host(
                np.asarray(raw),
                mask_params.figure_threshold,
                mask_params.inner_threshold,
            )
        )
    elif ccl_backend == "device-xla":
        cleaned = ccl.clean_mask(
            raw, mask_params.figure_threshold, mask_params.inner_threshold
        )
    else:
        batch, ovf = ccl.clean_masks_batched(
            raw[None],
            (float(mask_params.figure_threshold),),
            (float(mask_params.inner_threshold),),
        )
        if bool(np.asarray(ovf)[0]):  # exact fallback
            cleaned = jnp.asarray(
                ccl.clean_mask_host(
                    np.asarray(raw),
                    mask_params.figure_threshold,
                    mask_params.inner_threshold,
                )
            )
        else:
            cleaned = batch[0]
    if mask_params.opening_post:
        cleaned = morphology.opening(cleaned, (2, 2))
    if mask_params.closing_post:
        cleaned = morphology.closing(cleaned, (2, 2))
    return jnp.where(cleaned > 0, jnp.uint8(255), jnp.uint8(0))


class BackgroundPipeline:
    """Per-rig background models + per-frame mask extraction.

    Mirrors the lazy initialization block of ``set_voxel_positions``
    (assignment.py:68-91): one model per camera, trained on that camera's
    background.avi with history = its frame count.
    """

    def __init__(
        self,
        data_dir: str,
        num_cameras: int = 4,
        mask_params: Sequence[MaskParams] = DEFAULT_MASK_PARAMS,
        mog_params: Optional[MOGParams] = None,
        cache_dir: Optional[str] = None,
    ):
        from vbr_tpu.utils import artifacts

        self.mask_params = list(mask_params)
        self.states: List[gmm.MOGState] = []
        self.mog_params: List[MOGParams] = []
        for cam in range(1, num_cameras + 1):
            cache_path = (
                os.path.join(cache_dir, f"mog_cam{cam}.npz") if cache_dir else None
            )
            state = artifacts.load_mog_state(cache_path) if cache_path else None
            if state is not None:
                p = mog_params or MOGParams(history=int(state.nframes))
            else:
                frames = video_io.read_video(
                    os.path.join(data_dir, f"cam{cam}", "background.avi")
                )
                p = mog_params or MOGParams(history=frames.shape[0])
                state = train_background_model(frames, p)
                if cache_path:
                    artifacts.save_mog_state(cache_path, state)
            self.states.append(state)
            self.mog_params.append(p)

    def masks_for_frames(
        self, frames: np.ndarray, ccl_backend: str = "host"
    ) -> np.ndarray:
        """(C, H, W, 3) u8 BGR → (C, H, W) u8 {0,255} cleaned masks."""
        out = []
        for c, frame in enumerate(frames):
            out.append(
                np.asarray(
                    extract_foreground_mask(
                        self.states[c],
                        frame,
                        self.mask_params[c],
                        self.mog_params[c],
                        ccl_backend=ccl_backend,
                    )
                )
            )
        return np.stack(out)


# ---------------------------------------------------------------------------
# Batched fast path: all cameras in one dispatch per stage
# ---------------------------------------------------------------------------


def stack_states(states: Sequence[gmm.MOGState]) -> gmm.MOGState:
    """Stack per-camera MOG states along a leading camera axis."""
    return gmm.MOGState(
        weight=jnp.stack([s.weight for s in states]),
        mean=jnp.stack([s.mean for s in states]),
        var=jnp.stack([s.var for s in states]),
        nframes=jnp.stack([s.nframes for s in states]),
    )


def stack_frozen(
    states: Sequence[gmm.MOGState], params: MOGParams
) -> gmm.FrozenMOGState:
    """Per-camera frozen states → one prefix-compressed stacked state.

    All cameras share the max prefix length so the apply batches as one
    (C, H, W, Ke) program; masks stay bitwise equal to the full-state
    apply (gmm.FrozenMOGState).
    """
    # ONE compression pass per state (ADVICE r3: the k_eff probe used to
    # run the full (H, W, K) reduction twice per camera on this one-core
    # host): compress at full prefix length, learn the shared k_eff from
    # the returned bcounts, then narrow the prefixes by slicing.
    K = states[0].weight.shape[-1]
    fulls = [gmm.compress_frozen(s, params, k_eff=K)[0] for s in states]
    k_eff = max(
        max((int(np.asarray(jnp.max(f.bcount))) for f in fulls), default=1),
        1,
    )
    return gmm.FrozenMOGState(
        mean=jnp.stack([f.mean[..., :k_eff, :] for f in fulls]),
        thr=jnp.stack([f.thr[..., :k_eff] for f in fulls]),
        bcount=jnp.stack([f.bcount for f in fulls]),
    )


@functools.partial(jax.jit, static_argnames=("mask_params", "use_hsv"))
def raw_masks_batched_fz(
    fz: gmm.FrozenMOGState,  # stacked, leading camera axis
    frames: jnp.ndarray,  # (C, H, W, 3) u8 BGR
    mask_params: tuple,  # per-camera MaskParams (static)
    use_hsv: bool = True,
) -> jnp.ndarray:
    """One dispatch: HSV + compressed frozen apply + per-camera
    pre-morphology.  Bitwise equal to :func:`raw_masks_batched` on the
    uncompressed state, ~6× less HBM traffic (the production fast path)."""
    hsv = jax.vmap(_color_ops.bgr_to_hsv_u8)(frames) if use_hsv else frames

    def apply_cam(c):
        raw = gmm.apply_frozen_compressed.__wrapped__(
            gmm.FrozenMOGState(
                mean=fz.mean[c], thr=fz.thr[c], bcount=fz.bcount[c]
            ),
            hsv[c],
        )
        mp = mask_params[c]
        if mp.opening_pre:
            raw = morphology.opening(raw, (3, 3))
        if mp.closing_pre:
            raw = morphology.closing(raw, (3, 3))
        return raw

    return jnp.stack([apply_cam(c) for c in range(frames.shape[0])])


@functools.partial(
    jax.jit, static_argnames=("mask_params", "use_hsv", "image_hw")
)
def raw_masks_batched_fz_roi(
    fz: gmm.FrozenMOGState,  # stacked, leading camera axis (full frame)
    rois: jnp.ndarray,  # (C, RH, RW, 3) u8 BGR crops
    offsets: jnp.ndarray,  # (C, 2) i32 window origins [y0, x0]
    mask_params: tuple,
    use_hsv: bool = True,
    *,
    image_hw: tuple,
) -> jnp.ndarray:
    """ROI variant of :func:`raw_masks_batched_fz` (r5 reduced-byte
    ingest): the frozen GMM applies to a fixed-size crop of each
    camera's state at a dynamic offset, the raw crop is pasted onto a
    zero (background) canvas, and the per-camera pre-morphology then
    runs FULL-frame — so given identical pixels inside the window and
    no true foreground outside it, the output is bit-identical to the
    full-frame path (test-gated).  Guarding that premise is the ROI
    tracker's job (utils.roi.MotionROITracker + the measured ingest
    guard)."""
    H, W = image_hw
    RH, RW = rois.shape[1:3]
    hsv = jax.vmap(_color_ops.bgr_to_hsv_u8)(rois) if use_hsv else rois

    def apply_cam(c):
        y0 = offsets[c, 0]
        x0 = offsets[c, 1]
        crop = gmm.FrozenMOGState(
            mean=jax.lax.dynamic_slice(
                fz.mean[c], (y0, x0, 0, 0),
                (RH, RW) + fz.mean.shape[3:]),
            thr=jax.lax.dynamic_slice(
                fz.thr[c], (y0, x0, 0), (RH, RW, fz.thr.shape[3])),
            bcount=jax.lax.dynamic_slice(
                fz.bcount[c], (y0, x0), (RH, RW)),
        )
        raw_roi = gmm.apply_frozen_compressed.__wrapped__(crop, hsv[c])
        raw = jax.lax.dynamic_update_slice(
            jnp.zeros((H, W), raw_roi.dtype), raw_roi, (y0, x0))
        mp = mask_params[c]
        if mp.opening_pre:
            raw = morphology.opening(raw, (3, 3))
        if mp.closing_pre:
            raw = morphology.closing(raw, (3, 3))
        return raw

    return jnp.stack([apply_cam(c) for c in range(rois.shape[0])])


def paste_rois(rois: jnp.ndarray, offsets: jnp.ndarray,
               image_hw: tuple) -> jnp.ndarray:
    """(C, RH, RW, 3) crops + (C, 2) origins → (C, H, W, 3) canvases
    (zeros outside the windows) — the color-frame stand-in for the ROI
    ingest (hull voxels project inside the subject's window, so viewer
    colors are unaffected in practice; measured by the ingest guard)."""
    H, W = image_hw

    def one(roi, off):
        return jax.lax.dynamic_update_slice(
            jnp.zeros((H, W, roi.shape[-1]), roi.dtype), roi,
            (off[0], off[1], 0))

    return jax.vmap(one)(rois, offsets)


@functools.partial(jax.jit, static_argnames=("mask_params", "mog_params"))
def raw_masks_batched(
    stacked: gmm.MOGState,
    frames: jnp.ndarray,  # (C, H, W, 3) u8 BGR
    mask_params: tuple,  # per-camera MaskParams (static)
    mog_params: MOGParams,
) -> jnp.ndarray:
    """One dispatch: HSV + frozen GMM apply + per-camera pre-morphology.

    The per-camera morphology flags are static config, so the camera loop
    unrolls at trace time (4 slightly-different branches in one program).
    """
    hsv = jax.vmap(_color_ops.bgr_to_hsv_u8)(frames) if mog_params.use_hsv \
        else frames

    def apply_cam(c):
        st = gmm.MOGState(
            weight=stacked.weight[c], mean=stacked.mean[c],
            var=stacked.var[c], nframes=stacked.nframes[c],
        )
        raw = gmm.apply_frozen(st, hsv[c], mog_params)
        mp = mask_params[c]
        if mp.opening_pre:
            raw = morphology.opening(raw, (3, 3))
        if mp.closing_pre:
            raw = morphology.closing(raw, (3, 3))
        return raw

    return jnp.stack([apply_cam(c) for c in range(frames.shape[0])])


@functools.partial(jax.jit, static_argnames=("mask_params",))
def finalize_masks_batched(
    cleaned: jnp.ndarray,  # (C, H, W) u8 after CCL cleanup
    mask_params: tuple,
) -> jnp.ndarray:
    """One dispatch: per-camera post-morphology + binarize."""

    def post(c):
        m = cleaned[c]
        mp = mask_params[c]
        if mp.opening_post:
            m = morphology.opening(m, (2, 2))
        if mp.closing_post:
            m = morphology.closing(m, (2, 2))
        return jnp.where(m > 0, jnp.uint8(255), jnp.uint8(0))

    return jnp.stack([post(c) for c in range(cleaned.shape[0])])
