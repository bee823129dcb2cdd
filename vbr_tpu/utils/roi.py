"""Host-side motion ROI tracking for reduced-byte ingest (r5).

The streaming upload is link-bound on tunneled hosts; the subject
occupies a small, slowly-moving part of every camera view (golden-mask
bboxes ≤ 245×148 px of 486×644).  The tracker finds, per camera, a
fixed-capacity ROI window that contains everything the background model
would call foreground, by thresholding |value − background-mean value|
on a strided grid — the background reference is the frozen MOG model's
lead-mixture mean (the same model the device masks use), so a
stationary subject is detected just as well as a moving one (a pure
frame-difference tracker goes blind the moment the subject stands
still).

The tracker is advisory + GUARDED: `update` returns the per-camera
window origins plus `full_needed=True` whenever any above-threshold
pixel falls outside a window (or on the first frame), in which case the
caller must upload the full frame (exactness class unchanged — the ROI
path's loss is measured, not assumed; see
VisualHull.validate_reduced_ingest).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class MotionROITracker:
    """Per-camera fixed-size foreground ROI from coarse bg-difference.

    Parameters
    ----------
    bg_value : (C, H, W) float — background VALUE channel reference
        (e.g. the frozen MOG lead-mixture mean's V channel).
    roi_hw : static ROI window size (rows, cols); even (chroma 2×2).
    thresh : |value − bg| threshold on the strided grid.
    margin : px added around the detection bbox before clamping.
    stride : detection grid stride (host cost ∝ 1/stride²).
    """

    def __init__(self, bg_value: np.ndarray, roi_hw: Tuple[int, int],
                 thresh: float = 30.0, margin: int = 32, stride: int = 4):
        self.C, self.H, self.W = bg_value.shape
        self.rh, self.rw = roi_hw
        if self.rh % 2 or self.rw % 2:
            raise ValueError("roi_hw must be even (YUV 4:2:0 chroma)")
        if self.rh > self.H or self.rw > self.W:
            raise ValueError(f"roi_hw {roi_hw} exceeds image "
                             f"({self.H}, {self.W})")
        self.thresh = float(thresh)
        self.margin = int(margin)
        self.stride = int(stride)
        self.bg = bg_value[:, ::stride, ::stride].astype(np.float32)
        # start centered; the first update() always requests a full frame
        self.offsets = np.stack([
            np.full(self.C, (self.H - self.rh) // 2 & ~1, np.int32),
            np.full(self.C, (self.W - self.rw) // 2 & ~1, np.int32),
        ], axis=1)
        self._first = True

    def _value(self, frames: np.ndarray) -> np.ndarray:
        # OpenCV HSV value channel = max(B, G, R); strided grid
        return frames[:, ::self.stride, ::self.stride].max(axis=-1) \
            .astype(np.float32)

    def update(self, frames: np.ndarray):
        """(C, H, W, 3) u8 → (offsets (C, 2) i32 [y0, x0], full_needed).

        Offsets are even and clamped so the window stays in-frame.
        ``full_needed`` is True on the first frame and whenever a
        detection falls outside its camera's window.
        """
        det = np.abs(self._value(frames) - self.bg) > self.thresh
        full = self._first
        self._first = False
        s = self.stride
        for c in range(self.C):
            ys, xs = np.nonzero(det[c])
            if ys.size == 0:
                continue  # nothing detected: keep the last window
            y0 = ys.min() * s - self.margin
            y1 = (ys.max() + 1) * s + self.margin
            x0 = xs.min() * s - self.margin
            x1 = (xs.max() + 1) * s + self.margin
            if (y1 - y0) > self.rh or (x1 - x0) > self.rw:
                full = True  # subject bigger than the window
            # center the window on the detection, clamp, force even
            cy = max(0, min((y0 + y1 - self.rh) // 2, self.H - self.rh))
            cx = max(0, min((x0 + x1 - self.rw) // 2, self.W - self.rw))
            self.offsets[c] = (cy & ~1, cx & ~1)
            oy, ox = self.offsets[c]
            if (y0 < oy or x0 < ox or y1 > oy + self.rh
                    or x1 > ox + self.rw):
                full = True  # detection escapes the clamped window
        return self.offsets.copy(), bool(full)

    def crop(self, frames: np.ndarray) -> np.ndarray:
        """(C, H, W, 3) u8 → (C, rh, rw, 3) u8 at the current offsets."""
        out = np.empty((self.C, self.rh, self.rw, frames.shape[-1]),
                       frames.dtype)
        for c in range(self.C):
            y0, x0 = self.offsets[c]
            out[c] = frames[c, y0:y0 + self.rh, x0:x0 + self.rw]
        return out
