"""Host-side foreground ROI tracking for reduced-byte ingest (r5).

The streaming upload is link-bound on tunneled hosts; the subject
occupies a small part of every camera view (golden-mask bboxes ≤
245×148 of 486×644).  The tracker finds, per camera, a fixed-capacity
ROI window containing every foreground region that could SURVIVE the
contour-hierarchy cleanup, using the SAME classifier the device masks
use — the frozen MOG prefix (``gmm.apply_frozen_compressed`` semantics:
background iff some valid mixture has channel-summed squared distance
below its threshold) replicated in numpy on a strided grid (~78K pixels
at stride 4: ~2 ms/frame).  A value-difference heuristic was measured
useless on the real rig (the background is multi-modal: Ke=3 prefix
mixtures; single-mean diffs light up half the image).

Containment reasons in COMPONENT SIZES, which is what the cleanup
itself does: a foreground component below ``figure_threshold`` pixels
is removed by the CCL cleanup anyway (background_subtraction.py:176-193
semantics), so missing it cannot change the cleaned masks — and on the
real rig the raw masks genuinely cover 3-6 % of every image in
scattered sub-threshold components (shadows/reflections), so any
density heuristic drowns.  The tracker labels the strided detections
(cv2.connectedComponentsWithStats, C++), takes the union bbox of the
components large enough to possibly survive the cleanup
(≥ 0.8·figure_threshold/stride² cells), and requests a full-frame
fallback only when that bbox cannot fit the window.  The ROI path's
loss is still MEASURED, not assumed
(VisualHull.validate_reduced_ingest).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _keeper_bbox(det_u8: np.ndarray, min_cells: int):
    """Union bbox (y0, y1, x0, x1) of the 8-connected components with
    ≥ ``min_cells`` cells, or None if there are none (cv2 C++ CCL)."""
    import cv2

    n, _labels, stats, _cent = cv2.connectedComponentsWithStats(
        det_u8, connectivity=8)
    big = [k for k in range(1, n)
           if stats[k, cv2.CC_STAT_AREA] >= min_cells]
    if not big:
        return None
    x0 = min(stats[k, cv2.CC_STAT_LEFT] for k in big)
    y0 = min(stats[k, cv2.CC_STAT_TOP] for k in big)
    x1 = max(stats[k, cv2.CC_STAT_LEFT] + stats[k, cv2.CC_STAT_WIDTH]
             for k in big)
    y1 = max(stats[k, cv2.CC_STAT_TOP] + stats[k, cv2.CC_STAT_HEIGHT]
             for k in big)
    return y0, y1, x0, x1


class MotionROITracker:
    """Per-camera fixed-size foreground ROI from the frozen MOG prefix.

    Parameters
    ----------
    mean, thr, bcount : the frozen state's arrays (numpy views are
        fine) — mean (C, H, W, Ke, 3), thr (C, H, W, Ke),
        bcount (C, H, W).
    roi_hw : static ROI window size (rows, cols); even (chroma 2×2).
    use_hsv : classify in HSV (the production configuration).
    figure_threshold : the smallest CCL keep threshold across cameras
        (full-resolution pixels); outside detections provably below it
        are ignored.
    margin : px added around the detection bbox before clamping.
    stride : detection grid stride (host cost ∝ 1/stride²).
    """

    def __init__(self, mean: np.ndarray, thr: np.ndarray,
                 bcount: np.ndarray, roi_hw: Tuple[int, int],
                 use_hsv: bool = True, figure_threshold: float = 5000.0,
                 margin: int = 24, stride: int = 6):
        self.C, self.H, self.W = bcount.shape
        self.rh, self.rw = roi_hw
        if self.rh % 2 or self.rw % 2:
            raise ValueError("roi_hw must be even (YUV 4:2:0 chroma)")
        if self.rh > self.H or self.rw > self.W:
            raise ValueError(f"roi_hw {roi_hw} exceeds image "
                             f"({self.H}, {self.W})")
        s = int(stride)
        self.stride = s
        self.margin = int(margin)
        self.use_hsv = bool(use_hsv)
        self.mean = np.ascontiguousarray(
            np.asarray(mean)[:, ::s, ::s], np.float32)
        self.thr = np.ascontiguousarray(
            np.asarray(thr)[:, ::s, ::s], np.float32)
        self.bcount = np.ascontiguousarray(
            np.asarray(bcount)[:, ::s, ::s], np.int32)
        self.Ke = self.thr.shape[-1]
        # a strided cell stands for stride² pixels; only components
        # that could reach the keep threshold constrain the window
        self.min_cells = max(1, int(0.8 * figure_threshold / (s * s)))
        self.offsets = np.stack([
            np.full(self.C, (self.H - self.rh) // 2 & ~1, np.int32),
            np.full(self.C, (self.W - self.rw) // 2 & ~1, np.int32),
        ], axis=1)
        self._first = True

    def _foreground(self, frames: np.ndarray) -> np.ndarray:
        """(C, Hs, Ws) bool — the device classifier on the strided grid.

        One vectorized pass over all cameras; per-mixture accumulation
        avoids the (..., Ke)-wide temporaries (this loop is host-serial
        in the streaming dispatch, so constants matter)."""
        import cv2

        s = self.stride
        x = np.stack([
            cv2.cvtColor(np.ascontiguousarray(frames[c, ::s, ::s]),
                         cv2.COLOR_BGR2HSV)
            if self.use_hsv else
            np.ascontiguousarray(frames[c, ::s, ::s])
            for c in range(self.C)
        ]).astype(np.float32)
        bg = np.zeros(x.shape[:3], bool)
        for k in range(self.Ke):
            d = x - self.mean[:, :, :, k]
            d2 = d[..., 0] ** 2 + d[..., 1] ** 2 + d[..., 2] ** 2
            bg |= (k < self.bcount) & (d2 < self.thr[:, :, :, k])
        return ~bg

    def update(self, frames: np.ndarray):
        """(C, H, W, 3) u8 → (offsets (C, 2) i32 [y0, x0], full_needed).

        Offsets are even and clamped in-frame.  ``full_needed`` is True
        on the first frame and whenever the detections outside some
        window could hold a component the CCL cleanup would keep.
        """
        det = self._foreground(frames)
        full = self._first
        self._first = False
        s = self.stride
        for c in range(self.C):
            bb = _keeper_bbox(det[c].astype(np.uint8), self.min_cells)
            if bb is None:
                continue  # nothing the cleanup would keep: last window
            y0 = bb[0] * s - self.margin
            y1 = bb[1] * s + self.margin
            x0 = bb[2] * s - self.margin
            x1 = bb[3] * s + self.margin
            if (y1 - y0) > self.rh or (x1 - x0) > self.rw:
                full = True  # keepers cannot fit the window
            # center the window on the keepers either way (the next
            # frames benefit even after a one-frame full fallback)
            cy = max(0, min((y0 + y1 - self.rh) // 2, self.H - self.rh))
            cx = max(0, min((x0 + x1 - self.rw) // 2, self.W - self.rw))
            self.offsets[c] = (cy & ~1, cx & ~1)
        return self.offsets.copy(), bool(full)

    def crop(self, frames: np.ndarray) -> np.ndarray:
        """(C, H, W, 3) u8 → (C, rh, rw, 3) u8 at the current offsets."""
        out = np.empty((self.C, self.rh, self.rw, frames.shape[-1]),
                       frames.dtype)
        for c in range(self.C):
            y0, x0 = self.offsets[c]
            out[c] = frames[c, y0:y0 + self.rh, x0:x0 + self.rw]
        return out
