"""Interactive manual corner selection + interpolation fallback.

The reference's recovery path when chessboard auto-detection fails
(camera_calibration.py:38-133,299-393): the user clicks the 4 outer board
corners (or click-sorts automatically-estimated ones), the full inner
lattice is interpolated through the 4-point homography, sub-pixel refined,
and shown for acceptance.

The interaction layer is separable for testing: ``ManualCornerSession``
consumes click events from any source; ``run_interactive`` feeds it from
an OpenCV window (requires a display).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from vbr_tpu.ops import corners as corner_ops


class ManualCornerSession:
    """State machine: collect 4 clicks → interpolate → accept/reject.

    Click semantics follow the reference's selection UI: left click adds a
    corner (max 4), right click removes the most recent
    (manual_corner_selection, camera_calibration.py:38-87).
    """

    def __init__(self, gray: np.ndarray, pattern_size: Tuple[int, int] = (8, 6),
                 corners_are_outer: bool = True, refine: bool = True):
        self.gray = gray
        self.pattern_size = pattern_size
        self.corners_are_outer = corners_are_outer
        self.refine = refine
        self.clicks: List[Tuple[float, float]] = []
        self.result: Optional[np.ndarray] = None

    def click(self, x: float, y: float):
        if len(self.clicks) < 4:
            self.clicks.append((float(x), float(y)))
        if len(self.clicks) == 4:
            self._interpolate()

    def undo(self):
        if self.clicks:
            self.clicks.pop()
            self.result = None

    def _interpolate(self):
        quad = np.asarray(self.clicks, dtype=np.float64)
        pts = corner_ops.interpolate_image_points_from_corners(
            quad, self.pattern_size, self.corners_are_outer
        )
        if self.refine:
            import jax.numpy as jnp

            pts = np.asarray(
                corner_ops.corner_subpix(
                    jnp.asarray(self.gray), jnp.asarray(pts), (5, 5)
                )
            )
        self.result = pts

    @property
    def done(self) -> bool:
        return self.result is not None


def run_interactive(
    frame_bgr: np.ndarray, pattern_size=(8, 6), window="select corners"
) -> Optional[np.ndarray]:  # pragma: no cover — needs a display
    """OpenCV click UI: 4 left-clicks select the outer corners; right click
    undoes; Enter accepts the interpolated lattice, Esc aborts."""
    import cv2

    gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
    session = ManualCornerSession(gray, pattern_size)

    def on_mouse(event, x, y, flags, param):
        if event == cv2.EVENT_LBUTTONDOWN:
            session.click(x, y)
        elif event == cv2.EVENT_RBUTTONDOWN:
            session.undo()

    cv2.namedWindow(window)
    cv2.setMouseCallback(window, on_mouse)
    while True:
        vis = frame_bgr.copy()
        for x, y in session.clicks:
            cv2.circle(vis, (int(x), int(y)), 4, (0, 0, 255), -1)
        if session.done:
            for x, y in session.result:
                cv2.circle(vis, (int(x), int(y)), 2, (0, 255, 0), -1)
        cv2.imshow(window, vis)
        key = cv2.waitKey(30) & 0xFF
        if key == 27:  # Esc
            cv2.destroyWindow(window)
            return None
        if key in (13, 10) and session.done:  # Enter
            cv2.destroyWindow(window)
            return session.result
