"""Timed interactive result previews (reference parity).

The reference shows intermediate results in `cv2.imshow` windows for a
configurable number of milliseconds, gated by a ``result_time_visible``
parameter where ≤0 disables the preview (background_subtraction.py:
277-280, camera_calibration.py:503-506).  This module reproduces that
contract while degrading gracefully on display-less hosts (CI, tunneled
TPU workers): the first failed ``imshow`` logs a keyed warning through
``utils.warnings_`` and all further previews become no-ops.
"""

from __future__ import annotations

import numpy as np

_DISABLED = False


def show_result(window: str, image: np.ndarray, ms: int) -> bool:
    """Show ``image`` in a named window for ``ms`` milliseconds.

    ``ms <= 0`` disables the preview (the reference's −1 convention).
    Returns True if the window was actually shown.  On hosts without a
    display server (or an OpenCV build without HighGUI) the first call
    warns once and subsequent calls are free no-ops.
    """
    global _DISABLED
    if ms <= 0 or _DISABLED:
        return False
    try:
        import cv2

        cv2.imshow(window, image)
        cv2.waitKey(int(ms))
        return True
    except Exception as exc:
        from vbr_tpu.utils import warnings_

        if _is_display_error(exc):
            # the HOST cannot show windows: latch off all future previews
            _DISABLED = True
            warnings_.show_warning(
                "preview_unavailable",
                f"interactive preview disabled ({type(exc).__name__}: {exc})",
            )
        else:
            # a bad CALL (e.g. unsupported image dtype) must not disable
            # previews of valid images later in the process
            warnings_.show_warning(
                "preview_failed",
                f"preview of {window!r} failed "
                f"({type(exc).__name__}: {exc})",
            )
        return False


def _is_display_error(exc: Exception) -> bool:
    """True when the exception means the HOST has no usable display (cv2
    built without HighGUI, or no display server) rather than a bad call."""
    if isinstance(exc, ImportError):
        return True
    msg = str(exc).lower()
    return any(
        s in msg
        for s in (
            "not implemented",  # cv2 built without HighGUI backend
            "display",          # no DISPLAY / cannot open display
            "gtk", "qt", "wayland", "cocoa",  # windowing backend failures
        )
    )


def close_all() -> None:
    """Destroy any preview windows.

    Always attempts the destroy (windows opened before a mid-run display
    failure set ``_DISABLED`` must still be torn down); swallows errors
    from headless cv2 builds."""
    try:
        import cv2

        cv2.destroyAllWindows()
    except Exception:
        pass
