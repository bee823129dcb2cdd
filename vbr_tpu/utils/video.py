"""Host-side video ingest.

The reference decodes with ``cv2.VideoCapture`` scattered across modules
(utils.py:177-249, assignment.py:74,94); decode cannot run on TPU, so this
is the host boundary: OpenCV decode into contiguous uint8 batches that
feed ``jax.device_put``.  A C++ threaded prefetch ring (vbr_tpu/native)
can be layered underneath for streaming pipelines.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np


def _capture(path: str):
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    return cap


def video_properties(path: str, accurate: bool = False) -> Tuple[int, int, int]:
    """(width, height, frame_count).  ``accurate`` decodes every frame to
    count (the reference's slow default, utils.py:211-249); otherwise uses
    the container metadata."""
    import cv2

    cap = _capture(path)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    if accurate:
        n = 0
        while cap.read()[0]:
            n += 1
    else:
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return w, h, n


def read_video(
    path: str, max_frames: Optional[int] = None, step: int = 1
) -> np.ndarray:
    """Decode a video into a (T, H, W, 3) uint8 BGR batch."""
    cap = _capture(path)
    frames = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % step == 0:
            frames.append(frame)
        i += 1
        if max_frames is not None and len(frames) >= max_frames:
            break
    cap.release()
    return np.stack(frames)


def frame_iterator(path: str) -> Iterator[np.ndarray]:
    """Stream frames one by one (the viewer's per-call advance,
    assignment.py:94)."""
    cap = _capture(path)
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        yield frame
    cap.release()


def get_frame(path: str, index: int) -> Optional[np.ndarray]:
    """Seek-by-decode single frame fetch (utils.py:177-208 semantics)."""
    cap = _capture(path)
    frame = None
    for _ in range(index + 1):
        ok, frame = cap.read()
        if not ok:
            cap.release()
            return None
    cap.release()
    return frame


class MultiCameraSource:
    """Synchronized per-camera video.avi streams for a rig."""

    def __init__(self, data_dir: str, num_cameras: int = 4,
                 filename: str = "video.avi"):
        import cv2

        self.caps = [
            cv2.VideoCapture(os.path.join(data_dir, f"cam{i}", filename))
            for i in range(1, num_cameras + 1)
        ]

    def next_frames(self) -> Optional[np.ndarray]:
        """(C, H, W, 3) u8 batch, or None at end-of-stream (any camera)."""
        frames = []
        for cap in self.caps:
            ok, frame = cap.read()
            if not ok:
                return None
            frames.append(frame)
        return np.stack(frames)

    def release(self):
        for cap in self.caps:
            cap.release()
