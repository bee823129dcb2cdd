"""ctypes bindings for the native host runtime (see vbr_host.cpp).

Provides:
  * :class:`PrefetchingSource` — threaded multi-camera decode with a
    bounded ring buffer (overlaps host decode with device compute).
  * :class:`MOGOracle` — the actual ``cv::bgsegm`` C++ MOG model, used as
    the parity oracle for the JAX implementation (the Python cv2 wheel
    here lacks the bgsegm contrib module).
  * :class:`VideoSink` — mp4v encoder for annotated calibration artifacts
    (reference camera_calibration.py:441-444,508-509).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        from vbr_tpu.native.build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.vbr_source_open.restype = ctypes.c_void_p
        lib.vbr_source_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ]
        lib.vbr_source_dims.restype = ctypes.c_int
        lib.vbr_source_dims.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vbr_source_next.restype = ctypes.c_int
        lib.vbr_source_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.vbr_source_close.argtypes = [ctypes.c_void_p]

        lib.vbr_mog_create.restype = ctypes.c_void_p
        lib.vbr_mog_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ]
        lib.vbr_mog_apply.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_void_p,
        ]
        lib.vbr_mog_release.argtypes = [ctypes.c_void_p]

        lib.vbr_writer_create.restype = ctypes.c_void_p
        lib.vbr_writer_create.argtypes = [
            ctypes.c_char_p, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ]
        lib.vbr_writer_write.restype = ctypes.c_int
        lib.vbr_writer_write.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.vbr_writer_release.argtypes = [ctypes.c_void_p]

        lib.vbr_yuv420_pack.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
        ]

        lib.vbr_mc_emit.restype = ctypes.c_int
        lib.vbr_mc_emit.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _LIB = lib
    return _LIB


def mc_emit(idx, cfg, n, table, tvalid, ny1, nz1, origin, spacing):
    """Native triangle emission from a surface-wire result — bitwise
    identical to the numpy reference in ops/marching_cubes
    (test-gated); the numpy tail costs ~300-400 ms/frame on this
    one-core host."""
    n = min(int(n), len(idx), len(cfg))  # truncated-result safety
    idx = np.ascontiguousarray(idx[:n], np.int32)
    cfg = np.ascontiguousarray(cfg[:n], np.uint8)
    T = table.shape[1]
    table = np.ascontiguousarray(table, np.float32)
    tvalid = np.ascontiguousarray(tvalid, np.uint8)
    origin = np.ascontiguousarray(origin, np.float32)
    spacing = np.ascontiguousarray(spacing, np.float32)
    out = np.empty((int(n) * T, 3, 3), np.float32)
    m = _lib().vbr_mc_emit(
        idx.ctypes.data_as(ctypes.c_void_p),
        cfg.ctypes.data_as(ctypes.c_void_p), int(n),
        table.ctypes.data_as(ctypes.c_void_p),
        tvalid.ctypes.data_as(ctypes.c_void_p), T,
        int(ny1), int(nz1),
        origin.ctypes.data_as(ctypes.c_void_p),
        spacing.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out[:m]


def yuv420_pack(frames: np.ndarray) -> np.ndarray:
    """Native BGR→YUV 4:2:0 pack ((C, H, W, 3) u8 → (C, H·3/2, W) u8),
    byte-identical to ops.color's numpy reference (test-gated) at
    memory speed (the numpy pack costs ~107 ms per 4-camera set on this
    one-core host — it was the streaming bottleneck, not the link)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    C, H, W = frames.shape[:3]
    out = np.empty((C, H * 3 // 2, W), np.uint8)
    _lib().vbr_yuv420_pack(
        frames.ctypes.data_as(ctypes.c_void_p), C, H, W,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


class PrefetchingSource:
    """Threaded synchronized multi-camera video source (C++ ring buffer)."""

    def __init__(self, paths: Sequence[str], queue_capacity: int = 8):
        lib = _lib()
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        self._h = lib.vbr_source_open(arr, len(paths), queue_capacity)
        if not self._h:
            raise FileNotFoundError(f"cannot open videos: {list(paths)}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        self.num_cameras = lib.vbr_source_dims(self._h, w, h)
        self.width, self.height = w.value, h.value

    def next_frames(self) -> Optional[np.ndarray]:
        """(C, H, W, 3) u8 BGR batch, or None at end of any stream."""
        out = np.empty(
            (self.num_cameras, self.height, self.width, 3), np.uint8
        )
        ok = _lib().vbr_source_next(self._h, out.ctypes.data_as(ctypes.c_void_p))
        return out if ok else None

    def close(self):
        if self._h:
            _lib().vbr_source_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class VideoSink:
    """mp4v video encoder (native cv::VideoWriter).

    Used for the annotated corner-detection videos the reference writes
    during calibration (``intrinsics_imagepoints.mp4``, 1 fps,
    camera_calibration.py:441-444).
    """

    def __init__(self, path: str, fps: float, width: int, height: int):
        self.width, self.height = width, height
        self._h = _lib().vbr_writer_create(
            path.encode(), float(fps), int(width), int(height)
        )
        if not self._h:
            raise IOError(f"cannot open video writer: {path}")

    def write(self, frame: np.ndarray):
        """Append a (H, W, 3) u8 BGR frame."""
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        H, W, _ = frame.shape
        if (W, H) != (self.width, self.height):
            raise ValueError(f"frame {W}x{H} != writer {self.width}x{self.height}")
        _lib().vbr_writer_write(
            self._h, frame.ctypes.data_as(ctypes.c_void_p), H, W
        )

    def close(self):
        if self._h:
            _lib().vbr_writer_release(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class MOGOracle:
    """cv::bgsegm::BackgroundSubtractorMOG via C++ (parity oracle)."""

    def __init__(self, history=200, nmixtures=5, background_ratio=0.7,
                 noise_sigma=0.0):
        self._h = _lib().vbr_mog_create(
            history, nmixtures, background_ratio, noise_sigma
        )

    def apply(self, frame: np.ndarray, learning_rate: float = -1.0):
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        H, W, _ = frame.shape
        out = np.empty((H, W), np.uint8)
        _lib().vbr_mog_apply(
            self._h,
            frame.ctypes.data_as(ctypes.c_void_p),
            H, W,
            learning_rate,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out

    def __del__(self):
        try:
            if self._h:
                _lib().vbr_mog_release(self._h)
        except Exception:
            pass
