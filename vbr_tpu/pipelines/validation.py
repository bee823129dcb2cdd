"""Calibration validation: AR drawings + reprojection checks.

The reference's visual test oracle (camera_calibration.py:753-864):
world-origin axes and a cube drawn onto a chessboard frame with the
estimated parameters, saved as ``test.jpg`` per camera.  Drawing is plain
numpy line rasterization (no OpenCV dependency in the draw path).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from vbr_tpu.ops import camera as cam_ops


def draw_line(img: np.ndarray, p0, p1, color, thickness: int = 2):
    """Bresenham-ish thick line on a BGR uint8 image (in place)."""
    H, W = img.shape[:2]
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    n = int(max(abs(p1 - p0).max(), 1)) + 1
    ts = np.linspace(0.0, 1.0, n)
    pts = p0[None] + ts[:, None] * (p1 - p0)[None]
    r = thickness // 2
    for du in range(-r, r + 1):
        for dv in range(-r, r + 1):
            u = np.clip(pts[:, 0].astype(int) + du, 0, W - 1)
            v = np.clip(pts[:, 1].astype(int) + dv, 0, H - 1)
            img[v, u] = color
    return img


def draw_axes(
    img: np.ndarray, K, dist, rvec, tvec, axis_length: float = 230.0
):
    """World-origin axes (X blue, Y green, Z red in BGR like the reference
    colors at camera_calibration.py:753-787)."""
    pts = np.array(
        [
            [0.0, 0, 0],
            [axis_length, 0, 0],
            [0, axis_length, 0],
            [0, 0, -axis_length],
        ]
    )
    uv = cam_ops.project_points(pts, np.asarray(rvec).ravel(),
                                np.asarray(tvec).ravel(), K,
                                np.asarray(dist).ravel(), xp=np)
    o = uv[0]
    for end, color in zip(uv[1:], ((255, 0, 0), (0, 255, 0), (0, 0, 255))):
        draw_line(img, o, end, color, 3)
    return img


def draw_cube(img: np.ndarray, K, dist, rvec, tvec, size: float = 230.0):
    """Wireframe cube sitting on the chessboard plane
    (camera_calibration.py:790-821 capability)."""
    s = size
    corners = np.array(
        [
            [0, 0, 0], [s, 0, 0], [s, s, 0], [0, s, 0],
            [0, 0, -s], [s, 0, -s], [s, s, -s], [0, s, -s],
        ],
        dtype=np.float64,
    )
    uv = cam_ops.project_points(corners, np.asarray(rvec).ravel(),
                                np.asarray(tvec).ravel(), K,
                                np.asarray(dist).ravel(), xp=np)
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ]
    for a, b in edges:
        draw_line(img, uv[a], uv[b], (0, 255, 255), 2)
    return img


def draw_circle(img: np.ndarray, center, radius: int, color, thickness: int = 2):
    """Rasterized circle outline on a BGR uint8 image (in place)."""
    H, W = img.shape[:2]
    cx, cy = float(center[0]), float(center[1])
    n = max(int(2 * np.pi * radius), 8)
    ang = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    for rr in range(max(radius - thickness // 2, 1), radius + thickness // 2 + 1):
        u = np.clip((cx + rr * np.cos(ang)).astype(int), 0, W - 1)
        v = np.clip((cy + rr * np.sin(ang)).astype(int), 0, H - 1)
        img[v, u] = color
    return img


def draw_chessboard_corners(
    img: np.ndarray, pts: np.ndarray, board: Tuple[int, int],
    found: bool = True,
):
    """cv2.drawChessboardCorners-style overlay (in place).

    Detected corners joined row by row with a per-row rainbow color and a
    circle per corner — the annotation the reference stores in its
    ``intrinsics_imagepoints.mp4`` / ``checkerboard_imagepoints.jpg``
    artifacts (camera_calibration.py:438-444,482-484).
    """
    pts = np.asarray(pts, np.float64).reshape(-1, 2)
    if not found or len(pts) == 0:
        return img
    bw, bh = board
    rainbow = [
        (0, 0, 255), (0, 128, 255), (0, 255, 255), (0, 255, 0),
        (255, 128, 0), (255, 0, 0), (255, 0, 255), (128, 0, 255),
    ]
    for i in range(len(pts) - 1):
        row = i // bw
        color = rainbow[row % len(rainbow)]
        draw_line(img, pts[i], pts[i + 1], color, 1)
    for i, p in enumerate(pts):
        row = i // bw
        draw_circle(img, p, 4, rainbow[row % len(rainbow)], 1)
    return img


def test_camera_parameters_with_image(
    data_dir: str,
    camera: int,
    out_path: str,
    draw: str = "axes",
    frame_index: int = 0,
):
    """Render the AR check for one camera onto a checkerboard frame and
    save it (camera_calibration.py:824-864 equivalent)."""
    import cv2

    from vbr_tpu.utils import video as vio
    from vbr_tpu.utils import xmlio

    cam_dir = os.path.join(data_dir, f"cam{camera}")
    K, dist, rvec, tvec = xmlio.load_camera_config(cam_dir)
    frame = vio.get_frame(os.path.join(cam_dir, "checkerboard.avi"), frame_index)
    if frame is None:
        raise FileNotFoundError("no checkerboard frame")
    if draw == "axes":
        draw_axes(frame, K, dist, rvec, tvec)
    else:
        draw_cube(frame, K, dist, rvec, tvec)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    cv2.imwrite(out_path, frame)
    return frame


def reprojection_error(obj_pts, img_pts, K, dist, rvec, tvec) -> float:
    """Mean L2 reprojection error in pixels."""
    uv = cam_ops.project_points(
        np.asarray(obj_pts, np.float64),
        np.asarray(rvec).ravel(), np.asarray(tvec).ravel(),
        np.asarray(K), np.asarray(dist).ravel(), xp=np,
    )
    return float(np.linalg.norm(uv - np.asarray(img_pts).reshape(-1, 2), axis=1).mean())
