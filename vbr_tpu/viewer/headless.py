"""Headless software renderer for CI and artifact dumps.

A small pure-numpy z-buffer point/cube splatter: renders the carved voxel
cloud (and camera frusta) from a pinhole view to a PNG without any GL
context.  This is the deterministic stand-in for the OpenGL viewer
(SURVEY.md §2b "headless PNG renderer for CI").
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])
    t = -R @ eye
    return R, t


def render_points(
    positions: np.ndarray,  # (N, 3) viewer-space voxel centers
    colors: np.ndarray,  # (N, 3) float [0, 1]
    eye=(25.0, 20.0, 25.0),
    target=(0.0, 5.0, 0.0),
    image_hw: Tuple[int, int] = (720, 960),
    fov_deg: float = 50.0,
    point_size: int = 3,
    background=(0.08, 0.08, 0.1),
) -> np.ndarray:
    """Z-buffered splat render → (H, W, 3) uint8 RGB image."""
    H, W = image_hw
    img = np.empty((H, W, 3), np.float32)
    img[:] = np.asarray(background, np.float32)
    zbuf = np.full((H, W), np.inf, np.float32)
    if len(positions) == 0:
        return (img * 255).astype(np.uint8)

    R, t = look_at(eye, target)
    pc = positions @ R.T + t
    z = pc[:, 2]
    valid = z > 0.1
    pc = pc[valid]
    cols = np.asarray(colors, np.float32)[valid]
    z = z[valid]
    f = 0.5 * W / np.tan(np.radians(fov_deg) / 2)
    u = (f * pc[:, 0] / z + W / 2).astype(np.int32)
    v = (f * pc[:, 1] / z + H / 2).astype(np.int32)
    inb = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    u, v, z, cols = u[inb], v[inb], z[inb], cols[inb]

    # far-to-near painter order, then z-test per splat
    order = np.argsort(-z)
    u, v, z, cols = u[order], v[order], z[order], cols[order]
    r = point_size // 2
    for du in range(-r, r + 1):
        for dv in range(-r, r + 1):
            uu = np.clip(u + du, 0, W - 1)
            vv = np.clip(v + dv, 0, H - 1)
            better = z < zbuf[vv, uu] + 1e-6
            img[vv[better], uu[better]] = cols[better]
            zbuf[vv[better], uu[better]] = z[better]
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def render_floor_and_cameras(
    img: np.ndarray,
    floor_positions,
    floor_colors,
    cam_positions,
    cam_colors,
    eye=(25.0, 20.0, 25.0),
    target=(0.0, 5.0, 0.0),
    fov_deg: float = 50.0,
):
    """Overlay the checkerboard floor tiles and camera markers (in place)."""
    H, W, _ = img.shape
    R, t = look_at(eye, target)
    f = 0.5 * W / np.tan(np.radians(fov_deg) / 2)

    def project(pts):
        pc = np.asarray(pts, np.float64) @ R.T + t
        z = pc[:, 2]
        ok = z > 0.1
        u = (f * pc[:, 0] / np.where(ok, z, 1) + W / 2).astype(int)
        v = (f * pc[:, 1] / np.where(ok, z, 1) + H / 2).astype(int)
        return u, v, ok

    u, v, ok = project(floor_positions)
    inb = ok & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    img[v[inb], u[inb]] = (np.asarray(floor_colors)[inb] * 200).astype(np.uint8)

    u, v, ok = project(cam_positions)
    for k in range(len(u)):
        if ok[k] and 3 <= u[k] < W - 3 and 3 <= v[k] < H - 3:
            c = (np.asarray(cam_colors[k]) * 255).astype(np.uint8)
            img[v[k] - 3 : v[k] + 4, u[k] - 3 : u[k] + 4] = c
    return img


def save_png(path: str, img: np.ndarray):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        import cv2

        cv2.imwrite(path, img[..., ::-1])  # RGB → BGR for OpenCV
    except ImportError:  # pragma: no cover
        from PIL import Image

        Image.fromarray(img).save(path)
