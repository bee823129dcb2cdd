"""Textured visual hull: per-voxel color from the nearest non-occluded
camera (BASELINE.json config 3: "256³ grid with per-voxel color lookup
from the nearest non-occluded camera").

The reference colors every voxel from camera 2 unconditionally
(assignment.py:133), which paints the person's back with their front
colors.  The textured-hull upgrade:

  1. Render a per-camera *depth map* from the carved occupancy: each
     occupied voxel projects to its precomputed pixel; a scatter-min over
     camera-space depth gives the nearest occupied depth per pixel.
  2. A voxel is visible to camera c iff its own depth is within a
     tolerance of that pixel's depth-map value (it IS the nearest
     surface).
  3. Each voxel takes its color from the nearest (smallest camera-space
     depth) visible camera; voxels visible nowhere (interior) fall back
     to the nearest camera regardless.

All static geometry (depths, pixel indices) is precomputed with the rig
tables; the per-frame work is one scatter-min + gathers per camera.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.ops import carve as carve_ops
from vbr_tpu.utils.config import CameraParams, GridConfig


class TexturingTables(NamedTuple):
    valid: jnp.ndarray  # (C, N) bool
    lin_idx: jnp.ndarray  # (C, N) i32
    depth: jnp.ndarray  # (C, N) f32 camera-space z (mm)
    image_hw: Tuple[int, int]


def build_texturing_tables(
    cameras: Sequence[CameraParams],
    grid: GridConfig,
    image_hw: Tuple[int, int],
) -> TexturingTables:
    """Projection tables + per-voxel camera-space depth (float64 host)."""
    H, W = image_hw
    pts = grid.voxel_points()
    valids, idxs, depths = [], [], []
    for cp in cameras:
        R = cam_ops.rodrigues(cp.rvec, xp=np)
        Xc = pts @ R.T + cp.tvec
        uv = cam_ops.project_points(pts, cp.rvec, cp.tvec, cp.K, cp.dist, xp=np)
        x, y = uv[:, 0], uv[:, 1]
        valid = (y >= 0) & (y < H) & (x >= 0) & (x < W) & (Xc[:, 2] > 0)
        lin = np.where(
            valid,
            np.trunc(y).astype(np.int64) * W + np.trunc(x).astype(np.int64),
            0,
        ).astype(np.int32)
        valids.append(valid)
        idxs.append(lin)
        depths.append(Xc[:, 2].astype(np.float32))
    return TexturingTables(
        valid=jnp.asarray(np.stack(valids)),
        lin_idx=jnp.asarray(np.stack(idxs)),
        depth=jnp.asarray(np.stack(depths)),
        image_hw=(H, W),
    )


@functools.partial(jax.jit, static_argnames=("image_hw",))
def depth_maps(
    occupancy: jnp.ndarray,  # (N,) bool
    tables_valid: jnp.ndarray,
    tables_lin: jnp.ndarray,
    tables_depth: jnp.ndarray,
    *,
    image_hw: Tuple[int, int],
) -> jnp.ndarray:
    """(C, H·W) f32 nearest-occupied-voxel depth per pixel (inf if none)."""
    H, W = image_hw
    inf = jnp.float32(3.4e38)

    def per_cam(valid, lin, depth):
        d = jnp.where(occupancy & valid, depth, inf)
        return jnp.full((H * W,), inf, jnp.float32).at[lin].min(d)

    return jax.vmap(per_cam)(tables_valid, tables_lin, tables_depth)


@functools.partial(jax.jit, static_argnames=("image_hw", "depth_tolerance"))
def textured_colors(
    occupancy: jnp.ndarray,  # (N,) bool
    images: jnp.ndarray,  # (C, H, W, 3) u8 BGR
    tables_valid: jnp.ndarray,
    tables_lin: jnp.ndarray,
    tables_depth: jnp.ndarray,
    *,
    image_hw: Tuple[int, int],
    depth_tolerance: float = 40.0,  # mm (≈ voxel diagonal at 128³)
):
    """Per-voxel colors from the nearest non-occluded camera.

    Returns (colors (N, 3) u8 BGR, cam_choice (N,) i8: index of the
    chosen camera, −1 where the voxel is not occupied).
    """
    C = images.shape[0]
    H, W = image_hw
    dmaps = depth_maps(
        occupancy, tables_valid, tables_lin, tables_depth, image_hw=image_hw
    )  # (C, HW)

    def per_cam(dmap, valid, lin, depth, image):
        surf = jnp.take(dmap, lin)  # nearest occupied depth at my pixel
        visible = valid & (depth <= surf + depth_tolerance)
        img_flat = image.reshape(-1, 3)
        col = jnp.take(img_flat, lin, axis=0)
        return visible, col

    visible, cols = jax.vmap(per_cam)(
        dmaps, tables_valid, tables_lin, tables_depth, images
    )  # (C, N), (C, N, 3)

    # nearest visible camera; fall back to nearest valid camera
    big = jnp.float32(3.4e38)
    d_vis = jnp.where(visible, tables_depth, big)
    d_any = jnp.where(tables_valid, tables_depth, big)
    any_vis = visible.any(axis=0)
    choice = jnp.where(
        any_vis, jnp.argmin(d_vis, axis=0), jnp.argmin(d_any, axis=0)
    )  # (N,)
    colors = jnp.take_along_axis(
        cols, choice[None, :, None], axis=0
    )[0]  # (N, 3)
    cam_choice = jnp.where(occupancy, choice.astype(jnp.int8), -1)
    return colors, cam_choice
