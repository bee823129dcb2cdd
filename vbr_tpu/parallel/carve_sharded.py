"""Multi-chip voxel carving via ``shard_map`` over a device mesh.

The reference is single-process and sequential (SURVEY.md §2c); this module
supplies the *new* parallel design mapped from its loop structure:

  * ``data`` mesh axis — frame batch (DP): per-frame carves are independent
    given frozen background models (frame loop, assignment.py:94),
  * ``cam``  mesh axis — cameras (TP-like): per-camera mask gathers run in
    parallel; visibility counts AND-reduce across cameras with ``psum``
    (the camera loop + ≥4-views rule, assignment.py:119-121),
  * ``grid`` mesh axis — voxel-grid sharding (SP analog): each shard
    carves its sub-volume against its cameras' masks (the 2.1M-iteration
    voxel loop, voxel_reconstruction.py:105-122).

Masks are small (C×H×W uint8 ≈ 1.2 MB for the 4-camera rig) so they are
replicated along ``grid`` and sharded only along ``cam``/``data`` — the
all-gather rides ICI and is negligible next to HBM gather traffic.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_carve_mesh(
    n_devices: Optional[int] = None,
    num_cameras: int = 4,
    frame_batch: int = 1,
) -> Mesh:
    """Build a (data, cam, grid) mesh over the available devices.

    Prefers giving the camera axis min(num_cameras, remaining) ways and the
    data axis min(frame_batch, ...) ways; every leftover factor of the
    device count goes to the grid axis (voxel sharding scales furthest).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)

    def _axis(n_left: int, want: int) -> int:
        w = min(want, n_left)
        while w > 1 and n_left % w != 0:
            w -= 1
        return max(w, 1)

    data = _axis(n, frame_batch)
    cam = _axis(n // data, num_cameras)
    grid = n // (data * cam)
    mesh_devices = np.asarray(devices).reshape(data, cam, grid)
    return Mesh(mesh_devices, axis_names=("data", "cam", "grid"))


def sharded_carve_step(
    mesh: Mesh,
    *,
    views_threshold: int = 4,
    color_camera: int = 1,
):
    """Build a jitted sharded carve step over ``mesh``.

    The returned function has signature

        step(masks (F,C,H,W) u8, images (F,C,H,W,3) u8,
             valid (C,N) bool, lin_idx (C,N) i32)
          -> (occupancy (F,N) bool, colors (F,N,3) u8)

    F must divide the data axis, C the cam axis, N the grid axis.
    Visibility counts are ``psum``-reduced over the cam axis (XLA collective
    over ICI); occupancy comes out sharded over (data, grid).
    """

    def _local(masks, images, valid, lin_idx):
        # Local shapes: masks (f, c, H, W); valid/lin_idx (c, n)
        f, c, H, W = masks.shape
        masks_flat = masks.reshape(f, c, H * W)

        def per_frame(mf):
            def per_cam(mask_flat, v, idx):
                return v & (jnp.take(mask_flat, idx, axis=0) > 0)

            vis = jax.vmap(per_cam)(mf, valid, lin_idx)  # (c, n)
            return jnp.sum(vis.astype(jnp.int32), axis=0)  # (n,)

        partial_count = jax.vmap(per_frame)(masks_flat)  # (f, n)
        count = jax.lax.psum(partial_count, axis_name="cam")
        occupancy = count >= views_threshold

        # Color gather: only the shard owning color_camera contributes, then
        # psum broadcasts along the cam axis.
        cam_shard = jax.lax.axis_index("cam")
        c_per_shard = c
        owner = color_camera // c_per_shard
        local_idx = color_camera % c_per_shard
        img_flat = images[:, local_idx].reshape(f, H * W, 3)
        col = jax.vmap(lambda im, idx: jnp.take(im, idx, axis=0))(
            img_flat, jnp.broadcast_to(lin_idx[local_idx], (f,) + lin_idx.shape[1:])
        )  # (f, n, 3)
        col = jnp.where(cam_shard == owner, col.astype(jnp.int32), 0)
        colors = jax.lax.psum(col, axis_name="cam").astype(jnp.uint8)
        return occupancy, colors

    mapped = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P("data", "cam", None, None),
            P("data", "cam", None, None, None),
            P("cam", "grid"),
            P("cam", "grid"),
        ),
        out_specs=(P("data", "grid"), P("data", "grid", None)),
        check_vma=False,
    )
    return jax.jit(mapped)


def shard_inputs(mesh: Mesh, masks, images, valid, lin_idx):
    """Place host arrays with the shardings expected by the carve step."""
    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    return (
        put(jnp.asarray(masks), P("data", "cam", None, None)),
        put(jnp.asarray(images), P("data", "cam", None, None, None)),
        put(jnp.asarray(valid), P("cam", "grid")),
        put(jnp.asarray(lin_idx), P("cam", "grid")),
    )
