"""Sharded marching-cubes support: halo exchange over the grid axis.

Surface extraction from a voxel volume sharded along x needs each shard
to see one extra voxel plane from its +x neighbor (cells straddle the
shard boundary) — the ring-communication analog of this workload
(SURVEY.md §5 "long-context/sequence parallelism").  The halo moves with
``ppermute`` over ICI; each shard then runs the dense active-cell pass on
its slab + halo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vbr_tpu.ops import marching_cubes as mc


def sharded_active_cells(mesh: Mesh, axis: str = "grid"):
    """Build a jitted sharded active-cell pass with +x halo exchange.

    Input volume (nx, ny, nz) bool sharded along dim 0 over ``axis``;
    output (nx-1, ny-1, nz-1) bool of cells whose corners differ, sharded
    the same way (the last shard's slab is one plane shorter — padded with
    False to keep shapes static).
    """

    def _local(vol):
        n_shards = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        # receive the first plane of the +1 neighbor (ring permute)
        first_plane = vol[0:1]
        perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        halo = jax.lax.ppermute(first_plane, axis, perm)
        ext = jnp.concatenate([vol, halo], axis=0)  # (local_nx+1, ny, nz)
        act = mc.active_cells_mask(ext)  # (local_nx, ny-1, nz-1)
        # the last shard's halo wrapped around from shard 0 — mask it out
        is_last = idx == n_shards - 1
        row_ids = jax.lax.broadcasted_iota(jnp.int32, act.shape, 0)
        act = act & ~(is_last & (row_ids == act.shape[0] - 1))
        return act

    mapped = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=P(axis, None, None),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    return jax.jit(mapped)


def extract_mesh_sharded(
    volume: np.ndarray,
    mesh: Mesh,
    axis: str = "grid",
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
    capacity: int = 65536,
):
    """Distributed-volume surface extraction.

    The active-cell sweep (the dense O(N³) part) runs sharded with halo
    exchange; triangle emission runs on the gathered active set (sparse).
    Returns (tris (T, 3, 3) float32, count) — identical to
    ``marching_cubes.extract_mesh`` on the unsharded volume (tested).
    """
    nx = volume.shape[0]
    n_shards = mesh.shape[axis]
    if nx % n_shards != 0:
        return mc.extract_mesh(volume, origin, spacing, capacity)

    vol_sharded = jax.device_put(
        jnp.asarray(volume), NamedSharding(mesh, P(axis, None, None))
    )
    act_fn = sharded_active_cells(mesh, axis)
    act = np.asarray(act_fn(vol_sharded))  # (nx, ny-1, nz-1): padded rows

    # convert shard-local cell rows back to global cell indices:
    # shard s contributes rows [s*local, s*local + local) of the extended
    # volume; globally valid cells are rows [0, nx-1)
    act_global = act[: nx - 1]
    idx = np.flatnonzero(act_global.reshape(-1))

    volume_d = jnp.asarray(volume)
    tris_out = []
    for start in range(0, len(idx), capacity):
        chunk = idx[start : start + capacity]
        padded = np.zeros(capacity, np.int64)
        padded[: len(chunk)] = chunk
        verts, valid = mc._emit_triangles(
            volume_d, jnp.asarray(padded), capacity=capacity
        )
        verts = np.asarray(verts)
        valid = np.asarray(valid).copy()
        valid[len(chunk) * 12 :] = False
        tris_out.append(verts[valid])
    if not tris_out:
        return np.zeros((0, 3, 3), np.float32), 0
    tris = np.concatenate(tris_out)
    tris = tris * np.asarray(spacing, np.float32) + np.asarray(origin, np.float32)
    return tris.astype(np.float32), len(tris)
