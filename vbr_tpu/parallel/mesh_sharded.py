"""Sharded marching cubes: halo exchange + on-shard triangle emission.

Surface extraction from a voxel volume sharded along x needs each shard
to see one extra voxel plane from its +x neighbor (cells straddle the
shard boundary) — the ring-communication analog of this workload
(SURVEY.md §5 "long-context/sequence parallelism").  The halo moves with
``ppermute`` over ICI.

The whole extraction runs inside one sharded program (reference:
the host-side ``skimage.measure.marching_cubes`` call at
voxel_reconstruction.py:142):

  1. active-cell sweep on the local slab + halo (dense O(N³) pass),
  2. static-shape compaction of active-cell indices on-device
     (``jnp.nonzero(size=capacity)``),
  3. marching-tetrahedra triangle emission into a fixed-capacity
     per-shard buffer,
  4. per-shard active-cell counts + a ``psum`` total over the grid axis.

Shard s owns cells with global x ∈ [s·local_nx, (s+1)·local_nx), in
ascending local flat order — concatenating shard outputs reproduces the
exact global cell order of the single-device path, so the triangle soup
is bit-identical to ``marching_cubes.extract_mesh`` (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vbr_tpu.ops import marching_cubes as mc

_EXTRACTOR_CACHE: dict = {}


def sharded_active_cells(mesh: Mesh, axis: str = "grid"):
    """Build a jitted sharded active-cell pass with +x halo exchange.

    Input volume (nx, ny, nz) bool sharded along dim 0 over ``axis``;
    output (nx, ny-1, nz-1) bool of cells whose corners differ, sharded
    the same way (the last shard's slab is one plane shorter — padded with
    False to keep shapes static).
    """

    def _local(vol):
        act, _ = _local_active(vol, axis)
        return act

    mapped = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=P(axis, None, None),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    return jax.jit(mapped)


def _local_active(vol, axis):
    """Shard-local active-cell mask on the slab + ppermute halo.

    Returns (act (local_nx, ny-1, nz-1) bool, ext (local_nx+1, ny, nz)).
    """
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
    return act, ext


def sharded_mesh_extractor(mesh: Mesh, axis: str = "grid",
                           capacity: int = 16384,
                           algorithm: str = "tetrahedra",
                           ambiguity: str = "separate",
                           emit: str = "table"):
    """Jitted sharded program: volume → per-shard triangle buffers.

    ``capacity`` is the PER-SHARD active-cell capacity; ``algorithm`` is
    "tetrahedra" (12 triangle slots/cell) or "cubes" (classic 256-case,
    MAXT slots/cell) — same choices as ``marching_cubes.extract_mesh``.
    Returns
    ``(verts (n_shards·capacity·tpc, 3, 3) f32 voxel coords,
       valid (n_shards·capacity·tpc,) bool,
       counts (n_shards,) i32 active cells per shard,
       total (1,) i32 psum over the grid axis)``.
    Shard slots beyond a shard's count are invalid; a shard whose count
    exceeds ``capacity`` has truncated output (caller must re-run with a
    larger capacity — counts make that detectable).

    ``emit="table"`` uses the generated-table MXU emitter
    (``mc.table_emitter``: one config gather per cell + one-hot matmuls
    — bit-identical to the per-cell path on BINARY volumes, ~50× less
    gather traffic); ``emit="device"`` keeps the per-cell gather
    emitters (the oracle path, and the only correct one for non-binary
    scalar fields).  :func:`extract_mesh_sharded` resolves its
    ``"auto"`` to one of these by the volume's dtype.
    """
    key = (mesh, axis, capacity, algorithm, ambiguity, emit)
    if key in _EXTRACTOR_CACHE:
        return _EXTRACTOR_CACHE[key]
    if algorithm == "tetrahedra":
        emit_fn, tpc = mc._emit_triangles, 12
    elif algorithm == "cubes":
        emit_fn = functools.partial(
            mc._emit_triangles_mc, ambiguity=ambiguity)
        tpc = mc._MC_MAXTS[ambiguity]
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if emit == "table":
        emit_fn = mc.table_emitter(algorithm, ambiguity, 0.5)
    elif emit != "device":
        raise ValueError(f"unknown emit strategy {emit!r}")

    def _local(vol):  # (local_nx, ny, nz) bool
        act, ext = _local_active(vol, axis)
        flat = act.reshape(-1)
        count = jnp.sum(flat, dtype=jnp.int32)
        # static-shape compaction: ascending local flat order matches the
        # single-device global order within this shard's x-range.
        # mc._compact_active is the scatter-free two-level scheme (the
        # naive jnp.nonzero hides an 18 ms serialized bincount scatter at
        # 128³); block_capacity = min(nblk, capacity) makes block
        # overflow imply count > capacity, so the existing retry-on-
        # truncation contract is unchanged and ``count`` stays exact.
        nblk = -(-flat.shape[0] // mc._COMPACT_BLOCK)
        cell_idx, _ = mc._compact_active(
            flat, capacity, min(nblk, capacity)
        )
        verts, valid = emit_fn(ext, cell_idx, capacity=capacity)
        slot = jax.lax.iota(jnp.int32, capacity * tpc) // tpc
        valid = valid & (slot < count)
        # local → global x
        x_off = (jax.lax.axis_index(axis) * vol.shape[0]).astype(jnp.float32)
        verts = verts.at[:, :, 0].add(x_off)
        total = jax.lax.psum(count, axis)
        return verts, valid, count[None], total[None]

    mapped = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=P(axis, None, None),
        out_specs=(P(axis, None, None), P(axis), P(axis), P()),
        check_vma=False,
    )
    fn = jax.jit(mapped)
    _EXTRACTOR_CACHE[key] = fn
    return fn


def extract_mesh_sharded(
    volume: np.ndarray,
    mesh: Mesh,
    axis: str = "grid",
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
    capacity: int = 16384,
    algorithm: str = "tetrahedra",
    ambiguity: str = "separate",
    emit: str = "auto",
):
    """Distributed-volume surface extraction, fully on-device.

    Active-cell sweep, index compaction, and triangle emission all run
    inside one sharded program per shard (halo included); the host only
    filters the fixed-capacity buffers.  Returns (tris (T, 3, 3) float32,
    count) — bit-identical to ``marching_cubes.extract_mesh`` on the
    unsharded volume (tested at 256³ on the 8-device CPU mesh).

    ``capacity`` is the initial per-shard active-cell capacity; on
    overflow (detected via the returned per-shard counts) the program is
    re-run with the next power-of-two capacity.
    """
    # same argument validation as extract_mesh, so sharded/fallback paths
    # accept and reject identical calls regardless of shard divisibility
    if algorithm not in ("tetrahedra", "cubes"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    mc._ensure_tiling(ambiguity)
    if algorithm == "tetrahedra" and ambiguity != "separate":
        raise ValueError(
            "ambiguity is only supported with algorithm='cubes' (the "
            "6-tet decomposition has no ambiguous faces)"
        )
    if emit not in ("auto", "device"):
        raise ValueError(f"unknown emit strategy {emit!r}")
    # "auto" = the table MXU emitter, but ONLY for binary volumes (a
    # float scalar field needs the per-cell emitters' real level-crossing
    # interpolation; the level-0.5 table would midpoint-snap it)
    is_binary = np.dtype(volume.dtype) == np.bool_
    resolved = "table" if (emit == "auto" and is_binary) else "device"
    nx = volume.shape[0]
    n_shards = mesh.shape[axis]
    if nx % n_shards != 0:
        return mc.extract_mesh(volume, origin, spacing, capacity,
                               algorithm=algorithm, ambiguity=ambiguity,
                               emit="auto" if emit == "auto" else "device")

    vol_sharded = jax.device_put(
        jnp.asarray(volume), NamedSharding(mesh, P(axis, None, None))
    )
    tpc = 12 if algorithm == "tetrahedra" else mc._MC_MAXTS[ambiguity]
    cap = capacity
    while True:
        fn = sharded_mesh_extractor(mesh, axis, cap, algorithm,
                                    ambiguity, resolved)
        verts, valid, counts, total = fn(vol_sharded)
        counts = np.asarray(counts)
        if counts.max(initial=0) <= cap:
            break
        cap = 1 << int(np.ceil(np.log2(counts.max())))

    verts = np.asarray(verts)
    valid = np.asarray(valid)
    tris = verts[valid]
    assert len(tris) <= tpc * int(np.asarray(total)[0])
    tris = tris * np.asarray(spacing, np.float32) + np.asarray(
        origin, np.float32
    )
    return tris.astype(np.float32), len(tris)
