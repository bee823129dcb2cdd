"""On-disk artifacts: precomputed carve tables + model state checkpoints.

The reference checkpoints its voxel→pixel lookup table with pickle
(assignment.py:12-15) and calibration with per-camera XML
(camera_calibration.py:972-974).  Here the artifact model is npz keyed by
the grid/rig configuration (SURVEY.md §5 "checkpoint/resume"), so a
session can skip the float64 projection precompute.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional, Sequence

import numpy as np

from vbr_tpu.ops import carve as carve_ops
from vbr_tpu.utils.config import CameraParams, GridConfig


def _config_key(cameras: Sequence[CameraParams], grid: GridConfig,
                image_hw, extra: str = "") -> str:
    payload = json.dumps(
        {
            "cams": [dataclasses.astuple(c) for c in cameras],
            "grid": dataclasses.astuple(grid),
            "hw": list(image_hw),
            "extra": extra,
        },
        sort_keys=True,
    )
    return hashlib.sha1(payload.encode()).hexdigest()[:16]


def save_projection_tables(path: str, tables: carve_ops.ProjectionTables,
                           key: str = ""):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        valid=np.asarray(tables.valid),
        lin_idx=np.asarray(tables.lin_idx),
        image_hw=np.asarray(tables.image_hw),
        key=np.asarray(key),
    )


def load_projection_tables(path: str,
                           key: str = "") -> Optional[carve_ops.ProjectionTables]:
    if not os.path.exists(path):
        return None
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    if key and str(data["key"]) != key:
        return None  # stale artifact for a different rig/grid
    return carve_ops.ProjectionTables(
        valid=jnp.asarray(data["valid"]),
        lin_idx=jnp.asarray(data["lin_idx"]),
        image_hw=tuple(int(x) for x in data["image_hw"]),
    )


def cached_projection_tables(
    cameras: Sequence[CameraParams],
    grid: GridConfig,
    image_hw,
    cache_dir: str = "artifacts/tables",
) -> carve_ops.ProjectionTables:
    """Build-or-load the carve tables, keyed by the full configuration."""
    key = _config_key(cameras, grid, image_hw)
    path = os.path.join(cache_dir, f"proj_{key}.npz")
    cached = load_projection_tables(path, key)
    if cached is not None:
        return cached
    tables = carve_ops.build_projection_tables(cameras, grid, tuple(image_hw))
    save_projection_tables(path, tables, key)
    return tables


def save_mog_state(path: str, state) -> None:
    """Persist a trained background model (gmm.MOGState)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        weight=np.asarray(state.weight),
        mean=np.asarray(state.mean),
        var=np.asarray(state.var),
        nframes=np.asarray(state.nframes),
        # schema 2: var = per-mixture TOTAL (channel-summed) variance,
        # slots in OpenCV storage order (see gmm.MOGState)
        schema=np.int32(2),
    )


def load_mog_state(path: str):
    if not os.path.exists(path):
        return None
    import jax.numpy as jnp

    from vbr_tpu.ops import gmm

    d = np.load(path)
    if "schema" not in d or int(d["schema"]) != 2:
        return None  # stale cache from an older state schema → retrain
    return gmm.MOGState(
        weight=jnp.asarray(d["weight"]),
        mean=jnp.asarray(d["mean"]),
        var=jnp.asarray(d["var"]),
        nframes=jnp.asarray(d["nframes"]),
    )
