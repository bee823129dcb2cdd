"""Synthetic-rig fixture: carving a known sphere recovers the sphere."""

import numpy as np

from vbr_tpu.ops import carve
from vbr_tpu.utils.config import GridConfig
from vbr_tpu.utils import synthetic


def test_carve_recovers_sphere():
    cams, masks, frames = synthetic.synthetic_rig()
    grid = GridConfig(
        nx=32, ny=32, nz=32,
        x_min=-900, x_max=1100, y_min=-1050, y_max=950, z_min=-1700, z_max=300,
    )
    tables = carve.build_projection_tables(cams, grid, masks.shape[1:3])
    occ, _ = carve.carve_from_tables(masks, frames, tables.valid, tables.lin_idx)
    occ = np.asarray(occ)

    pts = grid.voxel_points()
    center = np.array([100.0, -50.0, -700.0])
    r = 500.0
    d = np.linalg.norm(pts - center, axis=1)

    # Visual hull of a sphere from silhouettes = sphere (fat margins for
    # voxel size ~65mm): everything well inside must be carved ON, everything
    # well outside OFF.
    inside = d < r - 100
    outside = d > r + 250
    assert occ[inside].all(), "voxels inside the sphere must be occupied"
    assert not occ[outside].any(), "voxels far outside the sphere must be empty"
    assert occ.sum() > 100


def test_silhouette_consistent_with_projection():
    cams, masks, _ = synthetic.synthetic_rig()
    # project the sphere center: must land in every silhouette
    center = np.array([100.0, -50.0, -700.0])
    for cp, m in zip(cams, masks):
        uv = np.asarray(
            __import__("vbr_tpu.ops.camera", fromlist=["project_points"]).project_points(
                center[None], cp.rvec, cp.tvec, cp.K, cp.dist, xp=np
            )
        )[0]
        assert m[int(uv[1]), int(uv[0])] > 0
