"""Sharded carve over a virtual 8-device CPU mesh vs the single-device path."""

import jax
import numpy as np
import pytest

from vbr_tpu.ops import carve
from vbr_tpu.parallel import carve_sharded
from vbr_tpu.utils.config import GridConfig

GRID = GridConfig(nx=16, ny=16, nz=16)


@pytest.fixture(scope="module")
def setup(rig_cameras, golden_masks, first_frames):
    H, W = golden_masks.shape[1:3]
    tables = carve.build_projection_tables(rig_cameras, GRID, (H, W))
    return tables, golden_masks, first_frames


def test_mesh_construction():
    mesh = carve_sharded.make_carve_mesh(8, num_cameras=4, frame_batch=2)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "cam", "grid")
    assert mesh.shape["data"] == 2 and mesh.shape["cam"] == 4


def test_sharded_matches_single_device(setup):
    tables, masks, frames = setup
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    mesh = carve_sharded.make_carve_mesh(8, num_cameras=4, frame_batch=2)

    # Frame batch of 2 (same frame twice, plus a modified copy)
    masks_b = np.stack([masks, np.roll(masks, 5, axis=2)])
    frames_b = np.stack([frames, frames])

    step = carve_sharded.sharded_carve_step(mesh, views_threshold=4, color_camera=1)
    args = carve_sharded.shard_inputs(
        mesh, masks_b, frames_b, tables.valid, tables.lin_idx
    )
    occ_sharded, colors_sharded = step(*args)
    occ_sharded = np.asarray(occ_sharded)
    colors_sharded = np.asarray(colors_sharded)

    for f in range(2):
        occ_ref, colors_ref = carve.carve_from_tables(
            masks_b[f], frames_b[f], tables.valid, tables.lin_idx,
            views_threshold=4, color_camera=1,
        )
        np.testing.assert_array_equal(occ_sharded[f], np.asarray(occ_ref))
        # Colors only meaningful where the projection into cam 2 is valid.
        valid2 = np.asarray(tables.valid[1])
        np.testing.assert_array_equal(
            colors_sharded[f][valid2], np.asarray(colors_ref)[valid2]
        )


def test_sharded_nontrivial_occupancy(setup):
    tables, masks, frames = setup
    mesh = carve_sharded.make_carve_mesh(8, num_cameras=4, frame_batch=1)
    step = carve_sharded.sharded_carve_step(mesh)
    args = carve_sharded.shard_inputs(
        mesh, masks[None], frames[None], tables.valid, tables.lin_idx
    )
    occ, _ = step(*args)
    assert np.asarray(occ).sum() > 0
