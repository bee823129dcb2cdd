"""Carving parity: table/fused paths vs a literal re-execution of the
reference's per-voxel semantics (voxel_reconstruction.py:89-124 +
assignment.py:119-133) using OpenCV projection as the oracle."""

import cv2
import numpy as np
import pytest

from vbr_tpu.ops import carve
from vbr_tpu.utils.config import GridConfig

SMALL_GRID = GridConfig(nx=24, ny=24, nz=24)


def oracle_occupancy(cameras, grid, masks, views_threshold=4):
    """Reference-faithful occupancy keyed by truncated world coordinate:
    cv2.projectPoints + float bounds check + int() truncation indexing."""
    H, W = masks.shape[1:3]
    pts = grid.voxel_points()
    vis_count = np.zeros(len(pts), dtype=np.int32)
    for c, cp in enumerate(cameras):
        uv, _ = cv2.projectPoints(pts, cp.rvec, cp.tvec, cp.K, cp.dist)
        uv = uv.reshape(-1, 2)
        for i, (x, y) in enumerate(uv):
            if 0 <= y < H and 0 <= x < W:
                if masks[c][int(y), int(x)] > 0:
                    vis_count[i] += 1
    return vis_count >= views_threshold


@pytest.fixture(scope="module")
def tables(rig_cameras, golden_masks):
    H, W = golden_masks.shape[1:3]
    return carve.build_projection_tables(rig_cameras, SMALL_GRID, (H, W))


class TestTablePath:
    def test_occupancy_bit_matches_reference(self, rig_cameras, golden_masks, tables):
        import jax.numpy as jnp

        images = np.repeat(golden_masks[..., None], 3, axis=-1)
        occ, _ = carve.carve_from_tables(
            jnp.asarray(golden_masks),
            jnp.asarray(images),
            tables.valid,
            tables.lin_idx,
            views_threshold=4,
        )
        expected = oracle_occupancy(rig_cameras, SMALL_GRID, golden_masks)
        np.testing.assert_array_equal(np.asarray(occ), expected)
        assert expected.sum() > 0, "oracle found no voxels — degenerate test"

    def test_views_threshold_semantics(self, rig_cameras, golden_masks, tables):
        import jax.numpy as jnp

        images = np.repeat(golden_masks[..., None], 3, axis=-1)
        occ3, _ = carve.carve_from_tables(
            jnp.asarray(golden_masks),
            jnp.asarray(images),
            tables.valid,
            tables.lin_idx,
            views_threshold=3,
        )
        expected = oracle_occupancy(rig_cameras, SMALL_GRID, golden_masks, 3)
        np.testing.assert_array_equal(np.asarray(occ3), expected)

    def test_colors_come_from_color_camera(self, rig_cameras, golden_masks, first_frames, tables):
        import jax.numpy as jnp

        occ, colors = carve.carve_from_tables(
            jnp.asarray(golden_masks),
            jnp.asarray(first_frames),
            tables.valid,
            tables.lin_idx,
            views_threshold=4,
            color_camera=1,
        )
        occ = np.asarray(occ)
        colors = np.asarray(colors)
        # Check a few occupied voxels against direct projection into cam 2
        idx = np.flatnonzero(occ)[:50]
        cp = rig_cameras[1]
        pts = SMALL_GRID.voxel_points()[idx]
        uv, _ = cv2.projectPoints(pts, cp.rvec, cp.tvec, cp.K, cp.dist)
        uv = uv.reshape(-1, 2)
        for k, (x, y) in enumerate(uv):
            expected = first_frames[1][int(y), int(x)]
            np.testing.assert_array_equal(colors[idx[k]], expected)


class TestFusedPath:
    def test_fused_matches_table_path(self, rig_cameras, golden_masks, tables):
        import jax.numpy as jnp

        images = np.repeat(golden_masks[..., None], 3, axis=-1)
        H, W = golden_masks.shape[1:3]
        occ_t, _ = carve.carve_from_tables(
            jnp.asarray(golden_masks), jnp.asarray(images), tables.valid, tables.lin_idx
        )
        R, t, K4, dist = carve._pose_arrays(rig_cameras)
        pts = jnp.asarray(SMALL_GRID.voxel_points(), dtype=jnp.float32)
        occ_f, _ = carve.carve_fused(
            jnp.asarray(golden_masks),
            jnp.asarray(images),
            pts,
            R,
            t,
            K4,
            dist,
            image_hw=(H, W),
        )
        match = np.mean(np.asarray(occ_t) == np.asarray(occ_f))
        assert match >= 0.9999, f"fused/table occupancy agreement {match}"


class TestCompaction:
    def test_viewer_contract(self, rig_cameras, golden_masks, first_frames, tables):
        import jax.numpy as jnp

        occ, colors = carve.carve_from_tables(
            jnp.asarray(golden_masks),
            jnp.asarray(first_frames),
            tables.valid,
            tables.lin_idx,
        )
        positions, rgb = carve.compact_voxels(occ, colors, SMALL_GRID)
        occ_np = np.asarray(occ)
        assert positions.shape == (occ_np.sum(), 3)
        assert rgb.shape == positions.shape
        assert rgb.min() >= 0 and rgb.max() <= 1
        # Axis conversion: y_gl = -z_world/64, z_gl = y_world/64
        pts = SMALL_GRID.voxel_points()[occ_np]
        np.testing.assert_allclose(positions[:, 0], np.trunc(pts[:, 0]) / 64.0)
        np.testing.assert_allclose(positions[:, 1], -np.trunc(pts[:, 2]) / 64.0)
        np.testing.assert_allclose(positions[:, 2], np.trunc(pts[:, 1]) / 64.0)


class TestAcceleratedTables:
    def test_accelerated_build_is_exact(self, rig_cameras):
        grid = GridConfig(nx=40, ny=40, nz=40)
        fast = carve.build_projection_tables(
            rig_cameras, grid, (486, 644), accelerate=True
        )
        exact = carve.build_projection_tables(
            rig_cameras, grid, (486, 644), accelerate=False
        )
        np.testing.assert_array_equal(
            np.asarray(fast.valid), np.asarray(exact.valid)
        )
        np.testing.assert_array_equal(
            np.asarray(fast.lin_idx), np.asarray(exact.lin_idx)
        )


class TestBatchedFrames:
    def test_batched_matches_single(self, rig_cameras, golden_masks,
                                    first_frames, tables):
        import jax.numpy as jnp

        masks_b = np.stack([golden_masks, np.roll(golden_masks, 7, axis=2)])
        frames_b = np.stack([first_frames, first_frames])
        occ_b, col_b = carve.carve_frames_batched(
            jnp.asarray(masks_b), jnp.asarray(frames_b),
            tables.valid, tables.lin_idx,
        )
        for f in range(2):
            occ_s, col_s = carve.carve_from_tables(
                jnp.asarray(masks_b[f]), jnp.asarray(frames_b[f]),
                tables.valid, tables.lin_idx,
            )
            np.testing.assert_array_equal(
                np.asarray(occ_b)[f], np.asarray(occ_s)
            )
            np.testing.assert_array_equal(
                np.asarray(col_b)[f], np.asarray(col_s)
            )
