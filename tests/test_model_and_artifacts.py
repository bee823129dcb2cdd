"""VisualHull model, artifact caching, reports, and AR validation."""

import os

import numpy as np
import pytest

from vbr_tpu.models import VisualHull
from vbr_tpu.ops import carve, corners
from vbr_tpu.pipelines import reports, validation
from vbr_tpu.utils import artifacts, synthetic
from vbr_tpu.utils.config import GridConfig, RigConfig


class TestVisualHullModel:
    def test_synthetic_end_to_end(self, tmp_path):
        cams, masks, frames = synthetic.synthetic_rig()
        grid = GridConfig(
            nx=32, ny=32, nz=32,
            x_min=-900, x_max=1100, y_min=-1050, y_max=950,
            z_min=-1700, z_max=300,
        )
        model = VisualHull(cams, grid, RigConfig(), cache_dir=str(tmp_path))
        occ, col = model.process_frame(frames, masks=masks)
        occ = np.asarray(occ)
        assert occ.sum() > 100

        pos, rgb = model.viewer_arrays(frames, masks=masks)
        assert pos.shape == (occ.sum(), 3)

        tris, n = model.extract_surface(frames, masks=masks)
        assert n > 50
        # surface must enclose the occupied region (bbox check, world mm)
        pts = grid.voxel_points()[occ]
        assert tris.reshape(-1, 3).min(0)[0] <= pts[:, 0].min() + 1e-3

    def test_table_cache_roundtrip(self, tmp_path):
        cams, _, _ = synthetic.synthetic_rig()
        grid = GridConfig(nx=16, ny=16, nz=16)
        t1 = artifacts.cached_projection_tables(cams, grid, (486, 644),
                                                str(tmp_path))
        files = os.listdir(tmp_path)
        assert len(files) == 1
        t2 = artifacts.cached_projection_tables(cams, grid, (486, 644),
                                                str(tmp_path))
        np.testing.assert_array_equal(np.asarray(t1.lin_idx), np.asarray(t2.lin_idx))
        # different grid → different artifact
        artifacts.cached_projection_tables(
            cams, GridConfig(nx=24, ny=16, nz=16), (486, 644), str(tmp_path)
        )
        assert len(os.listdir(tmp_path)) == 2


class TestValidation:
    def test_axes_and_cube_drawn(self, rig_cameras):
        img = np.zeros((486, 644, 3), np.uint8)
        cp = rig_cameras[0]
        validation.draw_axes(img, cp.K, cp.dist, cp.rvec, cp.tvec)
        assert (img > 0).any()
        n_axes = (img > 0).sum()
        validation.draw_cube(img, cp.K, cp.dist, cp.rvec, cp.tvec)
        assert (img > 0).sum() > n_axes

    def test_reprojection_error_zero_for_exact(self, rig_cameras):
        from vbr_tpu.ops import camera as cam_ops
        from vbr_tpu.pipelines import calibration

        cp = rig_cameras[0]
        obj = calibration.chessboard_object_points((8, 6), 115.0)
        uv = cam_ops.project_points(obj, cp.rvec, cp.tvec, cp.K, cp.dist, xp=np)
        err = validation.reprojection_error(obj, uv, cp.K, cp.dist, cp.rvec, cp.tvec)
        assert err < 1e-9


class TestManualCornerPath:
    def test_sort_clockwise(self):
        pts = np.array([[10, 100], [110, 10], [10, 10], [110, 100]], float)
        out = corners.sort_corners_clockwise(pts)
        np.testing.assert_allclose(
            out, [[10, 10], [110, 10], [110, 100], [10, 100]]
        )

    def test_interpolate_inner_from_outer(self):
        # exact square board: outer corners of a (9×7)-square board, inner
        # lattice must land on unit grid positions
        s = 30.0
        outer = np.array([[0, 0], [9 * s, 0], [9 * s, 7 * s], [0, 7 * s]])
        pts = corners.interpolate_image_points_from_corners(
            outer, (8, 6), corners_are_outer=True
        )
        expected = np.array(
            [[(x + 1) * s, (y + 1) * s] for y in range(6) for x in range(8)]
        )
        np.testing.assert_allclose(pts, expected, atol=1e-6)

    def test_interpolate_under_perspective(self):
        from vbr_tpu.ops import camera as cam_ops

        H_true = np.array([[1.1, 0.2, 50], [-0.1, 0.9, 80], [1e-4, 2e-4, 1.0]])
        s = 25.0
        outer_ideal = np.array([[0, 0], [9 * s, 0], [9 * s, 7 * s], [0, 7 * s]])
        outer = cam_ops.apply_homography(H_true, outer_ideal, xp=np)
        pts = corners.interpolate_image_points_from_corners(outer, (8, 6), True)
        inner_ideal = np.array(
            [[(x + 1) * s, (y + 1) * s] for y in range(6) for x in range(8)]
        )
        expected = cam_ops.apply_homography(H_true, inner_ideal, xp=np)
        np.testing.assert_allclose(pts, expected, atol=1e-6)


class TestReports:
    def test_plots_written(self, tmp_path):
        masks = {
            "KNN": np.random.default_rng(0).integers(0, 2, (2, 32, 48)) * 255,
            "MOG": np.random.default_rng(1).integers(0, 2, (2, 32, 48)) * 255,
        }
        p1 = str(tmp_path / "masks.png")
        reports.plot_mask_comparison(masks, p1)
        assert os.path.getsize(p1) > 5000

        runs = [
            dict(label="all", rms=0.4, per_view_errors=np.array([0.3, 0.5]),
                 K=np.diag([490, 490, 1.0]), intrinsic_std=np.ones(9) * 0.2),
            dict(label="kept", rms=0.3, per_view_errors=np.array([0.3, 0.3]),
                 K=np.diag([492, 491, 1.0]), intrinsic_std=np.ones(9) * 0.1),
        ]
        p2 = str(tmp_path / "intrinsics.png")
        reports.plot_intrinsic_results(runs, p2)
        assert os.path.getsize(p2) > 5000

        tris = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
        p3 = str(tmp_path / "mesh.png")
        reports.plot_mesh_snapshot(tris, p3)
        assert os.path.getsize(p3) > 5000


class TestFastPath:
    def test_fast_matches_slow(self):
        """process_frame_fast must be bit-identical to the per-camera path."""
        cams, masks, frames = synthetic.synthetic_rig()
        grid = GridConfig(
            nx=16, ny=16, nz=16,
            x_min=-900, x_max=1100, y_min=-1050, y_max=950,
            z_min=-1700, z_max=300,
        )
        model = VisualHull(cams, grid, RigConfig())
        # fabricate trained states: single mixture centered on HSV of frames
        import jax
        import jax.numpy as jnp

        from vbr_tpu.ops import color as color_ops
        from vbr_tpu.ops import gmm
        from vbr_tpu.utils.config import MOGParams

        hsv = np.asarray(jax.vmap(color_ops.bgr_to_hsv_u8)(jnp.asarray(frames)))
        K = 5
        states = []
        for c in range(4):
            w = np.zeros((486, 644, K), np.float32)
            w[..., 0] = 1.0
            mu = np.zeros((486, 644, K, 3), np.float32)
            mu[..., 0, :] = hsv[c]
            var = np.full((486, 644, K), 225.0, np.float32)
            states.append(
                gmm.MOGState(jnp.asarray(w), jnp.asarray(mu), jnp.asarray(var),
                             jnp.asarray(100))
            )
        model.bg_states = states
        model.mog_params = [MOGParams()] * 4

        # perturb the frames so foreground appears
        test = frames.copy()
        test[:, 100:300, 200:420] = 255

        occ_slow, col_slow = model.process_frame(test)
        occ_fast, col_fast = model.process_frame_fast(test)
        occ_slow, occ_fast = np.asarray(occ_slow), np.asarray(occ_fast)
        np.testing.assert_array_equal(occ_fast, occ_slow)
        np.testing.assert_array_equal(
            np.asarray(col_fast)[occ_slow], np.asarray(col_slow)[occ_slow]
        )


class TestManualCornerSession:
    def test_click_flow(self):
        from vbr_tpu.apps.manual_corners import ManualCornerSession

        gray = np.full((300, 400), 128, np.uint8)
        s = ManualCornerSession(gray, (8, 6), refine=False)
        assert not s.done
        s.click(40, 30)
        s.click(360, 30)
        s.undo()
        s.click(361, 31)
        s.click(361, 271)
        s.click(41, 269)
        assert s.done
        assert s.result.shape == (48, 2)
        # interpolated lattice lies inside the clicked quad
        assert s.result[:, 0].min() > 40 and s.result[:, 0].max() < 362
        assert s.result[:, 1].min() > 30 and s.result[:, 1].max() < 272


class TestAssignmentAPI:
    def test_contract_shapes(self, data_dir, monkeypatch):
        """The 4-function reference seam works end-to-end (small grid)."""
        from vbr_tpu.apps import assignment_api

        assignment_api.configure(data_dir)
        data, colors = assignment_api.generate_grid(4, 4)
        assert len(data) == 16 and len(colors) == 16

        pos, cc = assignment_api.get_cam_positions()
        assert len(pos) == 4 and len(cc) == 4

        rots = assignment_api.get_cam_rotation_matrices()
        assert len(rots) == 4
        for r in rots:
            assert np.asarray(r).shape == (4, 4)
            np.testing.assert_allclose(
                np.linalg.det(np.asarray(r)[:3, :3]), 1.0, atol=1e-6
            )
