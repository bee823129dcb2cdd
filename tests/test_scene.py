"""Viewer scene composition: props, frusta, surface transform (no GL)."""

import numpy as np
import pytest

from vbr_tpu.viewer import scene

REF_MODELS = "/root/reference/resources/models"


class TestProps:
    def test_load_reference_props(self):
        import os

        if not os.path.isdir(REF_MODELS):
            pytest.skip("reference resources absent")
        for name, ntris in (("camera", 12), ("cube", 12), ("square", 4)):
            tris = scene.load_prop_tris(REF_MODELS, name)
            assert tris.shape == (ntris, 3, 3)

    def test_missing_prop_returns_none(self, tmp_path):
        assert scene.load_prop_tris(str(tmp_path), "camera") is None

    def test_camera_models_rotated_per_camera(self, rig_cameras):
        models = scene.camera_model_tris(rig_cameras, REF_MODELS)
        assert len(models) == len(rig_cameras)
        # rotations differ between cameras → vertex sets differ
        assert not np.allclose(models[0], models[1])
        # rotation preserves vertex norms
        base = scene.load_prop_tris(REF_MODELS, "camera")
        if base is not None:
            a = np.sort(np.linalg.norm(base.reshape(-1, 3), axis=1))
            b = np.sort(np.linalg.norm(models[0].reshape(-1, 3), axis=1))
            np.testing.assert_allclose(a, b, rtol=1e-5)

    def test_fallback_cube_when_models_absent(self, rig_cameras, tmp_path):
        models = scene.camera_model_tris(rig_cameras, str(tmp_path))
        assert models[0].shape == (12, 3, 3)


class TestFrusta:
    def test_frustum_apex_at_camera_center(self, rig_cameras):
        from vbr_tpu.pipelines.reconstruction import get_cam_positions

        segs = scene.camera_frustum_segments(rig_cameras[0])
        assert segs.shape == (8, 2, 3)
        centers, _ = get_cam_positions(rig_cameras)
        # the first 4 segments start at the camera's viewer position
        np.testing.assert_allclose(
            segs[:4, 0], np.tile(centers[0], (4, 1)), atol=1e-5
        )

    def test_frustum_far_corners_project_to_image_corners(self, rig_cameras):
        """Round trip: frustum far points re-project onto the image
        corners through the real camera model (zero distortion here
        because the wireframe ignores it — so project with dist=0)."""
        from vbr_tpu.ops import camera as cam_ops

        cp = rig_cameras[0]
        H, W = 486, 644
        segs = scene.camera_frustum_segments(cp, (H, W))
        far_v = segs[:4, 1]  # viewer coords
        # invert viewer transform: (x, -z, y)/s → world (x, z, -y)·s? no:
        # viewer (a,b,c) = (x, -z, y)/115 → world = (a, c, -b)·115
        world = np.stack(
            [far_v[:, 0], far_v[:, 2], -far_v[:, 1]], axis=-1
        ) * 115.0
        proj = cam_ops.project_points(
            world, np.asarray(cp.rvec), np.asarray(cp.tvec),
            np.asarray(cp.K), np.zeros(5), xp=np,
        )
        expected = np.array([[0, 0], [W, 0], [W, H], [0, H]], np.float64)
        # segments are stored f32 → ~1e-4 px round-trip error
        np.testing.assert_allclose(proj, expected, atol=1e-2)

    def test_rig_frusta_concatenate(self, rig_cameras):
        segs = scene.rig_frustum_segments(rig_cameras)
        assert segs.shape == (8 * len(rig_cameras), 2, 3)


class TestSurfaceTransform:
    def test_axis_swap_and_scale(self):
        tris = np.array([[[64.0, 128.0, -192.0]] * 3])
        out = scene.surface_tris_to_viewer(tris, 64.0)
        np.testing.assert_allclose(out[0, 0], [1.0, 3.0, 2.0])

    def test_rotation_preserves_winding(self):
        # (x,-z,y) is a proper rotation: a world +y normal maps to a
        # viewer +z normal with winding intact
        tris = np.array(
            [[[0, 0, 0], [1, 0, 0], [0, 0, -1.0]]], np.float32
        )  # world normal +y (right-hand rule)
        n_w = np.cross(tris[0, 1] - tris[0, 0], tris[0, 2] - tris[0, 0])
        assert n_w[1] > 0
        out = scene.surface_tris_to_viewer(tris, 1.0)
        n_v = np.cross(out[0, 1] - out[0, 0], out[0, 2] - out[0, 0])
        assert n_v[2] > 0
