"""Reconstruction pipeline seam: viewer contract math, PLY, video IO."""

import os

import numpy as np

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.pipelines import reconstruction
from vbr_tpu.utils import video as vio
from vbr_tpu.utils.config import CameraParams


class TestViewerContract:
    def test_generate_grid_semantics(self):
        data, colors = reconstruction.generate_grid(3, 2)
        assert len(data) == 6
        # first tile at (-1.5, -1, -1); checkerboard colors alternate
        np.testing.assert_allclose(data[0], [-1.5, -1.0, -1.0])
        assert colors[0] == [1.0, 1.0, 1.0]
        assert colors[1] == [0, 0, 0]

    def test_cam_positions_formula(self):
        # camera at a known world position: C = -R^T t
        rvec = np.array([0.1, -0.2, 0.3])
        R = cam_ops.rodrigues(rvec, xp=np)
        C_true = np.array([1000.0, -500.0, 2000.0])
        tvec = -R @ C_true
        cp = CameraParams(
            fx=500, fy=500, cx=320, cy=240,
            rvec_xyz=tuple(rvec), tvec_xyz=tuple(tvec),
        )
        positions, colors = reconstruction.get_cam_positions([cp], 115.0)
        scaled = C_true / 115.0
        np.testing.assert_allclose(
            positions[0], [scaled[0], -scaled[2], scaled[1]], atol=1e-9
        )
        assert len(colors) == 1

    def test_cam_rotation_matrices_structure(self):
        rvec = np.array([0.4, 0.1, -0.2])
        cp = CameraParams(fx=500, fy=500, cx=320, cy=240,
                          rvec_xyz=tuple(rvec))
        (M,) = reconstruction.get_cam_rotation_matrices([cp])
        R = cam_ops.rodrigues(rvec, xp=np)
        # M = rot90y @ flipY @ [R_col0 | R_col2 | R_col1] (glm semantics)
        rot90y = np.array(
            [[0, 0, 1, 0], [0, 1, 0, 0], [-1, 0, 0, 0], [0, 0, 0, 1]],
            dtype=np.float64,
        )
        flip_y = np.diag([1.0, -1.0, 1.0, 1.0])
        inner = np.eye(4)
        inner[:3, 0] = R[:, 0]
        inner[:3, 1] = R[:, 2]
        inner[:3, 2] = R[:, 1]
        np.testing.assert_allclose(M, rot90y @ flip_y @ inner, atol=1e-12)
        # proper rotation with the axis swap absorbed: |det| == 1
        np.testing.assert_allclose(abs(np.linalg.det(M[:3, :3])), 1.0)


class TestPLY:
    def test_roundtrip_parse(self, tmp_path):
        pos = np.array([[1.0, 2.0, 3.0], [-1.5, 0.25, 9.0]])
        col = np.array([[1.0, 0.5, 0.0], [0.0, 0.0, 1.0]])
        path = str(tmp_path / "pts.ply")
        reconstruction.write_ply(path, pos, col)
        with open(path) as f:
            lines = f.read().splitlines()
        assert lines[0] == "ply"
        n = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
        assert n == 2
        body = lines[lines.index("end_header") + 1 :]
        vals = body[0].split()
        np.testing.assert_allclose([float(v) for v in vals[:3]], pos[0])
        assert [int(v) for v in vals[3:]] == [255, 127, 0]


class TestVideoIO:
    def test_properties_and_frames(self, data_dir):
        path = os.path.join(data_dir, "cam1", "video.avi")
        w, h, n = vio.video_properties(path)
        assert (w, h) == (644, 486)
        assert n > 100
        f0 = vio.get_frame(path, 0)
        f5 = vio.get_frame(path, 5)
        assert f0.shape == (486, 644, 3)
        assert not np.array_equal(f0, f5)
        # iterator agrees with seek-by-decode
        it = vio.frame_iterator(path)
        first = next(it)
        np.testing.assert_array_equal(first, f0)

    def test_get_frame_past_end(self, data_dir):
        path = os.path.join(data_dir, "cam1", "background.avi")
        assert vio.get_frame(path, 10**6) is None

    def test_read_video_step(self, data_dir):
        path = os.path.join(data_dir, "cam1", "background.avi")
        a = vio.read_video(path, max_frames=3)
        b = vio.read_video(path, max_frames=2, step=2)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[2], b[1])
