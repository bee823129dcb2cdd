"""Headless renderer, native host runtime, and CLI surface tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from vbr_tpu.viewer import headless


class TestHeadlessRenderer:
    def test_renders_points(self, tmp_path):
        rng = np.random.default_rng(0)
        pos = rng.uniform(-5, 5, (2000, 3))
        col = rng.uniform(0, 1, (2000, 3))
        img = headless.render_points(pos, col, eye=(0, 0, 20), target=(0, 0, 0))
        assert img.shape == (720, 960, 3)
        # something was drawn near the center
        center = img[300:420, 400:560]
        assert center.std() > 5
        path = str(tmp_path / "r.png")
        headless.save_png(path, img)
        assert os.path.getsize(path) > 1000

    def test_depth_ordering(self):
        # a red point in front of a blue point along the same ray
        pos = np.array([[0, 0, 5.0], [0, 0, 10.0]])
        col = np.array([[1, 0, 0.0], [0, 0, 1.0]])
        img = headless.render_points(
            pos, col, eye=(0, 0, 0), target=(0, 0, 1), point_size=5
        )
        center = img[360, 480]
        assert center[0] > 200 and center[2] < 50, f"expected red, got {center}"

    def test_empty_scene(self):
        img = headless.render_points(np.zeros((0, 3)), np.zeros((0, 3)))
        assert img.shape == (720, 960, 3)


class TestNativeRuntime:
    def test_prefetching_source(self, data_dir):
        from vbr_tpu.native import PrefetchingSource

        src = PrefetchingSource(
            [os.path.join(data_dir, f"cam{i}", "video.avi") for i in range(1, 5)]
        )
        assert (src.num_cameras, src.height, src.width) == (4, 486, 644)
        f = src.next_frames()
        assert f.shape == (4, 486, 644, 3)
        # frames advance
        f2 = src.next_frames()
        assert not np.array_equal(f, f2)
        src.close()

    def test_source_matches_opencv(self, data_dir):
        import cv2

        from vbr_tpu.native import PrefetchingSource

        src = PrefetchingSource([os.path.join(data_dir, "cam1", "video.avi")])
        ours = src.next_frames()[0]
        src.close()
        cap = cv2.VideoCapture(os.path.join(data_dir, "cam1", "video.avi"))
        _, ref = cap.read()
        cap.release()
        np.testing.assert_array_equal(ours, ref)

    def test_bad_path_raises(self):
        from vbr_tpu.native import PrefetchingSource

        with pytest.raises(FileNotFoundError):
            PrefetchingSource(["/nonexistent/video.avi"])

    def test_mog_oracle_basic(self):
        from vbr_tpu.native import MOGOracle

        m = MOGOracle(history=50, nmixtures=5, background_ratio=0.7,
                      noise_sigma=15)
        bg = np.full((32, 32, 3), 100, np.uint8)
        for _ in range(30):
            m.apply(bg, -1)
        assert m.apply(bg, 0).mean() == 0
        fg = np.full((32, 32, 3), 240, np.uint8)
        assert (m.apply(fg, 0) > 0).all()


class TestCLI:
    def test_help_lists_subcommands(self):
        out = subprocess.run(
            [sys.executable, "-m", "vbr_tpu.apps.cli", "--help"],
            capture_output=True, text=True,
            cwd=os.path.join(os.path.dirname(__file__), ".."),
        )
        assert out.returncode == 0
        for cmd in ("calibrate", "masks", "carve", "mesh", "render", "view"):
            assert cmd in out.stdout


class TestVideoSink:
    """mp4v writer for annotated calibration artifacts (reference
    camera_calibration.py:441-444,508-509)."""

    def test_roundtrip_readable(self, tmp_path):
        import cv2

        from vbr_tpu.native import VideoSink

        path = str(tmp_path / "annotated.mp4")
        with VideoSink(path, 1.0, 64, 48) as sink:
            for i in range(4):
                frame = np.full((48, 64, 3), i * 60, np.uint8)
                sink.write(frame)
        assert os.path.getsize(path) > 100
        cap = cv2.VideoCapture(path)
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
        assert n == 4

    def test_dimension_mismatch_raises(self, tmp_path):
        from vbr_tpu.native import VideoSink

        with VideoSink(str(tmp_path / "x.mp4"), 1.0, 64, 48) as sink:
            with pytest.raises(ValueError):
                sink.write(np.zeros((32, 32, 3), np.uint8))

    def test_corner_overlay_draws(self):
        from vbr_tpu.pipelines import validation

        img = np.zeros((96, 128, 3), np.uint8)
        pts = np.stack(
            [np.linspace(10, 110, 48), np.linspace(10, 80, 48)], axis=-1
        )
        validation.draw_chessboard_corners(img, pts, (8, 6))
        assert (img > 0).any()
        # rainbow rows: more than one distinct color drawn
        colors = np.unique(img.reshape(-1, 3), axis=0)
        assert len(colors) > 3
