"""Corner refinement + chessboard detection vs OpenCV on synthetic and
real (checkerboard.avi) imagery."""

import cv2
import numpy as np
import pytest

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.ops import corners

RNG = np.random.default_rng(11)


def render_chessboard(H=486, W=644, cols=8, rows=6, square=40, H_warp=None,
                      noise=2.0, blur=1.2):
    """Synthetic chessboard image + ground-truth inner corner positions."""
    # board with one square of margin
    bw = (cols + 1) * square
    bh = (rows + 1) * square
    ys, xs = np.mgrid[0:H, 0:W]
    pts = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64)
    if H_warp is None:
        H_warp = np.array(
            [[1, 0.03, (W - bw) / 2], [0.02, 1, (H - bh) / 2], [1e-5, -2e-5, 1]]
        )
    Hinv = np.linalg.inv(H_warp)
    board_xy = cam_ops.apply_homography(Hinv, pts, xp=np)
    inside = (
        (board_xy[:, 0] >= 0) & (board_xy[:, 0] < bw)
        & (board_xy[:, 1] >= 0) & (board_xy[:, 1] < bh)
    )
    cell = np.floor(board_xy / square).astype(int)
    colorv = np.where((cell[:, 0] + cell[:, 1]) % 2 == 0, 30.0, 225.0)
    img = np.full(H * W, 160.0)
    img[inside] = colorv[inside]
    img = img.reshape(H, W)
    if blur:
        img = cv2.GaussianBlur(img, (0, 0), blur)
    if noise:
        img = img + RNG.normal(0, noise, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    inner = np.array(
        [[(x + 1) * square, (y + 1) * square] for y in range(rows) for x in range(cols)],
        dtype=np.float64,
    )
    truth = cam_ops.apply_homography(H_warp, inner, xp=np)
    return img, truth


def match_sets(a, b):
    """Mean nearest-neighbor distance between two corner sets of equal size."""
    d = np.linalg.norm(a[:, None] - b[None], axis=-1)
    return d.min(axis=1).mean()


class TestCornerSubpix:
    def test_matches_opencv_on_synthetic(self):
        img, truth = render_chessboard()
        init = truth + RNG.uniform(-2, 2, truth.shape)
        ours = np.asarray(
            corners.corner_subpix(img, init.astype(np.float32), (11, 11))
        )
        cv_c = cv2.cornerSubPix(
            img, init.astype(np.float32).reshape(-1, 1, 2).copy(), (11, 11), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 0.1),
        ).reshape(-1, 2)
        # near-exact agreement with cv2 (same algorithm + weight mask);
        # both carry the same ~0.35 px synthetic-rendering bias vs truth
        assert np.linalg.norm(ours - cv_c, axis=1).mean() < 0.05
        assert np.linalg.norm(ours - truth, axis=1).mean() < 0.5

    def test_improves_over_initial(self):
        img, truth = render_chessboard()
        init = truth + RNG.uniform(-2.5, 2.5, truth.shape)
        ours = np.asarray(
            corners.corner_subpix(img, init.astype(np.float32), (11, 11))
        )
        err_init = np.linalg.norm(init - truth, axis=1).mean()
        err_ref = np.linalg.norm(ours - truth, axis=1).mean()
        assert err_ref < err_init * 0.3


class TestDetection:
    def test_synthetic_board(self):
        img, truth = render_chessboard()
        got = corners.detect_chessboard(img, (8, 6))
        assert got is not None
        assert got.shape == (48, 2)
        assert match_sets(got, truth) < 0.5

    def test_rotated_board(self):
        Hw = np.array(
            [[0.97, -0.26, 320], [0.25, 0.96, 60], [3e-5, 1e-5, 1]]
        )
        img, truth = render_chessboard(H_warp=Hw)
        got = corners.detect_chessboard(img, (8, 6))
        assert got is not None
        assert match_sets(got, truth) < 0.6

    def test_no_board_returns_none(self):
        img = RNG.integers(0, 255, size=(200, 300), dtype=np.uint8)
        got = corners.detect_chessboard(img, (8, 6))
        assert got is None

    def test_real_frame_vs_opencv(self, data_dir):
        """Real checkerboard.avi frame (cam3 frame 20 — moderate view).

        Context: cv2.findChessboardCorners fails on cams 1/2/4 entirely
        (which is why the reference ships a manual-corner fallback,
        camera_calibration.py:299-393); on cam3 our detector succeeds on
        the moderate-perspective frames and agrees with cv2 to ~1.3 px
        (the residual is sub-pixel-refinement differences on a ~12 px
        pitch board).  Extreme-foreshortening frames (corner pitch < 4 px)
        are a known limitation of the saddle+lattice approach.
        """
        import os

        cap = cv2.VideoCapture(os.path.join(data_dir, "cam3", "checkerboard.avi"))
        cap.set(cv2.CAP_PROP_POS_FRAMES, 20)
        ok, frame = cap.read()
        cap.release()
        assert ok
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        found_cv, cv_corners = cv2.findChessboardCorners(
            gray, (8, 6),
            flags=cv2.CALIB_CB_ADAPTIVE_THRESH + cv2.CALIB_CB_NORMALIZE_IMAGE,
        )
        got = corners.detect_chessboard(gray, (8, 6))
        if not found_cv:
            pytest.skip("OpenCV itself cannot find the board in this frame")
        assert got is not None, "our detector must find the board cv2 finds"
        assert match_sets(got, cv_corners.reshape(-1, 2)) < 2.0
