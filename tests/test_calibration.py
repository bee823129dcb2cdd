"""Calibration parity vs cv2.calibrateCamera / cv2.solvePnP on synthetic rigs."""

import cv2
import numpy as np
import pytest

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.pipelines import calibration

RNG = np.random.default_rng(7)

K_TRUE = np.array([[490.0, 0, 322.0], [0, 492.0, 241.0], [0, 0, 1.0]])
DIST_TRUE = np.array([-0.32, 0.14, -3e-4, 2e-4, -0.03])
BOARD = (8, 6)
SQUARE = 115.0


def synth_views(n_views, noise=0.0, dist=DIST_TRUE):
    obj = calibration.chessboard_object_points(BOARD, SQUARE)
    img_points, rvecs, tvecs = [], [], []
    k = 0
    while len(img_points) < n_views:
        k += 1
        rvec = RNG.normal(0, 0.35, 3) + np.array([0.15, -0.1, 0.05])
        tvec = np.array(
            [RNG.uniform(-300, 100), RNG.uniform(-300, 100), RNG.uniform(1800, 3200)]
        )
        uv = cam_ops.project_points(obj, rvec, tvec, K_TRUE, dist, xp=np)
        if not ((uv[:, 0] > 5) & (uv[:, 0] < 639) & (uv[:, 1] > 5) & (uv[:, 1] < 481)).all():
            continue
        if noise:
            uv = uv + RNG.normal(0, noise, uv.shape)
        img_points.append(uv.astype(np.float32))
        rvecs.append(rvec)
        tvecs.append(tvec)
    return obj, img_points, rvecs, tvecs


class TestCalibrateCamera:
    def test_noiseless_recovers_truth(self):
        obj, img_points, _, _ = synth_views(8)
        res = calibration.calibrate_camera(img_points, (644, 486), BOARD, SQUARE)
        assert res.rms < 1e-4
        np.testing.assert_allclose(res.K, K_TRUE, atol=0.05)
        np.testing.assert_allclose(res.dist, DIST_TRUE, atol=1e-3)

    def test_matches_opencv_with_noise(self):
        obj, img_points, _, _ = synth_views(10, noise=0.3)
        res = calibration.calibrate_camera(img_points, (644, 486), BOARD, SQUARE)
        objs = [obj.astype(np.float32)] * len(img_points)
        rms_cv, K_cv, dist_cv, _, _ = cv2.calibrateCamera(
            objs, img_points, (644, 486), None, None
        )
        # same objective → same optimum (within solver tolerance)
        assert abs(res.rms - rms_cv) < 0.02, (res.rms, rms_cv)
        np.testing.assert_allclose(res.K[0, 0], K_cv[0, 0], rtol=5e-3)
        np.testing.assert_allclose(res.K[1, 1], K_cv[1, 1], rtol=5e-3)
        np.testing.assert_allclose(res.K[:2, 2], K_cv[:2, 2], atol=2.0)

    def test_per_view_errors_shape_and_scale(self):
        _, img_points, _, _ = synth_views(6, noise=0.5)
        res = calibration.calibrate_camera(img_points, (644, 486), BOARD, SQUARE)
        assert res.per_view_errors.shape == (6,)
        assert 0.1 < res.per_view_errors.mean() < 1.5
        assert res.intrinsic_std.shape == (9,)
        assert np.isfinite(res.intrinsic_std[:4]).all()

    def test_pose_recovery(self):
        obj, img_points, rvecs, tvecs = synth_views(6)
        res = calibration.calibrate_camera(img_points, (644, 486), BOARD, SQUARE)
        for i in range(6):
            np.testing.assert_allclose(res.rvecs[i], rvecs[i], atol=1e-3)
            np.testing.assert_allclose(res.tvecs[i], tvecs[i], atol=1.0)


class TestSolvePnP:
    def test_matches_opencv(self):
        obj = calibration.chessboard_object_points(BOARD, SQUARE)
        rvec_t = np.array([-1.2, 0.5, 0.6])
        tvec_t = np.array([240.0, 700.0, 4700.0])
        uv = cam_ops.project_points(obj, rvec_t, tvec_t, K_TRUE, DIST_TRUE, xp=np)
        uv_n = uv + RNG.normal(0, 0.2, uv.shape)

        rvec, tvec = calibration.solve_pnp(obj, uv_n, K_TRUE, DIST_TRUE)
        ok, rvec_cv, tvec_cv = cv2.solvePnP(
            obj.astype(np.float32), uv_n.astype(np.float32), K_TRUE, DIST_TRUE
        )
        assert ok
        np.testing.assert_allclose(rvec, rvec_cv.ravel(), atol=5e-3)
        np.testing.assert_allclose(tvec, tvec_cv.ravel(), atol=5.0)
        # reprojection error equal or better than cv2's
        uv_ours = cam_ops.project_points(obj, rvec, tvec, K_TRUE, DIST_TRUE, xp=np)
        uv_cv = cam_ops.project_points(
            obj, rvec_cv.ravel(), tvec_cv.ravel(), K_TRUE, DIST_TRUE, xp=np
        )
        err_ours = np.linalg.norm(uv_ours - uv_n, axis=1).mean()
        err_cv = np.linalg.norm(uv_cv - uv_n, axis=1).mean()
        assert err_ours <= err_cv + 1e-3

    def test_ransac_rejects_outliers(self):
        obj = calibration.chessboard_object_points(BOARD, SQUARE)
        rvec_t = np.array([-1.2, 0.5, 0.6])
        tvec_t = np.array([240.0, 700.0, 4700.0])
        uv = cam_ops.project_points(obj, rvec_t, tvec_t, K_TRUE, DIST_TRUE, xp=np)
        uv_bad = uv.copy()
        outliers = RNG.choice(len(uv), 8, replace=False)
        uv_bad[outliers] += RNG.uniform(40, 90, (8, 2))
        rvec, tvec, inliers = calibration.solve_pnp_ransac(
            obj, uv_bad, K_TRUE, DIST_TRUE
        )
        assert (~inliers[outliers]).all(), "planted outliers must be rejected"
        np.testing.assert_allclose(rvec, rvec_t, atol=1e-2)
        np.testing.assert_allclose(tvec, tvec_t, atol=10.0)


class TestDiscarding:
    def test_bad_view_discarded(self):
        _, img_points, _, _ = synth_views(7, noise=0.1)
        # corrupt one view badly
        img_points[3] = img_points[3] + RNG.normal(0, 3.0, img_points[3].shape).astype(
            np.float32
        )
        kept, kept_idx, discarded, discarded_idx = calibration.discard_bad_image_points(
            img_points, (644, 486), BOARD, SQUARE, discard_threshold=0.15
        )
        assert discarded_idx == [3]
        assert len(kept) == 6
