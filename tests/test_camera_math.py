"""Parity tests: vbr_tpu.ops.camera vs OpenCV's C++ calib3d kernels."""

import cv2
import numpy as np
import pytest

from vbr_tpu.ops import camera as cam_ops

RNG = np.random.default_rng(0)


def random_rvecs(n):
    vecs = RNG.normal(size=(n, 3))
    scales = RNG.uniform(0.01, np.pi - 0.05, size=(n, 1))
    return vecs / np.linalg.norm(vecs, axis=1, keepdims=True) * scales


class TestRodrigues:
    def test_matches_opencv(self):
        for rvec in random_rvecs(50):
            R_cv, _ = cv2.Rodrigues(rvec)
            R = cam_ops.rodrigues(rvec, xp=np)
            np.testing.assert_allclose(R, R_cv, atol=1e-12)

    def test_zero_vector(self):
        np.testing.assert_allclose(
            cam_ops.rodrigues(np.zeros(3), xp=np), np.eye(3), atol=1e-15
        )

    def test_inverse_roundtrip(self):
        for rvec in random_rvecs(50):
            R = cam_ops.rodrigues(rvec, xp=np)
            back = cam_ops.rodrigues_inverse(R, xp=np)
            np.testing.assert_allclose(back, rvec, atol=1e-9)

    def test_inverse_matches_opencv(self):
        for rvec in random_rvecs(20):
            R_cv, _ = cv2.Rodrigues(rvec)
            r_cv, _ = cv2.Rodrigues(R_cv)
            back = cam_ops.rodrigues_inverse(R_cv, xp=np)
            np.testing.assert_allclose(back, r_cv.ravel(), atol=1e-9)

    def test_jax_matches_numpy(self):
        import jax.numpy as jnp

        rvec = random_rvecs(1)[0]
        R_np = cam_ops.rodrigues(rvec, xp=np)
        R_j = np.asarray(cam_ops.rodrigues(jnp.asarray(rvec), xp=jnp))
        np.testing.assert_allclose(R_j, R_np, atol=1e-6)


class TestProjectPoints:
    def _shipped_camera(self):
        K = np.array([[488.85, 0, 334.2], [0, 490.50, 228.62], [0, 0, 1.0]])
        dist = np.array([-0.368, 0.194, -2e-4, 2.07e-4, -0.0613])
        rvec = np.array([-1.334, 0.552, 0.633])
        tvec = np.array([239.85, 731.16, 4745.83])
        return K, dist, rvec, tvec

    def test_matches_opencv_shipped_camera(self):
        K, dist, rvec, tvec = self._shipped_camera()
        pts = RNG.uniform(-1500, 1500, size=(5000, 3))
        uv_cv, _ = cv2.projectPoints(pts, rvec, tvec, K, dist)
        uv = cam_ops.project_points(pts, rvec, tvec, K, dist, xp=np)
        np.testing.assert_allclose(uv, uv_cv.reshape(-1, 2), atol=1e-8)

    def test_matches_opencv_random_cameras(self):
        for _ in range(5):
            K = np.array(
                [
                    [RNG.uniform(300, 900), 0, RNG.uniform(200, 400)],
                    [0, RNG.uniform(300, 900), RNG.uniform(150, 350)],
                    [0, 0, 1.0],
                ]
            )
            dist = RNG.uniform(-0.3, 0.3, size=5)
            rvec = random_rvecs(1)[0]
            tvec = np.array([*RNG.uniform(-500, 500, 2), RNG.uniform(2000, 6000)])
            pts = RNG.uniform(-1000, 1000, size=(1000, 3))
            uv_cv, _ = cv2.projectPoints(pts, rvec, tvec, K, dist)
            uv = cam_ops.project_points(pts, rvec, tvec, K, dist, xp=np)
            np.testing.assert_allclose(uv, uv_cv.reshape(-1, 2), atol=1e-7)

    def test_undistort_roundtrip(self):
        K, dist, rvec, tvec = self._shipped_camera()
        pts = RNG.uniform(-800, 800, size=(500, 3)) + np.array([0, 0, 0])
        uv = cam_ops.project_points(pts, rvec, tvec, K, dist, xp=np)
        und = cam_ops.undistort_points(uv, K, dist, num_iters=20, xp=np)
        # Re-distort and re-apply K: should land back on uv
        xd, yd = cam_ops.distort_normalized(und[:, 0], und[:, 1], dist, xp=np)
        u2 = K[0, 0] * xd + K[0, 2]
        v2 = K[1, 1] * yd + K[1, 2]
        np.testing.assert_allclose(np.stack([u2, v2], -1), uv, atol=1e-6)


class TestHomography:
    def test_4pt_matches_opencv(self):
        src = np.array([[0, 0], [100, 3], [97, 104], [-2, 99]], dtype=np.float64)
        dst = np.array([[10, 20], [210, 15], [190, 230], [15, 210]], dtype=np.float64)
        H_cv = cv2.getPerspectiveTransform(src.astype(np.float32), dst.astype(np.float32))
        H = cam_ops.perspective_transform_4pt(src, dst, xp=np)
        np.testing.assert_allclose(H / H[2, 2], H_cv / H_cv[2, 2], atol=1e-4)

    def test_dlt_recovers_homography(self):
        H_true = np.array([[1.2, 0.1, 30], [-0.05, 0.9, -12], [1e-4, -2e-4, 1.0]])
        src = RNG.uniform(0, 500, size=(48, 2))
        dst = cam_ops.apply_homography(H_true, src, xp=np)
        H = cam_ops.homography_dlt(src, dst, xp=np)
        np.testing.assert_allclose(H, H_true / H_true[2, 2], atol=1e-8)

    def test_apply_homography(self):
        H = np.array([[2.0, 0, 5], [0, 3.0, -4], [0, 0, 1.0]])
        pts = np.array([[1.0, 1.0], [2.0, 0.0]])
        out = cam_ops.apply_homography(H, pts, xp=np)
        np.testing.assert_allclose(out, [[7, -1], [9, -4]], atol=1e-12)


class TestNoMatmulInProjection:
    """Regression locks: the projection chain must stay matmul-free.

    On TPU, jnp matmuls (even 3×3) route through the MXU's bfloat16 path,
    which silently costs ~0.5 px at this scene scale — enough to break
    the bit-exact carve-table guarantee (observed: +131 voxels at 128³).
    The fix is elementwise arithmetic; these tests pin it via the jaxpr.
    """

    def _jaxpr_of(self, fn, *args):
        import jax

        return str(jax.make_jaxpr(fn)(*args))

    def test_project_points_has_no_dot(self):
        import jax.numpy as jnp

        from vbr_tpu.ops import camera as cam_ops

        pts = jnp.ones((8, 3), jnp.float32)
        rvec = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
        tvec = jnp.asarray([0.0, 0.0, 5000.0], jnp.float32)
        K = jnp.eye(3, dtype=jnp.float32) * 500
        dist = jnp.zeros(5, jnp.float32)
        jaxpr = self._jaxpr_of(
            lambda p: cam_ops.project_points(p, rvec, tvec, K, dist, xp=jnp), pts
        )
        assert "dot_general" not in jaxpr

    def test_carve_fused_has_no_dot(self):
        import jax.numpy as jnp

        from vbr_tpu.ops import carve

        C, H, W, N = 2, 16, 32, 64
        masks = jnp.zeros((C, H, W), jnp.uint8)
        images = jnp.zeros((C, H, W, 3), jnp.uint8)
        pts = jnp.ones((N, 3), jnp.float32)
        R = jnp.stack([jnp.eye(3, dtype=jnp.float32)] * C)
        t = jnp.zeros((C, 3), jnp.float32)
        K4 = jnp.ones((C, 4), jnp.float32)
        dist = jnp.zeros((C, 5), jnp.float32)
        import jax

        jaxpr = str(
            jax.make_jaxpr(
                lambda m, im: carve.carve_fused(
                    m, im, pts, R, t, K4, dist, image_hw=(H, W),
                    views_threshold=2,
                )
            )(masks, images)
        )
        assert "dot_general" not in jaxpr
