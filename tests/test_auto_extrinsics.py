"""Full-auto extrinsics: blob lattice, photometric alignment, 180° vote.

Reference flow replaced: camera_calibration.py:299-393 (manual corner
session) and :954-974 (extrinsics + config.xml)."""

import dataclasses

import numpy as np
import pytest

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.pipelines import auto_extrinsics as ax
from vbr_tpu.utils.config import CameraParams

SQ = 115.0
PATTERN = (8, 6)


def _object_points():
    cols, rows = PATTERN
    return np.array([[x * SQ, y * SQ, 0.0] for y in range(rows)
                     for x in range(cols)])


class TestFlipPose:
    def test_double_flip_is_identity(self):
        rv = np.array([0.3, -1.2, 0.5])
        tv = np.array([100.0, -300.0, 3600.0])
        rv2, tv2 = ax.flip_pose_180(*ax.flip_pose_180(rv, tv, SQ, PATTERN),
                                    SQ, PATTERN)
        np.testing.assert_allclose(rv2, rv, atol=1e-10)
        np.testing.assert_allclose(tv2, tv, atol=1e-8)

    def test_flip_reverses_corner_order(self):
        """Projecting the grid under the flipped pose must equal the
        original projection in reverse order (the 180° symmetry)."""
        rv = np.array([0.4, -1.0, 0.3])
        tv = np.array([50.0, -200.0, 3500.0])
        K = np.array([[490.0, 0, 322], [0, 490.0, 243], [0, 0, 1.0]])
        dist = np.zeros(5)
        obj = _object_points()
        a = cam_ops.project_points(obj, rv, tv, K, dist, xp=np)
        rvf, tvf = ax.flip_pose_180(rv, tv, SQ, PATTERN)
        b = cam_ops.project_points(obj, rvf, tvf, K, dist, xp=np)
        np.testing.assert_allclose(b, a[::-1], atol=1e-8)


class TestSyntheticBoard:
    """Render a board at a known pose; the detector must recover it."""

    def _render(self, rv, tv, K, dist, hw=(486, 644), sig=0.06, noise=2.0):
        H, W = hw
        ys, xs = np.mgrid[0:H, 0:W]
        pix = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64)
        nrm = np.asarray(cam_ops.undistort_points(pix, K, dist,
                                                  num_iters=20, xp=np))
        dirs = np.concatenate([nrm, np.ones((len(nrm), 1))], -1)
        R = np.asarray(cam_ops.rodrigues(rv, xp=np))
        Rt_t = R.T @ tv
        rd = dirs @ R
        lam = Rt_t[2] / rd[:, 2]
        Xb = lam[:, None] * rd - Rt_t[None, :]
        u = Xb[:, 0] / SQ + 1.0
        v = Xb[:, 1] / SQ + 1.0

        def sqw(x):
            acc = 0.0
            for k in (1, 3, 5, 7):
                acc = acc + (4 / (k * np.pi)) * np.exp(
                    -0.5 * (k * np.pi * sig) ** 2) * np.sin(k * np.pi * x)
            return acc

        pat = sqw(u) * sqw(v)
        inside = (u > 0) & (u < 9) & (v > 0) & (v < 7)
        margin = (u > -0.5) & (u < 9.5) & (v > -0.5) & (v < 7.5) & ~inside
        img = np.full(H * W, 120.0)  # background
        img[margin] = 200.0  # white sheet margin
        img[inside] = 145.0 - 75.0 * pat[inside]  # black 70 / white 220
        rng = np.random.default_rng(0)
        img = img + rng.normal(0, noise, img.shape)
        return img.reshape(H, W), (lam > 0).reshape(H, W)

    def test_recovers_known_pose(self):
        K = np.array([[490.0, 0, 322], [0, 492.0, 243], [0, 0, 1.0]])
        dist = np.array([-0.3, 0.1, 0.001, -0.001, 0.0])
        rv = np.array([1.1, -0.2, 0.15])
        tv = np.array([-380.0, -180.0, 2400.0])
        gray, _ = self._render(rv, tv, K, dist)

        # sheet mask: anything far from the background level
        sheet_region = np.abs(gray - 120.0) > 25
        from vbr_tpu.ops import corners as corner_ops

        hull = corner_ops._convex_hull(
            np.stack(np.nonzero(sheet_region)[::-1], -1).astype(np.float64)
        )
        sheet = ax.convex_fill(hull, gray.shape)
        cents, _ = ax.detect_black_squares(gray, sheet)
        assert len(cents) >= 20
        quad = ax.pattern_quad(gray, sheet)
        assert quad is not None
        _, ipts, nm = ax.orient_and_fit_homography(gray, quad, cents, K,
                                                   dist, PATTERN)
        assert nm >= 20
        from vbr_tpu.pipelines import calibration

        obj = _object_points()
        rv0, tv0 = calibration.solve_pnp(obj, ipts, K, dist)
        rv1, tv1, mse = ax.photometric_refine(
            gray, K, dist, np.asarray(rv0).ravel(), np.asarray(tv0).ravel(),
            SQ, PATTERN, iters=250,
        )
        # detector resolves orientation only up to 180°; accept either
        cand = [(rv1, tv1), ax.flip_pose_180(rv1, tv1, SQ, PATTERN)]
        errs = [np.linalg.norm(np.asarray(r).ravel() - rv) for r, _ in cand]
        r_best, t_best = cand[int(np.argmin(errs))]
        assert np.linalg.norm(np.asarray(r_best).ravel() - rv) < 0.01
        assert np.linalg.norm(np.asarray(t_best).ravel() - tv) < 25.0

    def test_photometric_mse_ranks_true_pose(self):
        K = np.array([[490.0, 0, 322], [0, 492.0, 243], [0, 0, 1.0]])
        dist = np.zeros(5)
        rv = np.array([1.1, -0.2, 0.15])
        tv = np.array([-380.0, -180.0, 2400.0])
        gray, _ = self._render(rv, tv, K, dist)
        good = ax.photometric_mse(gray, K, dist, rv, tv, SQ, PATTERN)
        bad = ax.photometric_mse(gray, K, dist, rv, tv + [30, 0, 0], SQ,
                                 PATTERN)
        assert good < bad


class TestOrientationVote:
    def test_vote_detects_flipped_camera(self):
        from vbr_tpu.utils.synthetic import synthetic_rig

        cams, masks, _ = synthetic_rig()
        # candidates: camera 2's candidate pose is the FLIPPED one; the
        # vote must flip it back (relative to the cam-0 anchor)
        cand = []
        for i, cp in enumerate(cams):
            rv, tv = np.asarray(cp.rvec), np.asarray(cp.tvec)
            if i == 2:
                rv, tv = ax.flip_pose_180(rv, tv, SQ, PATTERN)
            cand.append((rv, tv))
        flips, votes = ax.resolve_rig_orientation(cams, cand, masks, SQ,
                                                  PATTERN)
        assert flips == [False, False, True, False], (flips, votes)


class TestRealRig:
    """Single-camera auto extrinsics on the real dataset (cam2)."""

    def test_cam2_beats_shipped_photometrically(self, data_dir):
        import os

        from vbr_tpu.pipelines import reconstruction
        from vbr_tpu.ops import corners as corner_ops

        cams = reconstruction.load_rig(data_dir)
        cp = cams[1]
        d = os.path.join(data_dir, "cam2")
        gray = ax.temporal_mean_gray(os.path.join(d, "checkerboard.avi"),
                                     max_frames=32)
        bg = ax.median_background(os.path.join(d, "background.avi"))
        from vbr_tpu.utils import video as vio

        frame0 = vio.get_frame(os.path.join(d, "checkerboard.avi"), 0)
        region = ax.largest_change_region(bg, frame0)
        assert region is not None
        hull = corner_ops._convex_hull(
            np.stack(np.nonzero(region)[::-1], -1).astype(np.float64)
        )
        sheet = ax.convex_fill(hull, gray.shape)
        cents, _ = ax.detect_black_squares(gray, sheet)
        quad = ax.pattern_quad(gray, sheet)
        assert quad is not None and len(cents) >= 20
        K, dist = np.asarray(cp.K), np.asarray(cp.dist)
        _, ipts, nm = ax.orient_and_fit_homography(gray, quad, cents, K,
                                                   dist, PATTERN)
        assert nm >= 25
        from vbr_tpu.pipelines import calibration

        obj = _object_points()
        rv0, tv0 = calibration.solve_pnp(obj, ipts, K, dist)
        rv1, tv1, _ = ax.photometric_refine(
            gray, K, dist, np.asarray(rv0).ravel(), np.asarray(tv0).ravel(),
            SQ, PATTERN, iters=150,
        )
        # one of the 180° pair must be near the shipped orientation
        cand = [(rv1, tv1), ax.flip_pose_180(rv1, tv1, SQ, PATTERN)]
        drs = [np.linalg.norm(np.asarray(r).ravel()
                              - np.asarray(cp.rvec).ravel()) for r, _ in cand]
        rv_b, tv_b = cand[int(np.argmin(drs))]
        assert min(drs) < 0.05
        assert np.linalg.norm(np.asarray(tv_b).ravel()
                              - np.asarray(cp.tvec).ravel()) < 300.0
        # and must fit the image better than the shipped manual pose
        ours = ax.photometric_mse(gray, K, dist, rv_b, tv_b, SQ, PATTERN)
        ship = ax.photometric_mse(gray, K, dist, np.asarray(cp.rvec).ravel(),
                                  np.asarray(cp.tvec).ravel(), SQ, PATTERN)
        assert ours < ship, (ours, ship)


@pytest.mark.slow
class TestRealRigFull:
    """Full 4-camera auto extrinsics gate (VERDICT r1 item 5)."""

    def test_all_cameras_resolved_and_better(self, data_dir):
        from vbr_tpu.pipelines import reconstruction

        cams = reconstruction.load_rig(data_dir)
        res = ax.auto_extrinsics(data_dir, cams, photometric_iters=300)
        assert len(res.cameras) == 4
        assert all(m >= 25 for m in res.n_matched)
        # the winning vote must be a clear argmax
        counts = sorted(res.votes.values(), reverse=True)
        assert counts[0] > counts[1]
        for cp, new, mse in zip(cams, res.cameras, res.photometric_mse):
            drv = min(
                np.linalg.norm(np.asarray(new.rvec) - np.asarray(cp.rvec)),
                np.linalg.norm(
                    np.asarray(ax.flip_pose_180(new.rvec, new.tvec)[0])
                    - np.asarray(cp.rvec)),
            )
            assert drv < 0.05

        # independent-geometry ordering (VERDICT r2 item 2): the freshly
        # recovered poses must beat the shipped manual calibration on both
        # metrics the photometric optimizer never saw
        import os

        from vbr_tpu.pipelines import extrinsics_eval as ev

        poses_auto = [(np.asarray(c.rvec).ravel(), np.asarray(c.tvec).ravel())
                      for c in res.cameras]
        poses_ship = [(np.asarray(c.rvec).ravel(), np.asarray(c.tvec).ravel())
                      for c in cams]
        grays = [
            ax.temporal_mean_gray(
                os.path.join(data_dir, f"cam{i + 1}", "checkerboard.avi"),
                max_frames=32,
            )
            for i in range(4)
        ]
        rep_auto, rep_ship = ev.evaluate_pose_sets(
            grays, cams, poses_auto, poses_ship
        )
        rms_a = float(np.sqrt(np.mean(np.square(rep_auto.reproj_rms_px))))
        rms_s = float(np.sqrt(np.mean(np.square(rep_ship.reproj_rms_px))))
        assert rms_a < rms_s, (rms_a, rms_s)
        assert (rep_auto.triangulation_rms_mm
                < rep_ship.triangulation_rms_mm), (rep_auto, rep_ship)
