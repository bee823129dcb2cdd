"""Geometric extrinsics evaluation (pipelines/extrinsics_eval).

The auto-extrinsics quality claim must rest on metrics its photometric
optimizer never saw (VERDICT r2): saddle-corner reprojection, cross-camera
triangulation against the known 115 mm lattice, and hull silhouette
consistency.  Here the machinery is validated on a synthetic rig with
exact ground truth, and the real-rig auto-vs-manual ordering is locked in
default CI using the committed pose artifacts.

Reference context: the reference validates extrinsics only by an AR
overlay eyeball check (camera_calibration.py:824-864); it has no
quantitative extrinsics metric at all.
"""

import os

import numpy as np
import pytest

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.pipelines import extrinsics_eval as ev
from vbr_tpu.utils.config import CameraParams

SQ = 115.0
PATTERN = (8, 6)


def _make_camera(center, target, f=820.0, W=644, H=486):
    from vbr_tpu.utils.synthetic import look_at_rt

    R, tvec = look_at_rt(np.asarray(center, float),
                         np.asarray(target, float))
    rvec = cam_ops.rodrigues_inverse(R, xp=np)
    return (
        CameraParams(fx=f, fy=f, cx=W / 2, cy=H / 2),
        np.asarray(rvec, float).ravel(),
        np.asarray(tvec, float).ravel(),
    )


def _render_board_view(cp, rvec, tvec, square_px=40):
    """Render the 115 mm-lattice board exactly as (cp, rvec, tvec) sees it
    (plane z=0 homography; no distortion)."""
    from tests.test_corners import render_chessboard

    R = cam_ops.rodrigues(rvec, xp=np)
    Hcam = np.asarray(cp.K) @ np.column_stack([R[:, 0], R[:, 1], tvec])
    # board-pixel → world-mm: inner corner (x, y) sits at
    # board_px (x+1, y+1)·square_px and world ((x·115, y·115, 0))
    A = np.array(
        [[SQ / square_px, 0.0, -SQ], [0.0, SQ / square_px, -SQ],
         [0.0, 0.0, 1.0]]
    )
    H_warp = Hcam @ A
    img, truth = render_chessboard(
        cols=PATTERN[0], rows=PATTERN[1], square=square_px,
        H_warp=H_warp / H_warp[2, 2], noise=0.5, blur=1.0,
    )
    return img, truth


def _synthetic_rig(n=3):
    centers = [(2600.0, 900.0, 2100.0), (-700.0, 2800.0, 2300.0),
               (2900.0, 2700.0, 1900.0)][:n]
    target = (420.0, 300.0, 0.0)
    cams, poses, grays = [], [], []
    for c in centers:
        cp, rv, tv = _make_camera(c, target)
        img, _ = _render_board_view(cp, rv, tv)
        cams.append(cp)
        poses.append((rv, tv))
        grays.append(img)
    return cams, poses, grays


class TestTriangulation:
    def test_recovers_point_from_rays(self):
        rng = np.random.default_rng(3)
        X = np.array([300.0, -150.0, 800.0])
        origins = rng.normal(0, 2000.0, (5, 3))
        dirs = X - origins
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        Xh = ev.triangulate_rays(origins, dirs)
        np.testing.assert_allclose(Xh, X, atol=1e-8)

    def test_board_points_lattice(self):
        obj = ev.board_object_points()
        assert obj.shape == (48, 3)
        np.testing.assert_allclose(obj[1] - obj[0], [SQ, 0, 0])
        np.testing.assert_allclose(obj[PATTERN[0]] - obj[0], [0, SQ, 0])


class TestSyntheticGroundTruth:
    """True poses must beat perturbed poses on every independent metric."""

    def test_true_pose_wins_on_all_metrics(self):
        cams, poses_true, grays = _synthetic_rig(3)
        rng = np.random.default_rng(7)
        poses_pert = [
            (rv + rng.normal(0, 0.002, 3), tv + rng.normal(0, 12.0, 3))
            for rv, tv in poses_true
        ]
        rep_t, rep_p = ev.evaluate_pose_sets(
            grays, cams, poses_true, poses_pert
        )
        # plenty of seed-consistent corners despite differing seeds
        assert sum(rep_t.kept_corners) >= 100
        rms_t = float(np.sqrt(np.mean(np.square(rep_t.reproj_rms_px))))
        rms_p = float(np.sqrt(np.mean(np.square(rep_p.reproj_rms_px))))
        assert rms_t < 0.25, rms_t  # sub-quarter-pixel on clean renders
        assert rms_p > 2.0 * rms_t
        assert rep_t.triangulated_points >= 40
        assert rep_t.triangulation_rms_mm < 1.5, rep_t
        assert rep_p.triangulation_rms_mm > 2.0 * rep_t.triangulation_rms_mm

    def test_measurement_is_seed_independent(self):
        """Swapping the (A, B) hypothesis order must not change either
        report (the measurement may not favor the seed)."""
        cams, poses_true, grays = _synthetic_rig(2)
        rng = np.random.default_rng(11)
        poses_pert = [
            (rv + rng.normal(0, 0.0015, 3), tv + rng.normal(0, 10.0, 3))
            for rv, tv in poses_true
        ]
        a1, b1 = ev.evaluate_pose_sets(grays, cams, poses_true, poses_pert)
        b2, a2 = ev.evaluate_pose_sets(grays, cams, poses_pert, poses_true)
        np.testing.assert_allclose(a1.reproj_rms_px, a2.reproj_rms_px,
                                   rtol=1e-12)
        np.testing.assert_allclose(b1.reproj_rms_px, b2.reproj_rms_px,
                                   rtol=1e-12)
        assert a1.kept_corners == a2.kept_corners


ARTIFACT_DIR = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                            "auto_extrinsics")


class TestRealRigGeometry:
    """Default-CI lock on the auto-vs-manual ordering (VERDICT r2 item 2):
    the committed auto poses must beat the shipped manual calibration on
    the two optimizer-independent metrics.  (The slow gate in
    test_auto_extrinsics re-derives the auto poses from scratch.)"""

    @pytest.fixture(scope="class")
    def reports(self, data_dir):
        if not os.path.exists(os.path.join(ARTIFACT_DIR, "cam1_config.xml")):
            pytest.skip("auto-extrinsics artifacts not present")
        from vbr_tpu.pipelines import auto_extrinsics as ax
        from vbr_tpu.pipelines import reconstruction
        from vbr_tpu.utils import xmlio

        cams = reconstruction.load_rig(data_dir)
        poses_auto = []
        for i in range(4):
            _, _, rv, tv = xmlio.load_camera_config(
                ARTIFACT_DIR, filename=f"cam{i + 1}_config.xml"
            )
            poses_auto.append((np.ravel(rv), np.ravel(tv)))
        poses_ship = [(np.asarray(c.rvec).ravel(), np.asarray(c.tvec).ravel())
                      for c in cams]
        grays = [
            ax.temporal_mean_gray(
                os.path.join(data_dir, f"cam{i + 1}", "checkerboard.avi"),
                max_frames=16,
            )
            for i in range(4)
        ]
        return ev.evaluate_pose_sets(grays, cams, poses_auto, poses_ship)

    def test_auto_beats_manual_on_corner_reprojection(self, reports):
        rep_auto, rep_ship = reports
        rms_a = float(np.sqrt(np.mean(np.square(rep_auto.reproj_rms_px))))
        rms_s = float(np.sqrt(np.mean(np.square(rep_ship.reproj_rms_px))))
        assert sum(rep_auto.kept_corners) >= 100
        assert rms_a < rms_s, (rms_a, rms_s)
        assert rms_a < 1.4, rms_a  # measured 1.09 px (r3); manual is 1.79

    def test_auto_beats_manual_on_triangulation(self, reports):
        rep_auto, rep_ship = reports
        assert rep_auto.triangulated_points >= 40
        assert (rep_auto.triangulation_rms_mm
                < rep_ship.triangulation_rms_mm), reports
        # measured 7.2 mm (r3) vs manual 15.5 mm on the 115 mm lattice
        assert rep_auto.triangulation_rms_mm < 11.0, rep_auto
