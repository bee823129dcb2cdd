"""Geometric evaluation of extrinsic poses — metrics the optimizer never saw.

The auto-extrinsics refinement (``pipelines/auto_extrinsics.py`` stage 6)
minimizes photometric MSE, so "lower photometric MSE than the shipped
manual calibration" is partly self-graded (VERDICT r2).  This module
scores any two pose sets on *independent* geometry:

  (a) **Corner reprojection** — the 48 inner saddle corners are measured
      directly from the temporal-mean checkerboard image by sub-pixel
      saddle refinement (``ops/corners.corner_subpix``, the cv2-exact
      gradient-weighted fit).  To keep the measurement independent of
      either pose hypothesis, refinement is seeded from BOTH hypotheses'
      predictions; only corners where the two seeds converge to the same
      saddle (< ``seed_tol`` px apart) count, and the measured position
      is their mean.  RMS(projected(pose) − measured) in px, comparable
      to the reference report's 0.20-0.53 px intrinsic band (BASELINE.md).
  (b) **Cross-camera triangulation** — all cameras watch the SAME board
      (the world frame is the board frame), so each measured corner,
      triangulated from every camera's undistorted ray, must land on the
      known 115 mm lattice.  RMS 3D error in mm.  Wrong poses bend the
      rays apart; the measurement (saddle corners) never entered the
      photometric objective.
  (c) **Carve A/B** — visual hull from the shipped silhouette goldens
      under each pose set; silhouette consistency = fraction of each
      silhouette covered by the back-projected hull (misaligned poses
      collapse the intersection).  Plus the A-vs-B hull voxel IoU as a
      descriptive delta.

Reference context: the reference validates extrinsics only by eyeballing
an AR cube overlay (``camera_calibration.py:824-864``) and ships manual
4-corner-click poses (``camera_calibration.py:299-393,954-974``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.ops import corners as corner_ops
from vbr_tpu.pipelines.auto_extrinsics import _PATTERN, _undist_px
from vbr_tpu.utils.config import CameraParams, GridConfig


def board_object_points(square_mm: float = 115.0, pattern=_PATTERN):
    """(N, 3) world-frame inner-corner lattice (same convention as the
    shipped config.xml poses and ``auto_extrinsics``)."""
    cols, rows = pattern
    return np.array(
        [[x * square_mm, y * square_mm, 0.0]
         for y in range(rows) for x in range(cols)],
        np.float64,
    )


def predicted_corners(cp: CameraParams, rvec, tvec,
                      square_mm: float = 115.0, pattern=_PATTERN):
    """Project the board lattice under (rvec, tvec) → (N, 2) pixels."""
    obj = board_object_points(square_mm, pattern)
    return cam_ops.project_points(
        obj, np.asarray(rvec).ravel(), np.asarray(tvec).ravel(),
        np.asarray(cp.K), np.asarray(cp.dist), xp=np,
    )


def measure_saddle_corners(
    gray: np.ndarray,
    seeds_a: np.ndarray,
    seeds_b: np.ndarray,
    win: int = 3,
    seed_tol: float = 0.35,
) -> Tuple[np.ndarray, np.ndarray]:
    """Seed-independent saddle-corner measurement.

    Refines from both hypotheses' predicted corners; a corner is *kept*
    iff both runs converge to the same saddle (< seed_tol px apart), so
    the kept measurement cannot favor either seed.  Returns
    (measured (N, 2), kept (N,) bool); measured rows for dropped corners
    are the seed mean (do not use them).
    """
    import jax.numpy as jnp

    g = jnp.asarray(np.asarray(gray, np.float32))
    ra = np.asarray(corner_ops.corner_subpix(
        g, jnp.asarray(seeds_a, np.float32), (win, win)))
    rb = np.asarray(corner_ops.corner_subpix(
        g, jnp.asarray(seeds_b, np.float32), (win, win)))
    d = np.linalg.norm(ra - rb, axis=1)
    H, W = np.asarray(gray).shape[:2]
    inside = (
        (ra[:, 0] > win) & (ra[:, 0] < W - win - 1)
        & (ra[:, 1] > win) & (ra[:, 1] < H - win - 1)
    )
    # reject refinements that ran away from both seeds (flat texture)
    near = (
        (np.linalg.norm(ra - seeds_a, axis=1) < 2.5 * win)
        & (np.linalg.norm(rb - seeds_b, axis=1) < 2.5 * win)
    )
    kept = (d < seed_tol) & inside & near
    return (ra + rb) / 2.0, kept


def reprojection_rms(predicted: np.ndarray, measured: np.ndarray,
                     kept: np.ndarray) -> float:
    """RMS px distance over kept corners."""
    if not kept.any():
        return float("nan")
    d = np.linalg.norm(predicted[kept] - measured[kept], axis=1)
    return float(np.sqrt(np.mean(d ** 2)))


def _camera_rays(measured: np.ndarray, cp: CameraParams, rvec, tvec):
    """Back-project measured pixels → (origin (3,), dirs (N, 3)) world."""
    K = np.asarray(cp.K)
    dist = np.asarray(cp.dist)
    und = _undist_px(measured, K, dist)  # ideal pixel coords
    xn = (und[:, 0] - K[0, 2]) / K[0, 0]
    yn = (und[:, 1] - K[1, 2]) / K[1, 1]
    d_cam = np.stack([xn, yn, np.ones_like(xn)], -1)
    R = cam_ops.rodrigues(np.asarray(rvec).ravel(), xp=np)
    origin = -R.T @ np.asarray(tvec, np.float64).ravel()
    dirs = d_cam @ R  # R.T applied row-wise
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return origin, dirs


def triangulate_rays(origins: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Least-squares point minimizing Σ dist²(X, ray_i) (closed form)."""
    eye = np.eye(3)
    A = np.zeros((3, 3))
    b = np.zeros(3)
    for o, d in zip(origins, dirs):
        P = eye - np.outer(d, d)
        A += P
        b += P @ o
    return np.linalg.solve(A, b)


@dataclasses.dataclass
class GeometricReport:
    """Per-pose-set geometric metrics (one report per hypothesis)."""

    reproj_rms_px: List[float]  # per camera
    kept_corners: List[int]  # per camera (seed-consistent saddles)
    triangulation_rms_mm: float
    triangulated_points: int


def evaluate_pose_sets(
    grays: Sequence[np.ndarray],
    cams: Sequence[CameraParams],
    poses_a: Sequence[Tuple[np.ndarray, np.ndarray]],
    poses_b: Sequence[Tuple[np.ndarray, np.ndarray]],
    square_mm: float = 115.0,
    pattern=_PATTERN,
    win: int = 3,
) -> Tuple[GeometricReport, GeometricReport]:
    """Score two pose hypotheses (A = e.g. auto, B = e.g. shipped) on the
    same seed-independent corner measurements.  Returns (report_a,
    report_b)."""
    C = len(cams)
    obj = board_object_points(square_mm, pattern)
    measured, kept = [], []
    pred_a, pred_b = [], []
    for ci in range(C):
        pa = predicted_corners(cams[ci], *poses_a[ci], square_mm, pattern)
        pb = predicted_corners(cams[ci], *poses_b[ci], square_mm, pattern)
        m, k = measure_saddle_corners(grays[ci], pa, pb, win=win)
        measured.append(m)
        kept.append(k)
        pred_a.append(pa)
        pred_b.append(pb)

    def build(preds, poses) -> GeometricReport:
        rms = [reprojection_rms(preds[ci], measured[ci], kept[ci])
               for ci in range(C)]
        rays = [
            _camera_rays(measured[ci], cams[ci], *poses[ci])
            for ci in range(C)
        ]
        errs = []
        for n in range(len(obj)):
            use = [ci for ci in range(C) if kept[ci][n]]
            if len(use) < 2:
                continue
            X = triangulate_rays(
                np.stack([rays[ci][0] for ci in use]),
                np.stack([rays[ci][1][n] for ci in use]),
            )
            errs.append(np.linalg.norm(X - obj[n]))
        tri = float(np.sqrt(np.mean(np.square(errs)))) if errs else float("nan")
        return GeometricReport(
            reproj_rms_px=rms,
            kept_corners=[int(k.sum()) for k in kept],
            triangulation_rms_mm=tri,
            triangulated_points=len(errs),
        )

    return build(pred_a, poses_a), build(pred_b, poses_b)


@dataclasses.dataclass
class CarveABReport:
    """Silhouette-consistency A/B of two pose sets."""

    coverage_a: List[float]  # per camera: |proj(hull_a) ∩ sil| / |sil|
    coverage_b: List[float]
    voxels_a: int
    voxels_b: int
    hull_iou_ab: float


def hull_coverage(
    masks: np.ndarray,  # (C, H, W) u8 silhouettes
    cset: Sequence[CameraParams],  # full candidate calibration (K+pose)
    grid: Optional[GridConfig] = None,
):
    """Carve the hull under a candidate calibration; per-camera coverage
    ``|proj(hull) ∩ sil| / |sil|`` of each input silhouette.

    This is the principal-point-SENSITIVE geometric metric (r5, VERDICT
    r4 #4): a cx error in one camera drags its silhouette cone sideways.
    Board-solved poses can compensate the shift exactly only at the
    board's depth plane — the carved subject stands at a different
    depth, so the cone misses the other cameras' cones there and
    coverage drops at FIRST order in dcx (unlike per-view reprojection
    RMS with re-solved poses, which is provably blind to it — see
    artifacts/intrinsics_run/report.md sensitivity sweep).

    Returns ``(occ (N,) bool, coverages per camera)``.
    """
    import jax.numpy as jnp

    from vbr_tpu.ops import carve

    grid = grid or GridConfig(nx=64, ny=64, nz=64)
    H, W = masks.shape[1:3]
    m_dev = jnp.asarray(masks)
    imgs = jnp.zeros((len(cset), H, W, 3), jnp.uint8)
    tabs = carve.build_projection_tables(cset, grid, (H, W))
    occ, _ = carve.carve_from_tables(
        m_dev, imgs, tabs.valid, tabs.lin_idx,
        views_threshold=len(cset),
    )
    occ = np.asarray(occ)
    lin = np.asarray(tabs.lin_idx)
    val = np.asarray(tabs.valid)
    covs = []
    for ci in range(len(cset)):
        pix = np.zeros(H * W, bool)
        sel = occ & val[ci]
        pix[lin[ci][sel]] = True
        sil = masks[ci].reshape(-1) > 0
        covs.append(float((pix & sil).sum() / max(sil.sum(), 1)))
    return occ, covs


def carve_silhouette_ab(
    masks: np.ndarray,  # (C, H, W) u8 silhouettes (shipped goldens)
    cams: Sequence[CameraParams],
    poses_a: Sequence[Tuple[np.ndarray, np.ndarray]],
    poses_b: Sequence[Tuple[np.ndarray, np.ndarray]],
    grid: Optional[GridConfig] = None,
) -> CarveABReport:
    """Carve the hull under each pose set; measure how much of every
    input silhouette the back-projected hull explains.  Misaligned poses
    shrink the cone intersection, so coverage drops."""

    def cset_for(poses):
        return [
            dataclasses.replace(
                cams[ci],
                rvec_xyz=tuple(np.asarray(poses[ci][0], float).ravel()),
                tvec_xyz=tuple(np.asarray(poses[ci][1], float).ravel()),
            )
            for ci in range(len(cams))
        ]

    occ_a, cov_a = hull_coverage(masks, cset_for(poses_a), grid)
    occ_b, cov_b = hull_coverage(masks, cset_for(poses_b), grid)
    inter = (occ_a & occ_b).sum()
    union = (occ_a | occ_b).sum()
    return CarveABReport(
        coverage_a=cov_a,
        coverage_b=cov_b,
        voxels_a=int(occ_a.sum()),
        voxels_b=int(occ_b.sum()),
        hull_iou_ab=float(inter / max(union, 1)),
    )
