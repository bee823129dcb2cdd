"""Camera calibration: Zhang intrinsics + LM bundle adjustment + PnP.

TPU/JAX-native replacement for OpenCV's C++ Levenberg-Marquardt solvers
used by the reference:
  * ``cv2.calibrateCameraExtended``  (camera_calibration.py:594-597)
  * ``cv2.solvePnP`` / ``solvePnPRansac`` (camera_calibration.py:734-736)
  * the leave-one-out frame discarding loop (camera_calibration.py:522-563)

Design: closed-form initialization (per-view normalized-DLT homographies →
Zhang's B-matrix intrinsics → per-view pose decomposition), then a joint
Levenberg-Marquardt refinement over [fx, fy, cx, cy, k1, k2, p1, p2, k3,
(rvec, tvec) per view] with Jacobians from ``jax.jacfwd`` — residuals are
batched over views with ``vmap``.  All solver math runs in float64 (JAX
x64 context): calibration precision targets the report's 0.2-0.5 px
regime (SURVEY.md §6).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from vbr_tpu.ops import camera as cam_ops


def chessboard_object_points(
    chessboard_shape: Tuple[int, int], square_size: float
) -> np.ndarray:
    """(cols·rows, 3) planar grid, X fastest — reference ordering
    (camera_calibration.py:582-583): np.indices((cols, rows)).T."""
    cols, rows = chessboard_shape
    xs, ys = np.meshgrid(np.arange(cols), np.arange(rows))
    pts = np.zeros((cols * rows, 3), dtype=np.float64)
    pts[:, 0] = xs.reshape(-1) * square_size
    pts[:, 1] = ys.reshape(-1) * square_size
    return pts


def _homographies(obj_xy: np.ndarray, image_points: Sequence[np.ndarray]):
    return [
        cam_ops.homography_dlt(obj_xy, np.asarray(ip, dtype=np.float64).reshape(-1, 2), xp=np)
        for ip in image_points
    ]


def zhang_intrinsic_init(
    homographies: Sequence[np.ndarray], image_shape: Tuple[int, int]
) -> np.ndarray:
    """Closed-form K from ≥3 homographies via Zhang's absolute-conic B.

    Solves V·b = 0 where each H contributes the two constraints
    v₁₂ᵀb = 0 and (v₁₁ − v₂₂)ᵀb = 0.  Falls back to a principal-point-
    centred single-focal estimate when B is not positive definite (few /
    degenerate views).
    """

    def v_ij(H, i, j):
        return np.array(
            [
                H[0, i] * H[0, j],
                H[0, i] * H[1, j] + H[1, i] * H[0, j],
                H[1, i] * H[1, j],
                H[2, i] * H[0, j] + H[0, i] * H[2, j],
                H[2, i] * H[1, j] + H[1, i] * H[2, j],
                H[2, i] * H[2, j],
            ]
        )

    V = []
    for H in homographies:
        V.append(v_ij(H, 0, 1))
        V.append(v_ij(H, 0, 0) - v_ij(H, 1, 1))
    V = np.asarray(V)
    _, _, vt = np.linalg.svd(V)
    b11, b12, b22, b13, b23, b33 = vt[-1]

    try:
        cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
        lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
        fx = np.sqrt(lam / b11)
        fy = np.sqrt(lam * b11 / (b11 * b22 - b12 * b12))
        cx = -b13 * fx * fx / lam
        if not (np.isfinite([fx, fy, cx, cy]).all() and fx > 0 and fy > 0):
            raise FloatingPointError
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    except (FloatingPointError, ZeroDivisionError, ValueError):
        H, W = image_shape
        f = 1.2 * max(H, W)
        return np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])


def pose_from_homography(H: np.ndarray, K: np.ndarray):
    """Planar pose init: K⁻¹H = [λr₁ λr₂ λt] → orthonormalized (rvec, tvec)."""
    M = np.linalg.solve(K, H)
    lam = 1.0 / np.linalg.norm(M[:, 0])
    if M[2, 2] * lam < 0:  # chessboard must be in front of the camera
        lam = -lam
    r1 = M[:, 0] * lam
    r2 = M[:, 1] * lam
    t = M[:, 2] * lam
    r3 = np.cross(r1, r2)
    R = np.stack([r1, r2, r3], axis=1)
    # project onto SO(3)
    u, _, vt = np.linalg.svd(R)
    R = u @ vt
    if np.linalg.det(R) < 0:
        R = u @ np.diag([1, 1, -1]) @ vt
    return cam_ops.rodrigues_inverse(R, xp=np), t


@dataclasses.dataclass
class CalibrationResult:
    """Mirror of cv2.calibrateCameraExtended's outputs
    (camera_calibration.py:594-597 consumption sites)."""

    rms: float
    K: np.ndarray
    dist: np.ndarray  # (5,)
    rvecs: List[np.ndarray]
    tvecs: List[np.ndarray]
    per_view_errors: np.ndarray  # (V,) RMS px per view
    intrinsic_std: np.ndarray  # (9,) stddev of [fx fy cx cy k1 k2 p1 p2 k3]


def _pack(K, dist, rvecs, tvecs):
    return np.concatenate(
        [
            [K[0, 0], K[1, 1], K[0, 2], K[1, 2]],
            np.asarray(dist).reshape(-1)[:5],
            np.concatenate([np.concatenate([r, t]) for r, t in zip(rvecs, tvecs)]),
        ]
    )


def _residual_fn(obj_pts, img_pts, num_views):
    """Build the jax residual function r(p) over all views (float64)."""
    import jax
    import jax.numpy as jnp

    # numpy float64 kept outside; converted under the x64 context at trace
    # time so the whole residual graph stays float64.
    obj_np = np.asarray(obj_pts, dtype=np.float64)
    imgs_np = np.asarray(img_pts, dtype=np.float64)  # (V, N, 2)

    def residuals(p):
        obj = jnp.asarray(obj_np)
        imgs = jnp.asarray(imgs_np)
        K = jnp.array(
            [[p[0], 0.0, p[2]], [0.0, p[1], p[3]], [0.0, 0.0, 1.0]]
        )
        dist = p[4:9]
        poses = p[9:].reshape(num_views, 6)

        def per_view(pose, obs):
            uv = cam_ops.project_points(obj, pose[:3], pose[3:], K, dist, xp=jnp)
            return (uv - obs).reshape(-1)

        return jax.vmap(per_view)(poses, imgs).reshape(-1)

    return residuals


def _levenberg_marquardt(residuals_fn, p0, max_iters=50, tol=1e-12):
    """Dense LM with jax.jacfwd Jacobians, float64 (runs on host/CPU)."""
    import jax
    import jax.numpy as jnp

    with jax.enable_x64(True):
        jac = jax.jit(jax.jacfwd(residuals_fn))
        res = jax.jit(residuals_fn)

        p = jnp.asarray(p0, dtype=jnp.float64)
        lam = 1e-3
        r = res(p)
        cost = float(r @ r)
        for _ in range(max_iters):
            J = jac(p)
            JtJ = J.T @ J
            g = J.T @ r
            improved = False
            for _ in range(10):
                A = JtJ + lam * jnp.diag(jnp.diag(JtJ))
                try:
                    delta = jnp.linalg.solve(A, -g)
                except Exception:
                    lam *= 10
                    continue
                p_new = p + delta
                r_new = res(p_new)
                cost_new = float(r_new @ r_new)
                if np.isfinite(cost_new) and cost_new < cost:
                    p, r = p_new, r_new
                    rel = (cost - cost_new) / max(cost, 1e-30)
                    cost = cost_new
                    lam = max(lam * 0.3, 1e-12)
                    improved = True
                    break
                lam *= 10
            if not improved or rel < tol:
                break
        J = jac(p)
        return np.asarray(p), np.asarray(r), np.asarray(J)


def calibrate_camera(
    image_points: Sequence[np.ndarray],
    image_shape: Tuple[int, int],
    chessboard_shape: Tuple[int, int] = (8, 6),
    square_size: float = 1.0,
) -> CalibrationResult:
    """Full intrinsic calibration (cv2.calibrateCameraExtended equivalent).

    image_points: per view (N, 2) detected corners (reference ordering).
    image_shape: (width, height) — matches the reference's usage where
    cv2 receives the (w, h) image size.
    """
    obj = chessboard_object_points(chessboard_shape, square_size)
    num_views = len(image_points)
    img_pts = np.stack(
        [np.asarray(ip, dtype=np.float64).reshape(-1, 2) for ip in image_points]
    )

    Hs = _homographies(obj[:, :2], image_points)
    K0 = zhang_intrinsic_init(Hs, image_shape)
    rvecs0, tvecs0 = [], []
    for H in Hs:
        r, t = pose_from_homography(H, K0)
        rvecs0.append(np.asarray(r))
        tvecs0.append(np.asarray(t))

    p0 = _pack(K0, np.zeros(5), rvecs0, tvecs0)
    res_fn = _residual_fn(obj, img_pts, num_views)
    p, r, J = _levenberg_marquardt(res_fn, p0)

    K = np.array([[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1.0]])
    dist = p[4:9]
    poses = p[9:].reshape(num_views, 6)
    n = obj.shape[0]
    r_views = r.reshape(num_views, n, 2)
    per_view = np.sqrt((r_views**2).sum(-1).mean(-1))
    rms = float(np.sqrt((r**2).mean()) * np.sqrt(2))  # cv2: per-point L2 RMS

    # stddevs from the pseudo-inverse of JᵀJ (cv2's Extended outputs)
    dof = max(r.size - p.size, 1)
    sigma2 = float(r @ r) / dof
    try:
        cov = sigma2 * np.linalg.pinv(J.T @ J)
        std = np.sqrt(np.clip(np.diag(cov)[:9], 0, None))
    except np.linalg.LinAlgError:
        std = np.full(9, np.nan)

    return CalibrationResult(
        rms=rms,
        K=K,
        dist=dist,
        rvecs=[poses[i, :3] for i in range(num_views)],
        tvecs=[poses[i, 3:] for i in range(num_views)],
        per_view_errors=per_view,
        intrinsic_std=std,
    )


def solve_pnp(
    object_points: np.ndarray,
    image_points: np.ndarray,
    K: np.ndarray,
    dist: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Planar-target pose (cv2.solvePnP equivalent for the chessboard).

    Undistorts observations, initializes from the plane homography, then
    LM-refines the 6-dof pose (intrinsics frozen).
    """
    obj = np.asarray(object_points, dtype=np.float64).reshape(-1, 3)
    img = np.asarray(image_points, dtype=np.float64).reshape(-1, 2)
    und = cam_ops.undistort_points(img, K, np.asarray(dist).reshape(-1), num_iters=20, xp=np)
    H = cam_ops.homography_dlt(obj[:, :2], und, xp=np)
    r0, t0 = pose_from_homography(H, np.eye(3))

    import jax.numpy as jnp

    K_np = np.asarray(K, dtype=np.float64)
    dist_np = np.asarray(dist, dtype=np.float64).reshape(-1)[:5]

    def residuals(p):
        uv = cam_ops.project_points(
            jnp.asarray(obj), p[:3], p[3:], jnp.asarray(K_np),
            jnp.asarray(dist_np), xp=jnp,
        )
        return (uv - jnp.asarray(img)).reshape(-1)

    p0 = np.concatenate([np.asarray(r0), np.asarray(t0)])
    p, _, _ = _levenberg_marquardt(residuals, p0, max_iters=50)
    return p[:3], p[3:]


def solve_pnp_ransac(
    object_points: np.ndarray,
    image_points: np.ndarray,
    K: np.ndarray,
    dist: np.ndarray,
    iterations: int = 100,
    reproj_threshold: float = 8.0,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RANSAC PnP: minimal 4-point homography hypotheses scored by
    reprojection inliers, final refinement on the inlier set.

    Returns (rvec, tvec, inlier_mask).
    """
    obj = np.asarray(object_points, dtype=np.float64).reshape(-1, 3)
    img = np.asarray(image_points, dtype=np.float64).reshape(-1, 2)
    n = obj.shape[0]
    rng = np.random.default_rng(seed)
    und = cam_ops.undistort_points(img, K, np.asarray(dist).reshape(-1), num_iters=20, xp=np)

    best_inliers = np.zeros(n, bool)
    for _ in range(iterations):
        idx = rng.choice(n, 4, replace=False)
        try:
            H = cam_ops.perspective_transform_4pt(obj[idx, :2], und[idx], xp=np)
            r, t = pose_from_homography(H, np.eye(3))
        except np.linalg.LinAlgError:
            continue
        uv = cam_ops.project_points(obj, r, t, K, np.asarray(dist).reshape(-1), xp=np)
        err = np.linalg.norm(uv - img, axis=1)
        inliers = err < reproj_threshold
        if inliers.sum() > best_inliers.sum():
            best_inliers = inliers
    if best_inliers.sum() < 4:
        best_inliers = np.ones(n, bool)
    rvec, tvec = solve_pnp(obj[best_inliers], img[best_inliers], K, dist)
    return rvec, tvec, best_inliers


def discard_bad_image_points(
    image_points: Sequence[np.ndarray],
    image_shape: Tuple[int, int],
    chessboard_shape: Tuple[int, int],
    square_size: float = 1.0,
    discard_threshold: float = 0.15,
):
    """Leave-one-out frame discarding (camera_calibration.py:522-563):
    recalibrate without each view; discard it if the RMS improves by at
    least ``discard_threshold``.

    Returns (kept_points, kept_idx, discarded_points, discarded_idx).
    """
    baseline = calibrate_camera(
        image_points, image_shape, chessboard_shape, square_size
    ).rms
    kept, kept_idx, discarded, discarded_idx = [], [], [], []
    for i in range(len(image_points)):
        subset = [p for j, p in enumerate(image_points) if j != i]
        rms = calibrate_camera(subset, image_shape, chessboard_shape, square_size).rms
        if baseline - rms >= discard_threshold:
            discarded.append(image_points[i])
            discarded_idx.append(i)
        else:
            kept.append(image_points[i])
            kept_idx.append(i)
    return kept, kept_idx, discarded, discarded_idx
