"""Tests for the detector-free photometric intrinsic calibration.

Fixture: boards rendered through the FULL camera model (5-term
distortion) with a hard supersampled checker — deliberately NOT the
optimizer's blurred-separable image model, so recovery demonstrates
robustness to model mismatch.  Reference flow being replaced:
camera_calibration.py:419-517 (findChessboardCorners loop) + :594-597
(calibrateCameraExtended).
"""
import numpy as np
import pytest

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.pipelines import photometric_calibration as PC

PATTERN = (8, 6)
SQUARE = 30.0  # mm
IMG_W, IMG_H = 320, 240

K_TRUE = np.array([[230.0, 0, 162.0], [0, 228.0, 118.0], [0, 0, 1.0]])
DIST_TRUE = np.array([-0.28, 0.10, 0.001, -0.001, 0.0])


def _poses():
    """Six varied board poses (rvec, tvec), board well inside the image."""
    nu, nv = PATTERN[0] + 1, PATTERN[1] + 1
    cx_mm, cy_mm = (nu / 2 - 1) * SQUARE, (nv / 2 - 1) * SQUARE
    out = []
    for i, (ax, ay, dz) in enumerate([
        (0.00, 0.00, 470), (0.28, 0.08, 490), (-0.25, 0.12, 510),
        (0.08, -0.28, 480), (-0.12, -0.20, 520), (0.22, 0.26, 540),
    ]):
        rv = np.array([ax, ay, 0.15 * (i % 3 - 1)])
        R = np.asarray(cam_ops.rodrigues(rv, xp=np))
        # keep the board center in front of the camera center
        center_obj = np.array([cx_mm, cy_mm, 0.0])
        tv = np.array([0.0, 0.0, float(dz)]) - R @ center_obj
        out.append((rv, tv))
    return out


def render_board(K, dist, rvec, tvec, ss: int = 3, size=None) -> np.ndarray:
    """Render the board as a BGR frame via per-pixel inverse mapping."""
    W, H = size if size is not None else (IMG_W, IMG_H)
    nu, nv = PATTERN[0] + 1, PATTERN[1] + 1
    ys, xs = np.mgrid[0:H, 0:W]
    offs = (np.arange(ss) + 0.5) / ss - 0.5
    acc = np.zeros((H, W), np.float64)
    R = np.asarray(cam_ops.rodrigues(np.asarray(rvec), xp=np))
    t = np.asarray(tvec, np.float64)
    Rt_t = R.T @ t
    for oy in offs:
        for ox in offs:
            pix = np.stack([(xs + ox).ravel(), (ys + oy).ravel()],
                           -1).astype(np.float64)
            nrm = np.asarray(cam_ops.undistort_points(
                pix, K, dist, num_iters=25, xp=np))
            d = np.concatenate([nrm, np.ones((len(nrm), 1))], -1)
            rd = d @ R  # rows = R^T d
            lam = Rt_t[2] / rd[:, 2]
            Xb = lam[:, None] * rd - Rt_t[None, :]
            u = Xb[:, 0] / SQUARE + 1.0
            v = Xb[:, 1] / SQUARE + 1.0
            inside = (u >= 0) & (u < nu) & (v >= 0) & (v < nv)
            margin = ((u >= -0.7) & (u < nu + 0.7)
                      & (v >= -0.7) & (v < nv + 0.7))
            black = (np.floor(u).astype(int) + np.floor(v).astype(int)) \
                % 2 == 0
            val = np.where(inside & black, 25.0,
                           np.where(margin, 235.0, 90.0))
            acc += val.reshape(H, W)
    g = (acc / ss / ss).astype(np.uint8)
    return np.stack([g, g, g], -1)


@pytest.fixture(scope="module")
def frames():
    return [render_board(K_TRUE, DIST_TRUE, rv, tv)
            for rv, tv in _poses()]


def test_adaptive_dark_blobs_find_squares(frames):
    g = frames[0][..., 0].astype(np.float32)
    cents = PC.adaptive_dark_blobs(g, area_range=(40, 6000))
    # 32 black squares must be among the blobs (spurious background blobs
    # are allowed — the lattice growth rejects them)
    assert len(cents) >= 28
    xi = np.clip(cents[:, 0].round().astype(int), 0, IMG_W - 1)
    yi = np.clip(cents[:, 1].round().astype(int), 0, IMG_H - 1)
    assert (g[yi, xi] < 80).sum() >= 28


def test_grow_black_lattice_recovers_corners(frames):
    for f in frames[:3]:
        g = f[..., 0].astype(np.float32)
        cents = PC.adaptive_dark_blobs(g, area_range=(40, 6000))
        got = PC.grow_black_lattice(cents, PATTERN)
        assert got is not None
        H, nm = got
        assert nm >= 24


def test_board_view_from_frame(frames):
    v = PC.board_view_from_frame(frames[0], 7, PATTERN, deoverlay=False)
    assert v is not None and v.frame_idx == 7
    # H-predicted corners should be within a few px of the true projected
    # corners (H ignores distortion; the board is mid-frame so the local
    # error is bounded)
    obj = np.array([[(x - 1) * SQUARE, (y - 1) * SQUARE, 0.0]
                    for y in range(1, PATTERN[1] + 1)
                    for x in range(1, PATTERN[0] + 1)])
    rv, tv = _poses()[0]
    uv = cam_ops.project_points(obj, rv, tv, K_TRUE, DIST_TRUE, xp=np)
    d = np.linalg.norm(v.corners[:, None] - uv[None], axis=-1).min(1)
    assert d.mean() < 3.0


def test_suppress_overlay_small_disc(frames):
    f = frames[0].copy()
    g0 = f[..., 0].astype(np.float32)
    # saturated magenta disc, radius 3, on a white area
    yy, xx = np.mgrid[0:IMG_H, 0:IMG_W]
    disc = (yy - 40) ** 2 + (xx - 40) ** 2 <= 9
    f[disc] = (255, 0, 255)
    filled, mask = PC.suppress_overlay(f)
    assert mask[40, 40] and not mask[100, 200]
    assert abs(float(filled[40, 40]) - float(g0[40, 40])) < 25.0
    # untouched pixels are exactly the BT.601 luma
    assert abs(float(filled[5, 5]) - float(g0[5, 5])) < 1.0


def _radial_curve_err_px(dist, rmax: float, f: float = 230.0) -> float:
    """Max pixel displacement error of the fitted radial-distortion curve
    vs truth over the radius range the board actually covered.  Raw k1/k2/
    k3 are individually non-identifiable from bounded-radius data (the
    terms are strongly correlated over r<=rmax); the curve is the
    metrologically meaningful object."""
    r = np.linspace(0.0, rmax, 200)
    r2 = r * r

    def rad(d):
        return d[0] * r2 + d[1] * r2 ** 2 + d[4] * r2 ** 3

    return float(np.abs((rad(dist) - rad(DIST_TRUE)) * r * f).max())


def test_calibrate_video_photometric_end_to_end(frames, tmp_path):
    """The video entry point (collection → warm start → staged refine)
    on an encoded clip of the rendered boards; few iters — this locks the
    plumbing (decode, view collection, init packing), not convergence."""
    from vbr_tpu import native

    path = str(tmp_path / "boards.mp4")
    sink = native.VideoSink(path, 10.0, IMG_W, IMG_H)
    for f in frames:
        sink.write(f)
    sink.close()

    res, views = PC.calibrate_video_photometric(
        path, pattern=PATTERN, square_mm=SQUARE, iters=60, chunk=30,
        deoverlay=False, samples_per_square=8)
    assert len(views) >= 5
    assert res.rvecs.shape == (len(views), 3)
    assert res.loss_curve.shape == (60,)
    # mp4 compression degrades the H-predicted corners, so the warm
    # start is several percent off and 60 iters cannot correct it —
    # convergence is locked by the uncompressed test below; this bound
    # only catches a broken video/collection path
    assert abs(res.K[0, 0] - K_TRUE[0, 0]) / K_TRUE[0, 0] < 0.10
    assert abs(res.K[1, 2] - K_TRUE[1, 2]) < 12.0


def test_photometric_calibrate_recovers_intrinsics(frames):
    views = [PC.board_view_from_frame(f, i, PATTERN, deoverlay=False)
             for i, f in enumerate(frames)]
    views = [v for v in views if v is not None]
    assert len(views) >= 5
    from vbr_tpu.pipelines import calibration as CAL
    init = CAL.calibrate_camera([v.corners for v in views],
                                (IMG_W, IMG_H), PATTERN, SQUARE)
    res = PC.photometric_calibrate(
        views, (IMG_W, IMG_H), pattern=PATTERN, square_mm=SQUARE,
        iters=0, chunk=500, samples_per_square=10,
        init=(init.K, np.asarray(init.dist).reshape(-1)[:5].copy(),
              list(zip(init.rvecs, init.tvecs))),
        stages=[(400, "nuisance"), (1600, "all")])
    assert abs(res.K[0, 0] - K_TRUE[0, 0]) / K_TRUE[0, 0] < 0.01
    assert abs(res.K[1, 1] - K_TRUE[1, 1]) / K_TRUE[1, 1] < 0.01
    assert abs(res.K[0, 2] - K_TRUE[0, 2]) < 2.5
    assert abs(res.K[1, 2] - K_TRUE[1, 2]) < 2.5
    # distortion: the H-predicted warm-start corners carry no usable
    # distortion signal (corner-LM curve error ~4 px); the photometric
    # stage reads it from the square-edge curvature itself.  r <= 0.4
    # is the normalized radius range the rendered boards cover.
    err_photo = _radial_curve_err_px(res.dist, rmax=0.4)
    err_init = _radial_curve_err_px(
        np.asarray(init.dist).reshape(-1)[:5], rmax=0.4)
    assert err_photo < 0.8
    assert err_photo < 0.25 * err_init


def test_photometric_calibrate_fix_pp_pins_principal_point(frames):
    """fix_pp pins cx/cy exactly (r5: the principal point is the fit's
    weakest-determined direction — scripts/eval_pp_adjudicate.py — so
    production runs can pin it to an independently estimated optimum)."""
    views = [PC.board_view_from_frame(f, i, PATTERN, deoverlay=False)
             for i, f in enumerate(frames)]
    views = [v for v in views if v is not None]
    from vbr_tpu.pipelines import calibration as CAL
    init = CAL.calibrate_camera([v.corners for v in views],
                                (IMG_W, IMG_H), PATTERN, SQUARE)
    pin = (K_TRUE[0, 2] + 3.0, K_TRUE[1, 2] - 2.0)
    res = PC.photometric_calibrate(
        views, (IMG_W, IMG_H), pattern=PATTERN, square_mm=SQUARE,
        iters=0, chunk=100, samples_per_square=8,
        fix_pp=pin,
        init=(init.K, np.asarray(init.dist).reshape(-1)[:5].copy(),
              list(zip(init.rvecs, init.tvecs))),
        stages=[(100, "nuisance"), (200, "all")])
    assert res.K[0, 2] == pytest.approx(pin[0], abs=1e-6)
    assert res.K[1, 2] == pytest.approx(pin[1], abs=1e-6)
    # focal lengths still moved toward truth (the fit itself ran)
    assert abs(res.K[0, 0] - K_TRUE[0, 0]) / K_TRUE[0, 0] < 0.05
