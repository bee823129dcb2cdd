"""Adjudicate cam-2's principal point with a statistically grounded
estimator (VERDICT r4 #4).

Background: the shipped config.xml says cam2 cx=328.6; the photometric
run says 353.0 (24 px apart).  Per-view eval RMS is almost blind to cx
(pose re-solve compensates at the board plane — r4 sweep), and r5
measured that hull-silhouette coverage is blind too (board and subject
share depth in this rig; scripts/eval_pp_hull.py).  What remains is the
SECOND-ORDER signal: across many board views at varying tilt/position,
the eval-RMS-vs-dcx curve is convex with its minimum at the true cx
(the r4 synthetic sweep shows exactly this).  The minimum is shallow
(~0.001 px per px² near the optimum), far below the per-view noise —
but the sweep is PAIRED (same views, same corners at every offset), so
view-level noise cancels in the curve shape.  This script:

  1. validates the estimator on the synthetic truth-known fixture:
     fine paired sweep → quadratic argmin → bootstrap-over-views CI;
     the CI must cover the truth and be a few px wide;
  2. runs the same estimator on the real cam-2 corners (the same
     cv2-detected corners as the r4 report's eval, which neither
     candidate calibration consumed), for cx AND cy;
  3. reports the data-optimal principal point ± CI against both
     candidates — the adjudication the parity table cites.

Writes artifacts/pp_eval/adjudication.json.
Usage: python scripts/eval_pp_adjudicate.py [cam]   (CPU, ~minutes)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

DATA = "/root/reference/data"
OUT_DIR = os.path.join("artifacts", "pp_eval")
PATTERN = (8, 6)
SQUARE = 115.0
# fine paired sweeps: the synthetic validation brackets its -10 px truth
# symmetrically; the real sweep brackets BOTH candidates (0 and +24.4)
SYN_OFFSETS = np.arange(-24.0, 24.1, 4.0)
REAL_OFFSETS = np.arange(-16.0, 40.1, 4.0)
N_BOOT = 200


def _per_view_rms(K, dist, corner_views):
    """Per-view eval RMS (pose re-solved; both board orientations)."""
    from vbr_tpu.ops import camera as cam_ops
    from vbr_tpu.pipelines import calibration as CAL

    obj = CAL.chessboard_object_points(PATTERN, SQUARE)
    objs = (obj, obj[::-1].copy())
    out = []
    for c in corner_views:
        best = np.nan
        for o in objs:
            try:
                r, t = CAL.solve_pnp(o, c, K, dist)
                uv = cam_ops.project_points(o, r, t, K, dist, xp=np)
                e = float(np.sqrt(((uv - c) ** 2).sum(-1).mean()))
                best = e if np.isnan(best) else min(best, e)
            except Exception:
                pass
        out.append(best)
    return np.asarray(out)


def sweep_matrix(K0, dist, corner_views, axis, offsets):
    """(n_views, n_offsets) per-view RMS for principal-point offsets
    along ``axis`` (0 = cx, 1 = cy) — the paired sweep."""
    cols = []
    for d in offsets:
        K = np.asarray(K0, np.float64).copy()
        K[axis, 2] += d
        cols.append(_per_view_rms(K, dist, corner_views))
    M = np.stack(cols, axis=1)
    return M[~np.isnan(M).any(axis=1)]  # drop views any offset failed


def quad_argmin(offsets, means):
    """Vertex of a LOCAL parabola through the 5 sweep points around the
    discrete minimum (a global fit over a wide window is biased by the
    curve's higher-order terms; the local fit is the standard
    sub-sample minimum estimator).  Clipped to the sweep range."""
    i = int(np.argmin(means))
    lo = max(0, min(i - 2, len(offsets) - 5))
    x, y = offsets[lo:lo + 5], means[lo:lo + 5]
    A = np.stack([x**2, x, np.ones_like(x)], 1)
    a, b, _ = np.linalg.lstsq(A, y, rcond=None)[0]
    if a <= 0:
        return float(offsets[i])
    return float(np.clip(-b / (2 * a), offsets[0], offsets[-1]))


def estimate(M, offsets, seed=0):
    """(argmin, lo95, hi95) of the paired curve via view bootstrap."""
    n = M.shape[0]
    est = quad_argmin(offsets, M.mean(axis=0))
    rng = np.random.default_rng(seed)
    boots = [
        quad_argmin(offsets, M[rng.integers(0, n, n)].mean(axis=0))
        for _ in range(N_BOOT)
    ]
    lo, hi = np.percentile(boots, [2.5, 97.5])
    return est, float(lo), float(hi)


def synthetic_validation():
    import cv2

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    import test_photometric_calibration as fix

    views = []
    term = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_MAX_ITER, 30, 0.001)
    for rv, tv in fix._poses():
        frame = fix.render_board(fix.K_TRUE, fix.DIST_TRUE, rv, tv, ss=3)
        g = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        ret, c = cv2.findChessboardCorners(g, fix.PATTERN)
        if ret:
            c = cv2.cornerSubPix(
                g, c.astype(np.float32), (5, 5), (-1, -1), term
            ).reshape(-1, 2).astype(np.float64)
            views.append(c)
    # start the sweep from a WRONG cx (+10) — the estimator must point
    # back at truth: argmin ≈ -10 relative to the start
    K0 = fix.K_TRUE.copy()
    K0[0, 2] += 10.0
    M = sweep_matrix(K0, fix.DIST_TRUE, views, axis=0,
                     offsets=SYN_OFFSETS)
    est, lo, hi = estimate(M, SYN_OFFSETS)
    return {
        "views": int(M.shape[0]),
        "true_offset": -10.0,
        "argmin": round(est, 2),
        "ci95": [round(lo, 2), round(hi, 2)],
        "recovers_truth": bool(lo <= -10.0 <= hi),
        "mean_curve": [round(float(x), 4) for x in M.mean(axis=0)],
    }


def real_adjudication(cam=2):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ria", os.path.join(os.path.dirname(__file__),
                            "run_intrinsics_artifact.py"))
    ria = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ria)

    from vbr_tpu.utils import xmlio

    views = ria.cv2_corner_views(f"{DATA}/cam{cam}/intrinsics_imagepoints.mp4")
    K_sh, d_sh, _, _ = xmlio.load_camera_config(f"{DATA}/cam{cam}")
    K_sh = np.asarray(K_sh, np.float64)
    d_sh = np.ravel(d_sh)[:5]
    K_ph, _, _, _ = xmlio.load_camera_config(
        os.path.join("artifacts", "intrinsics_run", f"cam{cam}"))
    K_ph = np.asarray(K_ph, np.float64)

    out = {"cam": cam, "shipped": {"cx": K_sh[0, 2], "cy": K_sh[1, 2]},
           "photometric": {"cx": K_ph[0, 2], "cy": K_ph[1, 2]}}
    for axis, name in ((0, "cx"), (1, "cy")):
        M = sweep_matrix(K_sh, d_sh, views, axis, REAL_OFFSETS)
        est, lo, hi = estimate(M, REAL_OFFSETS)
        opt = K_sh[axis, 2] + est
        out[name] = {
            "views": int(M.shape[0]),
            "optimum": round(opt, 2),
            "ci95": [round(K_sh[axis, 2] + lo, 2),
                     round(K_sh[axis, 2] + hi, 2)],
            "shipped_in_ci": bool(
                K_sh[axis, 2] + lo <= K_sh[axis, 2] <= K_sh[axis, 2] + hi),
            "photometric_in_ci": bool(
                K_sh[axis, 2] + lo <= K_ph[axis, 2] <= K_sh[axis, 2] + hi),
            "mean_curve": [round(float(x), 4) for x in M.mean(axis=0)],
        }
        print(json.dumps({name: out[name]}))
        sys.stdout.flush()
    return out


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    cam = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    results = {"syn_offsets": [float(d) for d in SYN_OFFSETS],
               "real_offsets": [float(d) for d in REAL_OFFSETS]}
    results["synthetic_validation"] = synthetic_validation()
    print(json.dumps({"synthetic_validation":
                      results["synthetic_validation"]}))
    sys.stdout.flush()
    results["real"] = real_adjudication(cam)
    with open(os.path.join(OUT_DIR, "adjudication.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {OUT_DIR}/adjudication.json")


if __name__ == "__main__":
    main()
