"""Principal-point sensitivity of the intrinsics eval metric.

VERDICT r3 weak #6: the photometric run's cam2 cx drifts 24 px from the
shipped calibration while the eval RMS (reprojection on cv2 corners with
the pose RE-SOLVED per view) barely moves — suggesting the metric is
weakly sensitive to principal-point error.  This script quantifies that
directly, in two regimes:

  1. synthetic with known truth: boards rendered through the full camera
     model (same fixture as tests/test_photometric_calibration.py), cv2
     corners detected on the renders, eval RMS swept over cx offsets —
     the curve's flatness around truth IS the metric's sensitivity;
  2. real footage (cam2): the shipped config.xml intrinsics with cx
     swept, eval on the same cv2 corners the report uses.

Why the metric is flat (the geometry): for a planar board viewed at
distance Z, a principal-point shift Δcx is compensated almost exactly by
the re-solved pose translating the board by Δcx·Z/fx — the residual is
only the second-order perspective/distortion mismatch across the board's
extent.  Pose re-solving is still the RIGHT eval design (it scores
intrinsics, not memorized poses); it just means cx/cy agreement must be
read from the parameter table, not inferred from eval RMS.  Appends the
measured table to artifacts/intrinsics_run/report.md.

Usage: python scripts/eval_pp_sensitivity.py [--write-report]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

DATA = "/root/reference/data"
OUT = "artifacts/intrinsics_run/report.md"
PATTERN = (8, 6)
SQUARE = 115.0
OFFSETS = (-32.0, -24.0, -16.0, -8.0, 0.0, 8.0, 16.0, 24.0, 32.0)


def _eval_reproj(K, dist, corner_views, pattern, square):
    from vbr_tpu.ops import camera as cam_ops
    from vbr_tpu.pipelines import calibration as CAL

    obj = CAL.chessboard_object_points(pattern, square)
    objs = (obj, obj[::-1].copy())
    errs = []
    for c in corner_views:
        best = None
        for o in objs:
            try:
                r, t = CAL.solve_pnp(o, c, K, dist)
                uv = cam_ops.project_points(o, r, t, K, dist, xp=np)
                e = float(np.sqrt(((uv - c) ** 2).sum(-1).mean()))
                best = e if best is None else min(best, e)
            except Exception:
                pass
        if best is not None:
            errs.append(best)
    if not errs:  # solve_pnp failed on every view at this offset
        return float("nan")
    return float(np.mean(errs))


def synthetic_sweep():
    """Known-truth regime: render, detect, sweep cx around K_TRUE."""
    import cv2

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    import test_photometric_calibration as fix

    corner_views = []
    term = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_MAX_ITER, 30, 0.001)
    for rv, tv in fix._poses():
        frame = fix.render_board(fix.K_TRUE, fix.DIST_TRUE, rv, tv, ss=3)
        g = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        ret, c = cv2.findChessboardCorners(g, fix.PATTERN)
        if ret:
            c = cv2.cornerSubPix(
                g, c.astype(np.float32), (5, 5), (-1, -1), term
            ).reshape(-1, 2).astype(np.float64)
            corner_views.append(c)
    rows = []
    for d in OFFSETS:
        K = fix.K_TRUE.copy()
        K[0, 2] += d
        rms = _eval_reproj(K, fix.DIST_TRUE, corner_views,
                           fix.PATTERN, fix.SQUARE)
        rows.append((d, rms))
    return rows, len(corner_views)


def real_sweep(cam=2):
    """Real-footage regime: shipped intrinsics, cv2 corners, cx sweep."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ria", os.path.join(os.path.dirname(__file__),
                            "run_intrinsics_artifact.py"))
    ria = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ria)

    from vbr_tpu.utils import xmlio

    video = f"{DATA}/cam{cam}/intrinsics_imagepoints.mp4"
    corner_views = ria.cv2_corner_views(video)
    K_sh, d_sh, _, _ = xmlio.load_camera_config(f"{DATA}/cam{cam}")
    d_sh = np.ravel(d_sh)[:5]
    rows = []
    for d in OFFSETS:
        K = np.asarray(K_sh, np.float64).copy()
        K[0, 2] += d
        rows.append((d, _eval_reproj(K, d_sh, corner_views,
                                     PATTERN, SQUARE)))
    return rows, len(corner_views)


def main():
    syn_rows, syn_n = synthetic_sweep()
    real_rows, real_n = real_sweep()

    lines = [
        "",
        "## Principal-point sensitivity of the eval metric (r4)",
        "",
        "The eval re-solves the board pose per view, so a cx shift is",
        "compensated by the solved pose translating the board sideways",
        "(dx ~ dcx*Z/fx for a plane at depth Z); only the second-order",
        "perspective/distortion mismatch across the board survives.",
        "Measured eval-RMS (px) vs cx offset:",
        "",
        "| dcx (px) | " + " | ".join(f"{d:+.0f}" for d, _ in syn_rows)
        + " |",
        "|---|" + "---|" * len(syn_rows),
        f"| synthetic, truth known ({syn_n} views) | "
        + " | ".join(f"{r:.3f}" for _, r in syn_rows) + " |",
        f"| real cam2, shipped K ({real_n} views) | "
        + " | ".join(f"{r:.3f}" for _, r in real_rows) + " |",
        "",
    ]
    r0 = dict(syn_rows)[0.0]
    r24 = dict(syn_rows)[24.0]
    if not (np.isfinite(r0) and np.isfinite(r24)):
        raise RuntimeError(
            "solve_pnp failed on every view at offset 0 or 24 px — the "
            "sweep cannot support a conclusion; fix the fixture before "
            "regenerating the report"
        )
    lines += [
        f"At the observed 24 px drift the synthetic curve rises only "
        f"{r24 - r0:+.3f} px over its truth value ({r0:.3f} px) — the "
        "metric genuinely cannot discriminate principal-point error at "
        "this scale.  Conclusion for the parity table: eval-RMS parity "
        "grounds fx/fy/distortion agreement; cx/cy agreement must be "
        "read from the parameter columns directly (cam2's 24 px cx "
        "drift is real drift the eval cannot see, bounded by this "
        "sweep's worst case).",
    ]
    text = "\n".join(lines)
    print(text)
    if "--write-report" in sys.argv:
        with open(OUT, "a") as f:
            f.write(text + "\n")
        print(f"\n# appended to {OUT}")


if __name__ == "__main__":
    main()
