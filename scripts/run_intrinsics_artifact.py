"""End-to-end real-video intrinsic calibration artifact run.

Runs the detector-free photometric intrinsic calibration
(`pipelines/photometric_calibration.py`) on the reference's annotated
intrinsics audit videos (`data/cam*/intrinsics_imagepoints.mp4` — the raw
intrinsics.avi files are LFS-stripped from this mount), writes per-camera
config.xml + npz + annotated detection images into
artifacts/intrinsics_run/, and grades the result against the reference's
shipped calibration on an INDEPENDENT metric: reprojection RMS on
cv2-detected corners, which the photometric optimizer never saw.

Reference flow being reproduced: camera_calibration.py:867-978.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Default: CPU for bit-reproducibility of the committed artifact; set
# VBR_DEVICE=auto (or tpu) to run the Adam refinement on the chip
# (pipelines.photometric_calibration.select_refine_device — VERDICT r3
# #5; scripts/bench_photometric_device.py measures the speedup).
if os.environ.get("VBR_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import warnings

warnings.filterwarnings("ignore")

import cv2
import numpy as np

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.pipelines import calibration as CAL
from vbr_tpu.pipelines import photometric_calibration as PC
from vbr_tpu.utils import xmlio

DATA = "/root/reference/data"
OUT = "artifacts/intrinsics_run"
PATTERN = (8, 6)
SQUARE = 115.0


def cv2_corner_views(video):
    term = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_MAX_ITER, 30, 0.001)
    cap = cv2.VideoCapture(video)
    out = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        g = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        ret, c = cv2.findChessboardCorners(g, PATTERN)
        if ret:
            c = cv2.cornerSubPix(g, c.astype(np.float32), (9, 9), (-1, -1),
                                 term).reshape(-1, 2).astype(np.float64)
            out.append(c)
    cap.release()
    return out


def eval_reproj(K, dist, corner_views):
    obj = CAL.chessboard_object_points(PATTERN, SQUARE)
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
    return np.asarray(errs)


def main():
    report = ["# Real-video intrinsic calibration run",
              "",
              "Input: `data/cam*/intrinsics_imagepoints.mp4` — the "
              "reference's annotated audit videos of the real moving-board "
              "intrinsics capture (the only real intrinsics footage on "
              "this mount; cv2's drawn corner overlay corrupts every inner "
              "corner, which is exactly the regime the detector-free "
              "photometric calibration handles).",
              "",
              "Eval metric: per-view reprojection RMS on cv2-detected "
              "corners (pose re-solved per view) — corners the photometric "
              "optimizer NEVER consumed.  'shipped' = the reference's "
              "config.xml intrinsics, produced by cv2 from the clean "
              "(unavailable) raw videos.",
              ""]
    tbl = ["| cam | views | fx ours/shipped | fy | cx | cy | k1 | k2 | "
           "eval RMS ours | eval RMS shipped |",
           "|---|---|---|---|---|---|---|---|---|---|"]
    for cam in (1, 2, 3, 4):
        video = f"{DATA}/cam{cam}/intrinsics_imagepoints.mp4"
        t0 = time.time()
        res, views = PC.calibrate_video_photometric(
            video, pattern=PATTERN, square_mm=SQUARE, iters=3000)
        dt = time.time() - t0
        K_sh, d_sh, _, _ = xmlio.load_camera_config(f"{DATA}/cam{cam}")
        d_sh = np.ravel(d_sh)[:5]
        cviews = cv2_corner_views(video)
        e_ours = eval_reproj(res.K, res.dist, cviews)
        e_ship = eval_reproj(K_sh, d_sh, cviews)
        out = os.path.join(OUT, f"cam{cam}")
        os.makedirs(out, exist_ok=True)
        xmlio.save_camera_config(out, res.K, res.dist, res.rvecs[0],
                                 res.tvecs[0], filename="config.xml")
        np.savez(os.path.join(out, "photometric_calib.npz"),
                 K=res.K, dist=res.dist, rvecs=res.rvecs, tvecs=res.tvecs,
                 mse=res.mse, frame_indices=res.frame_indices,
                 loss_curve=res.loss_curve)
        # annotated detection artifact: final-calibration reprojected
        # corners over a mid-sequence frame
        mid = len(views) // 2
        cap = cv2.VideoCapture(video)
        cap.set(cv2.CAP_PROP_POS_FRAMES, views[mid].frame_idx)
        _, frame = cap.read()
        cap.release()
        obj = CAL.chessboard_object_points(PATTERN, SQUARE)
        uv = cam_ops.project_points(obj, res.rvecs[mid], res.tvecs[mid],
                                    res.K, res.dist, xp=np)
        from vbr_tpu.pipelines import validation
        overlay = frame.copy()
        validation.draw_chessboard_corners(overlay, uv, PATTERN)
        cv2.imwrite(os.path.join(out, "photometric_imagepoints.jpg"),
                    overlay)
        print(f"cam{cam}: {len(views)} views, {dt:.0f}s | "
              f"fx {res.K[0,0]:.1f}/{K_sh[0,0]:.1f} "
              f"cy {res.K[1,2]:.1f}/{K_sh[1,2]:.1f} | "
              f"eval RMS ours {e_ours.mean():.3f} "
              f"shipped {e_ship.mean():.3f} px ({len(cviews)} views)")
        tbl.append(
            f"| {cam} | {len(views)} | {res.K[0,0]:.1f} / {K_sh[0,0]:.1f} "
            f"| {res.K[1,1]:.1f} / {K_sh[1,1]:.1f} "
            f"| {res.K[0,2]:.1f} / {K_sh[0,2]:.1f} "
            f"| {res.K[1,2]:.1f} / {K_sh[1,2]:.1f} "
            f"| {res.dist[0]:.4f} / {d_sh[0]:.4f} "
            f"| {res.dist[1]:.4f} / {d_sh[1]:.4f} "
            f"| {e_ours.mean():.3f} px | {e_ship.mean():.3f} px |")
    report += tbl
    report += ["",
               "Same-or-better eval RMS means the detector-free "
               "calibration from corrupted footage matches the reference "
               "toolchain's calibration from clean footage."]
    with open(os.path.join(OUT, "report.md"), "w") as f:
        f.write("\n".join(report) + "\n")
    print(f"wrote {OUT}/report.md")


if __name__ == "__main__":
    main()
