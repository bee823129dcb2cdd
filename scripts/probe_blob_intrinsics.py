"""Probe: blob-lattice chessboard detection on the annotated intrinsics
videos (data/cam*/intrinsics_imagepoints.mp4) without known intrinsics.

The reference's raw intrinsics.avi files are LFS-stripped from the mount;
the annotated audit videos (reference camera_calibration.py:441-444) are
the only real moving-board footage available.  cv2's drawn corner overlay
defeats the saddle/X-junction detector, so detect via the big black
squares (overlay-immune), fit a board homography in RAW pixels (identity
K -- no intrinsics needed), predict inner corners, and subpix-refine on a
Laplace-inpainted gray (saddles are harmonic, so harmonic fill over the
small overlay discs reconstructs the corner structure).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np
import jax.numpy as jnp

from vbr_tpu.ops import corners as C
from vbr_tpu.pipelines import auto_extrinsics as AE

I3 = np.eye(3)
D0 = np.zeros(5)


def deoverlay_gray(frame_bgr, sat_thresh=110, iters=120):
    f = frame_bgr.astype(np.float32)
    sat = f.max(2) - f.min(2)
    mask = sat > sat_thresh
    mask = cv2.dilate(mask.astype(np.uint8), np.ones((3, 3), np.uint8))
    mask = mask.astype(bool)
    g = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY).astype(np.float32)
    filled = g.copy()
    for _ in range(iters):
        avg = cv2.blur(filled, (3, 3))
        filled[mask] = avg[mask]
    return filled, mask


def board_sheet(gray, change):
    """White board sheet: largest bright component inside the change mask,
    convex-filled."""
    vals = gray[change]
    t = np.percentile(vals, 60)
    bright = change & (gray > t)
    small = bright[::2, ::2]
    labels, n = AE._label_host(small)
    if n == 0:
        return None
    areas = np.bincount(labels.ravel())[1:]
    big = 1 + int(np.argmax(areas))
    ys, xs = np.nonzero(labels == big)
    pts = np.stack([xs * 2, ys * 2], -1).astype(np.float64)
    hull = C._convex_hull(pts)
    if len(hull) < 3:
        return None
    return AE.convex_fill(hull, gray.shape)


def detect(frame, bg, pattern=(8, 6)):
    dg, _ = deoverlay_gray(frame)
    gray = dg.astype(np.float64)
    change = AE.largest_change_region(bg, frame.astype(np.float64))
    if change is None:
        return None, "no-change"
    sheet = board_sheet(gray, change)
    if sheet is None or sheet.sum() < 3000:
        return None, "no-sheet"
    quad = AE.pattern_quad(gray, sheet)
    if quad is None:
        return None, "no-quad"
    cents, _ = AE.detect_black_squares(gray, sheet)
    if len(cents) < 10:
        return None, "few-blobs"
    H, ipts, nm = AE.orient_and_fit_homography(
        gray, quad, cents, I3, D0, pattern=pattern)
    if nm < 20:
        return None, f"nm={nm}"
    # subpix refine on de-overlayed gray
    ref = np.asarray(C.corner_subpix(jnp.asarray(dg), jnp.asarray(ipts),
                                     (9, 9)))
    moved = np.linalg.norm(ref - ipts, axis=1)
    return (ref, ipts, moved, nm), "ok"


def main():
    cam = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    path = f"/root/reference/data/cam{cam}/intrinsics_imagepoints.mp4"
    bg = AE.median_background(
        f"/root/reference/data/cam{cam}/background.avi")
    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    ok_n = 0
    for fi in range(n):
        ok, frame = cap.read()
        if not ok:
            break
        out, why = detect(frame, bg)
        if out is None:
            print(f"  f{fi}: {why}")
            continue
        ref, ipts, moved, nm = out
        ok_n += 1
        # compare vs cv2 detector on same (raw) frame
        g8 = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        ret, cvc = cv2.findChessboardCorners(g8, (8, 6))
        msg = ""
        if ret:
            term = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_MAX_ITER,
                    30, 0.001)
            cvc = cv2.cornerSubPix(g8, cvc.astype(np.float32), (9, 9),
                                   (-1, -1), term).reshape(-1, 2)
            dmin = np.linalg.norm(ref[:, None] - cvc[None], axis=-1).min(1)
            msg = f" vs-cv2 mean {dmin.mean():.3f} max {dmin.max():.3f} px"
        print(f"  f{fi}: ok nm={nm} subpix-move mean {moved.mean():.2f} "
              f"max {moved.max():.2f}{msg}")
    print(f"cam{cam}: {ok_n}/{n} frames detected")


if __name__ == "__main__":
    main()
