"""Auto-vs-manual extrinsics A/B on metrics the optimizer never saw.

Runs the full-auto extrinsic calibration (``pipelines/auto_extrinsics``)
on the real rig, then scores BOTH the recovered poses and the
reference's shipped manual calibration on three independent geometric
metrics (``pipelines/extrinsics_eval``):

  (a) saddle-corner reprojection RMS (px, seed-independent measurement),
  (b) cross-camera triangulation error vs the known 115 mm lattice (mm),
  (c) visual-hull silhouette consistency on the shipped mask goldens.

Artifacts written to artifacts/auto_extrinsics/:
  camN_config.xml  — the recovered pose in the reference config format
  camN_axes.jpg    — AR axes overlay under the recovered pose
  report.md        — the metric table (also printed)

Usage:  python scripts/eval_auto_extrinsics.py [--data DIR] [--iters N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side pipeline

    from vbr_tpu.pipelines import (
        auto_extrinsics as ax,
        extrinsics_eval as ev,
        reconstruction,
        validation,
    )
    from vbr_tpu.utils import video as vio, xmlio
    from vbr_tpu.utils.config import GridConfig

    data = "/root/reference/data"
    iters = 400
    for a in sys.argv[1:]:
        if a.startswith("--data="):
            data = a.split("=", 1)[1]
        if a.startswith("--iters="):
            iters = int(a.split("=", 1)[1])

    out_dir = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "auto_extrinsics")
    os.makedirs(out_dir, exist_ok=True)

    cams = reconstruction.load_rig(data)
    C = len(cams)
    t0 = time.time()
    res = ax.auto_extrinsics(data, cams, photometric_iters=iters)
    t_auto = time.time() - t0
    poses_auto = [(np.asarray(c.rvec).ravel(), np.asarray(c.tvec).ravel())
                  for c in res.cameras]
    poses_ship = [(np.asarray(c.rvec).ravel(), np.asarray(c.tvec).ravel())
                  for c in cams]

    grays = [
        ax.temporal_mean_gray(
            os.path.join(data, f"cam{i + 1}", "checkerboard.avi"),
            max_frames=48,
        )
        for i in range(C)
    ]
    rep_auto, rep_ship = ev.evaluate_pose_sets(
        grays, cams, poses_auto, poses_ship
    )

    # (c) hull silhouette consistency on the shipped golden masks
    import cv2

    masks = np.stack([
        (cv2.imread(os.path.join(data, f"cam{i + 1}", "mask_MOG.jpg"), 0)
         > 127).astype(np.uint8) * 255
        for i in range(C)
    ])
    carve_rep = ev.carve_silhouette_ab(
        masks, cams, poses_auto, poses_ship, GridConfig(nx=64, ny=64, nz=64)
    )

    # artifacts: config.xml + AR axes overlay per camera
    for i in range(C):
        rv, tv = poses_auto[i]
        xmlio.save_camera_config(
            out_dir, cams[i].K, cams[i].dist, rv, tv,
            filename=f"cam{i + 1}_config.xml",
        )
        frame = vio.get_frame(
            os.path.join(data, f"cam{i + 1}", "checkerboard.avi"), 0
        )
        validation.draw_axes(frame, cams[i].K, cams[i].dist, rv, tv)
        cv2.imwrite(os.path.join(out_dir, f"cam{i + 1}_axes.jpg"), frame)

    lines = [
        "# Auto vs shipped-manual extrinsics — independent geometry",
        "",
        f"Auto calibration wall time: {t_auto:.0f} s "
        f"(photometric_iters={iters}); flips={res.flips}; "
        f"hull votes={ {str(k): v for k, v in res.votes.items()} }",
        "",
        "| metric | " + " | ".join(f"cam{i + 1}" for i in range(C))
        + " | overall |",
        "|---|" + "---|" * (C + 1),
    ]

    def row(name, vals, overall, fmt="%.3f"):
        lines.append(
            f"| {name} | " + " | ".join(fmt % v for v in vals)
            + f" | {fmt % overall} |"
        )

    ra, rs = rep_auto.reproj_rms_px, rep_ship.reproj_rms_px
    row("corner reproj RMS px (auto)", ra,
        float(np.sqrt(np.mean(np.square(ra)))))
    row("corner reproj RMS px (manual)", rs,
        float(np.sqrt(np.mean(np.square(rs)))))
    row("kept corners", rep_auto.kept_corners,
        float(np.sum(rep_auto.kept_corners)), fmt="%d")
    lines += [
        "",
        f"Triangulation RMS vs 115 mm lattice "
        f"({rep_auto.triangulated_points} pts, >=2 cams): "
        f"auto **{rep_auto.triangulation_rms_mm:.2f} mm**, "
        f"manual **{rep_ship.triangulation_rms_mm:.2f} mm**",
        "",
        "Hull silhouette coverage (64^3, golden masks): auto "
        + str([round(v, 4) for v in carve_rep.coverage_a])
        + f" (hull {carve_rep.voxels_a} vox), manual "
        + str([round(v, 4) for v in carve_rep.coverage_b])
        + f" (hull {carve_rep.voxels_b} vox), "
        f"auto-vs-manual hull IoU {carve_rep.hull_iou_ab:.3f}",
    ]
    md = "\n".join(lines) + "\n"
    with open(os.path.join(out_dir, "report.md"), "w") as f:
        f.write(md)
    print(md)
    print(json.dumps({
        "reproj_rms_px_auto": ra,
        "reproj_rms_px_manual": rs,
        "tri_rms_mm_auto": rep_auto.triangulation_rms_mm,
        "tri_rms_mm_manual": rep_ship.triangulation_rms_mm,
        "coverage_auto": carve_rep.coverage_a,
        "coverage_manual": carve_rep.coverage_b,
        "auto_seconds": round(t_auto, 1),
    }))


if __name__ == "__main__":
    main()
