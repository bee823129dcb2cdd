"""Principal-point-sensitive calibration eval (VERDICT r4 #4).

The r4 per-view reprojection eval re-solves the board pose per view, so
a cx shift is absorbed by a sideways pose translation — the metric is
provably blind to 24 px of principal-point drift
(artifacts/intrinsics_run/report.md).  This eval uses a metric that is
NOT blind to it: multi-camera visual-hull silhouette consistency
(pipelines.extrinsics_eval.hull_coverage).  Board-solved poses
compensate a cx shift exactly only at the board's depth plane; the
carved subject stands at a different depth, so a wrong cx drags that
camera's silhouette cone sideways there, the cone intersection shrinks,
and per-camera coverage + hull volume drop at first order.

Protocol and MEASURED OUTCOME (r5): the synthetic truth-known sweep
below shows this metric is ALSO nearly blind to dcx in this rig's
geometry — the board (z=0 floor) and the subject stand at almost the
same depth from every camera (~4.5 m), so the board-solved pose
compensation dx ~ dcx*Z/fx is accurate at the subject too and the cone
barely moves where it matters (coverage varies <0.01, hull volume
drifts ~3% over +-32 px with no peak at truth).  The script is kept as
the checkable negative result motivating the adjudication that DOES
work: scripts/eval_pp_adjudicate.py (paired argmin of the multi-view
eval-RMS curve with a bootstrap CI).

Writes artifacts/pp_eval/hull_sweep.json.
Usage (from /root/repo):  python scripts/eval_pp_hull.py
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join("artifacts", "pp_eval")
DCX = (-32, -24, -16, -8, 0, 8, 16, 24, 32)


def main():
    from vbr_tpu.ops import camera as cam_ops
    from vbr_tpu.pipelines import calibration, extrinsics_eval as ev
    from vbr_tpu.utils import synthetic

    os.makedirs(OUT_DIR, exist_ok=True)
    obj = ev.board_object_points()

    cams_t, masks_s, _frames = synthetic.synthetic_rig()
    meas = [
        cam_ops.project_points(
            obj, np.asarray(c.rvec).ravel(), np.asarray(c.tvec).ravel(),
            np.asarray(c.K), np.asarray(c.dist), xp=np,
        )
        for c in cams_t
    ]

    def perturbed_set(dcx, cam_idx=1):
        cset = []
        for ci, c in enumerate(cams_t):
            if ci != cam_idx:
                cset.append(c)
                continue
            K2 = np.asarray(c.K).copy()
            K2[0, 2] += dcx
            rv, tv = calibration.solve_pnp(
                obj, meas[ci], K2, np.asarray(c.dist))
            cset.append(dataclasses.replace(
                c, cx=float(K2[0, 2]),
                rvec_xyz=tuple(np.asarray(rv, float).ravel()),
                tvec_xyz=tuple(np.asarray(tv, float).ravel()),
            ))
        return cset

    syn = []
    for dcx in DCX:
        cset = perturbed_set(dcx)
        occ, covs = ev.hull_coverage(masks_s, cset)
        c2 = cset[1]
        pred = cam_ops.project_points(
            obj, np.asarray(c2.rvec).ravel(), np.asarray(c2.tvec).ravel(),
            np.asarray(c2.K), np.asarray(c2.dist), xp=np,
        )
        rms = float(np.sqrt(np.mean(
            np.sum((pred - meas[1]) ** 2, axis=1))))
        syn.append({
            "dcx": dcx,
            "mean_coverage": round(float(np.mean(covs)), 5),
            "hull_voxels": int(occ.sum()),
            "board_rms_px_resolved_pose": round(rms, 4),
        })
        print(json.dumps({"synthetic": syn[-1]}))
        sys.stdout.flush()

    with open(os.path.join(OUT_DIR, "hull_sweep.json"), "w") as f:
        json.dump({"synthetic_sweep": syn}, f, indent=1)
    print(f"# wrote {OUT_DIR}/hull_sweep.json")


if __name__ == "__main__":
    main()
