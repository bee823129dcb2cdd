"""Evaluate the KNN and MOG2 models against cv2 (Python oracles) and the
shipped golden masks on the real dataset — mirrors the reference's
background_subtraction __main__ driver (background_subtraction.py:343-419)
including its per-model hyperparameters, and writes the comparison plot.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def iou(a, b):
    a, b = a > 0, b > 0
    return (a & b).sum() / max((a | b).sum(), 1)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import cv2

    from vbr_tpu.ops import gmm
    from vbr_tpu.pipelines import background, reports
    from vbr_tpu.utils import video as vio
    from vbr_tpu.utils.config import DEFAULT_MASK_PARAMS

    data = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
    cams = [1, 2, 3, 4]
    masks_grid = {"KNN": [], "MOG2": []}
    for cam in cams:
        bg = vio.read_video(os.path.join(data, f"cam{cam}", "background.avi"))
        test = vio.read_video(
            os.path.join(data, f"cam{cam}", "video.avi"), max_frames=1
        )[0]
        mp = DEFAULT_MASK_PARAMS[cam - 1]

        # ---- KNN (reference __main__: dist 3500, hsv, no shadows) ----
        kp = gmm.KNNParams(history=bg.shape[0], dist2_threshold=3500,
                           use_hsv=True)
        st = gmm.train_knn(bg, kp)
        raw = np.asarray(gmm.extract_mask_knn(st, test, kp))
        cv = cv2.createBackgroundSubtractorKNN(
            history=bg.shape[0], dist2Threshold=3500, detectShadows=False)
        for fr in bg:
            cv.apply(cv2.cvtColor(fr, cv2.COLOR_BGR2HSV), None, -1)
        raw_cv = cv.apply(cv2.cvtColor(test, cv2.COLOR_BGR2HSV), None, 0)
        from vbr_tpu.ops import ccl
        clean = ccl.clean_mask_host(raw, mp.figure_threshold, mp.inner_threshold)
        golden = cv2.imread(os.path.join(data, f"cam{cam}", "mask_KNN.jpg"), 0)
        print(f"cam{cam} KNN: raw-vs-cv2 IoU {iou(raw, raw_cv):.4f}  "
              f"clean-vs-golden IoU {iou(clean, golden):.4f}", flush=True)
        masks_grid["KNN"].append(clean)

        # ---- MOG2 (reference __main__: varThreshold 650, no shadows) ----
        m2p = gmm.MOG2Params(history=bg.shape[0], var_threshold=650,
                             use_hsv=True)
        st2 = gmm.train_mog2(bg, m2p)
        raw2 = np.asarray(gmm.extract_mask_mog2(st2, test, m2p))
        cv2m = cv2.createBackgroundSubtractorMOG2(
            history=bg.shape[0], varThreshold=650, detectShadows=False)
        for fr in bg:
            cv2m.apply(cv2.cvtColor(fr, cv2.COLOR_BGR2HSV), None, -1)
        raw2_cv = cv2m.apply(cv2.cvtColor(test, cv2.COLOR_BGR2HSV), None, 0)
        clean2 = ccl.clean_mask_host(raw2, mp.figure_threshold, mp.inner_threshold)
        golden2 = cv2.imread(os.path.join(data, f"cam{cam}", "mask_MOG2.jpg"), 0)
        print(f"cam{cam} MOG2: raw-vs-cv2 IoU {iou(raw2, raw2_cv):.4f}  "
              f"clean-vs-golden IoU {iou(clean2, golden2):.4f}", flush=True)
        masks_grid["MOG2"].append(clean2)

    reports.plot_mask_comparison(
        {k: np.stack(v) for k, v in masks_grid.items()},
        "artifacts/background_models_mask_comparisons.png",
    )
    print("wrote artifacts/background_models_mask_comparisons.png")


if __name__ == "__main__":
    main()
