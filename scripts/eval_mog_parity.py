"""Compare the JAX MOG raw masks against the actual cv::bgsegm C++ MOG
(via the native oracle binding) on the reference data, plus the final
cleaned masks against the shipped goldens.

Usage: python scripts/eval_mog_parity.py [--cpu] [--cams 1,2,3,4]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    if "--cpu" in sys.argv:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2

    from vbr_tpu.native import MOGOracle
    from vbr_tpu.ops import gmm
    from vbr_tpu.pipelines import background
    from vbr_tpu.utils import video as vio
    from vbr_tpu.utils.config import DEFAULT_MASK_PARAMS, MOGParams

    cams = [1, 2, 3, 4]
    for a in sys.argv:
        if a.startswith("--cams"):
            cams = [int(x) for x in a.split("=")[1].split(",")]

    data = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
    for cam in cams:
        bg = vio.read_video(os.path.join(data, f"cam{cam}", "background.avi"))
        test = vio.read_video(
            os.path.join(data, f"cam{cam}", "video.avi"), max_frames=1
        )[0]
        params = MOGParams(history=bg.shape[0])

        # C++ oracle (HSV like the production path)
        oracle = MOGOracle(history=bg.shape[0], nmixtures=50,
                           background_ratio=0.9, noise_sigma=0)
        for fr in bg:
            oracle.apply(cv2.cvtColor(fr, cv2.COLOR_BGR2HSV), -1)
        mask_cv = oracle.apply(cv2.cvtColor(test, cv2.COLOR_BGR2HSV), 0)

        t0 = time.time()
        state = gmm.train_mog(bg, params)
        mask_jax = np.asarray(gmm.extract_mask(state, test, params))
        t_train = time.time() - t0

        a = mask_cv > 0
        b = mask_jax > 0
        iou = (a & b).sum() / max((a | b).sum(), 1)
        print(
            f"cam{cam}: raw-mask IoU vs C++ MOG = {iou:.4f} "
            f"(cv fg {a.mean():.4f}, jax fg {b.mean():.4f}) [{t_train:.0f}s]",
            flush=True,
        )

        # end-to-end cleaned mask vs golden
        golden = cv2.imread(os.path.join(data, f"cam{cam}", "mask_MOG.jpg"), 0)
        cleaned = np.asarray(
            background.extract_foreground_mask(
                state, test, DEFAULT_MASK_PARAMS[cam - 1], params
            )
        )
        g = golden > 127
        c = cleaned > 0
        iou2 = (g & c).sum() / max((g | c).sum(), 1)
        print(f"cam{cam}: cleaned-mask IoU vs golden = {iou2:.4f}", flush=True)
        cv2.imwrite(f"artifacts/mask_cam{cam}_ours.png", cleaned)
        cv2.imwrite(f"artifacts/mask_cam{cam}_cvraw.png", mask_cv)


if __name__ == "__main__":
    main()
