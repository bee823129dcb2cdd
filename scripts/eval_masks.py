"""Evaluate the full background-subtraction pipeline against the shipped
golden masks (data/cam*/mask_MOG.jpg): per-camera IoU + carve occupancy.

Usage: python scripts/eval_masks.py [--cpu]
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

    from vbr_tpu.pipelines import background
    from vbr_tpu.utils.config import DEFAULT_MASK_PARAMS

    data = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
    t0 = time.time()
    pipe = background.BackgroundPipeline(data)
    print(f"trained 4 MOG models in {time.time()-t0:.1f}s", flush=True)

    frames = []
    goldens = []
    for i in range(1, 5):
        cap = cv2.VideoCapture(os.path.join(data, f"cam{i}", "video.avi"))
        ok, f = cap.read()
        cap.release()
        frames.append(f)
        goldens.append(
            (cv2.imread(os.path.join(data, f"cam{i}", "mask_MOG.jpg"), 0) > 127)
        )
    frames = np.stack(frames)

    t0 = time.time()
    masks = pipe.masks_for_frames(frames)
    print(f"extracted masks in {time.time()-t0:.1f}s", flush=True)

    for c in range(4):
        ours = masks[c] > 0
        gold = goldens[c]
        inter = (ours & gold).sum()
        union = (ours | gold).sum()
        iou = inter / max(union, 1)
        print(
            f"cam{c+1}: IoU={iou:.4f}  ours={ours.sum()}  golden={gold.sum()}",
            flush=True,
        )
        cv2.imwrite(f"artifacts/mask_cam{c+1}_ours.png", masks[c])


if __name__ == "__main__":
    main()
