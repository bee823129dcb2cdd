"""Benchmark: 128³ × 4-camera visual-hull carve, ms/frame on one chip.

North star (BASELINE.md): < 5 ms/frame/chip on TPU v5e at 128³ with
occupancy matching the OpenCV/reference semantics.  Prints one JSON line:
{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is the speedup factor against the 5 ms/frame target (>1 beats
the target).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vbr_tpu.ops import carve
    from vbr_tpu.pipelines import reconstruction
    from vbr_tpu.utils.config import GridConfig, RigConfig

    data_dir = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
    grid = GridConfig()  # 128^3, production extents
    rig = RigConfig()

    if os.path.isdir(data_dir):
        import cv2

        cameras = reconstruction.load_rig(data_dir)
        masks = []
        frames = []
        for i in range(1, 5):
            m = cv2.imread(os.path.join(data_dir, f"cam{i}", "mask_MOG.jpg"), 0)
            masks.append((m > 127).astype(np.uint8) * 255)
            cap = cv2.VideoCapture(os.path.join(data_dir, f"cam{i}", "video.avi"))
            ok, f = cap.read()
            cap.release()
            frames.append(f)
        masks = np.stack(masks)
        frames = np.stack(frames)
    else:  # synthetic fallback if dataset is absent
        from vbr_tpu.utils.synthetic import synthetic_rig

        cameras, masks, frames = synthetic_rig()

    H, W = masks.shape[1:3]
    tables = carve.build_projection_tables(cameras, grid, (H, W))
    masks_d = jnp.asarray(masks)
    frames_d = jnp.asarray(frames)

    def step(m, im):
        return carve.carve_from_tables(
            m, im, tables.valid, tables.lin_idx,
            views_threshold=rig.views_threshold, color_camera=rig.color_camera,
        )

    # Warm-up / compile
    occ, col = step(masks_d, frames_d)
    occ.block_until_ready()
    n_occ = int(np.asarray(occ).sum())

    iters = int(os.environ.get("VBR_BENCH_ITERS", "50"))
    t0 = time.perf_counter()
    for _ in range(iters):
        occ, col = step(masks_d, frames_d)
    jax.block_until_ready((occ, col))
    dt = (time.perf_counter() - t0) / iters

    ms = dt * 1e3
    voxels_per_sec = grid.num_voxels * 4 / dt
    result = {
        "metric": "carve_128c4_ms_per_frame",
        "value": round(ms, 4),
        "unit": "ms/frame/chip",
        "vs_baseline": round(5.0 / ms, 3),
        "extra": {
            "voxel_tests_per_sec": voxels_per_sec,
            "occupied_voxels": n_occ,
            "grid": "128x128x128",
            "cameras": 4,
            "device": str(jax.devices()[0]),
            "iters": iters,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
