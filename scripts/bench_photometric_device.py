"""Wall-clock of the photometric-calibration Adam refinement: TPU vs CPU.

VERDICT r3 #5 ("the one genuinely gradient-heavy optimization in the
system not running on the TPU"): `photometric_calibrate` is f32 fused-XLA
`lax.scan` chunks and now takes a `device` argument (default "auto" =
the chip when reachable).  This script measures the refinement wall-clock
per device on the real intrinsics footage — the blob-lattice view
collection is host-side by design (cv2 decode + host labeling) and is
reported separately; only the Adam stage moves between devices.

Usage:  python scripts/bench_photometric_device.py [cam_index] [iters]
Output: one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vbr_tpu.pipelines import calibration as calib
    from vbr_tpu.pipelines import photometric_calibration as PC

    cam = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    data = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
    video = os.path.join(data, f"cam{cam}", "intrinsics_imagepoints.mp4")

    t0 = time.time()
    views = PC.collect_board_views(video, max_views=48, deoverlay=True)
    collect_s = time.time() - t0
    hh, ww = views[0].gray.shape
    init_res = calib.calibrate_camera(
        [v.corners.astype(np.float64) for v in views], (ww, hh),
        PC._PATTERN, 115.0,
    )
    init = (
        init_res.K,
        np.asarray(init_res.dist).reshape(-1)[:5].copy(),
        list(zip(init_res.rvecs, init_res.tvecs)),
    )
    n_nuis = min(400, iters // 6)
    stages = [(n_nuis, "nuisance"), (iters - n_nuis, "all")]

    results = {}
    fx = {}
    devices = ["cpu"]
    try:
        d0 = jax.devices()[0]
        if d0.platform != "cpu":
            devices.append("auto")  # the chip
    except RuntimeError:
        pass

    for dev in devices:
        # warm-up run settles session establishment + compiles, then a
        # timed run measures the steady refinement
        PC.photometric_calibrate(
            views, (ww, hh), square_mm=115.0, iters=20, chunk=20,
            init=init, stages=[(20, "nuisance")], device=dev,
        )
        t0 = time.time()
        res = PC.photometric_calibrate(
            views, (ww, hh), square_mm=115.0, iters=iters, chunk=500,
            init=init, stages=stages, device=dev,
        )
        results[dev] = time.time() - t0
        fx[dev] = float(res.K[0, 0])

    out = {
        "metric": "photometric_refine_wallclock_s",
        "value": round(results.get("auto", results["cpu"]), 2),
        "unit": f"s for {iters} Adam iters, {len(views)} views",
        "extra": {
            "per_device_s": {k: round(v, 2) for k, v in results.items()},
            "view_collection_host_s": round(collect_s, 2),
            "fx_per_device": {k: round(v, 2) for k, v in fx.items()},
            "camera": cam,
            "device_ran": str(
                PC.select_refine_device("auto").platform
            ),
        },
    }
    if "auto" in results:
        out["extra"]["tpu_speedup_vs_cpu"] = round(
            results["cpu"] / results["auto"], 2
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
