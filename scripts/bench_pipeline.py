"""End-to-end streaming pipeline benchmark: decode → masks → carve.

Drives the full production loop over data/cam*/video.avi with the native
threaded decode ring + the double-buffered VisualHull.stream pipeline
(one fused device program per frame: GMM apply → morphology → Pallas CCL
cleanup → Pallas carve).  Prints fps (end-to-end incl. decode) and
compute-only ms/frame.

Reference analog: the serial per-frame loop of assignment.py:94-113.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp  # noqa: F401

    from vbr_tpu.models.visual_hull import VisualHull
    from vbr_tpu.native import PrefetchingSource

    data_dir = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
    n_frames = int(os.environ.get("VBR_BENCH_FRAMES", "100"))
    layout = os.environ.get("VBR_BENCH_LAYOUT", "blocked")
    # bgr | yuv420 | yuv420_roi
    ingest = os.environ.get("VBR_BENCH_INGEST", "bgr")

    vh = VisualHull.from_data_dir(data_dir, train_background=False)
    cache = os.path.join("artifacts", "bg_cache")
    if not vh.load_background_models(cache):
        vh.train_background(data_dir)
        os.makedirs(cache, exist_ok=True)
        vh.save_background_models(cache)

    src = PrefetchingSource(
        [os.path.join(data_dir, f"cam{i}", "video.avi") for i in range(1, 5)]
    )

    def frames_iter(limit):
        n = 0
        while n < limit:
            f = src.next_frames()
            if f is None:
                return
            yield f
            n += 1

    if ingest != "bgr":
        # evidence gate for the lossy wire format: measured cleaned-mask
        # IoU + hull difference on this rig's first frame-set
        probe = src.next_frames()
        guard = vh.validate_reduced_ingest(probe, ingest=ingest)
        print(json.dumps({"metric": "reduced_ingest_guard", **guard}))
        sys.stdout.flush()

    # warm-up (compile)
    for pos, rgb in vh.stream_viewer(frames_iter(3), ingest=ingest):
        pass

    t0 = time.perf_counter()
    n = 0
    occupied_last = 0
    for pos, rgb in vh.stream_viewer(frames_iter(n_frames), ingest=ingest):
        # results arrive as host viewer arrays (positions + colors)
        occupied_last = pos.shape[0]
        n += 1
    dt = time.perf_counter() - t0
    fps = n / dt

    result = {
        "metric": "pipeline_fps_end_to_end",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "extra": {
            "frames": n,
            "ms_per_frame": round(dt / max(n, 1) * 1e3, 2),
            "occupied_last_frame": occupied_last,
            "layout": "packed-wire (bit-packed occ + block-compacted colors)",
            "ingest": ingest,
            "device": str(jax.devices()[0]),
            "includes": "decode + masks + CCL + carve + result sync",
        },
    }
    print(json.dumps(result))
    src.close()


if __name__ == "__main__":
    sys.exit(main())
