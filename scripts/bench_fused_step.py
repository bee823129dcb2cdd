"""Stage-level timing for the fused per-frame pipeline on the TPU.

Measures steady-state marginal ms for: GMM apply + pre-morphology (full
vs prefix-compressed state), batched CCL cleanup, and the whole fused
step (process_frame_fast path).  Prints one JSON line per measurement.

Usage:  python scripts/bench_fused_step.py   (from /root/repo, axon TPU)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def marginal_ms(fn, sync, iters=12, pairs=3):
    half = max(1, iters // 2)

    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        sync(out)
        return time.perf_counter() - t0

    run(3)
    run(3)
    margs = []
    for _ in range(pairs):
        t_half = run(half)
        t_full = run(iters)
        margs.append((t_full - t_half) / (iters - half))
    return sorted(margs)[len(margs) // 2] * 1e3


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp

    from vbr_tpu.models.visual_hull import VisualHull
    from vbr_tpu.pipelines import background
    from vbr_tpu.utils import video as vio

    data_dir = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
    vh = VisualHull.from_data_dir(data_dir, train_background=False)
    cache = os.path.join("artifacts", "bg_cache")
    if not vh.load_background_models(cache):
        vh.train_background(data_dir)
        os.makedirs(cache, exist_ok=True)
        vh.save_background_models(cache)
    vh._ensure_fast_state()
    vh._ensure_btab()

    frames = np.stack([
        vio.read_video(os.path.join(data_dir, f"cam{i}", "video.avi"),
                       max_frames=1)[0]
        for i in range(1, 5)
    ])
    frames_d = jnp.asarray(frames)

    def sync1(x):
        np.asarray(x.ravel()[:1])

    def sync_tuple(xs):
        for x in jax.tree_util.tree_leaves(xs):
            np.asarray(x.ravel()[:1])

    p0 = vh.mog_params[0]
    ke = vh._stacked_fz.thr.shape[-1]
    print(f"# compressed prefix Ke = {ke}", file=sys.stderr)

    # full-state apply (old path)
    stacked_full = background.stack_states(vh.bg_states)

    def step_full():
        return background.raw_masks_batched(
            stacked_full, frames_d, vh._mask_params_t, p0
        )

    def step_fz():
        return background.raw_masks_batched_fz(
            vh._stacked_fz, frames_d, vh._mask_params_t, p0.use_hsv
        )

    raw_full = np.asarray(step_full())
    raw_fz = np.asarray(step_fz())
    assert (raw_full == raw_fz).all(), "compressed apply mismatch!"

    ms_full = marginal_ms(step_full, sync1)
    ms_fz = marginal_ms(step_fz, sync1)
    print(json.dumps({"stage": "gmm_apply_premorph_full50", "ms": round(ms_full, 3)}))
    print(json.dumps({"stage": "gmm_apply_premorph_fz", "ms": round(ms_fz, 3),
                      "ke": int(ke)}))

    raw_d = step_fz()

    def step_ccl():
        return background.ccl.clean_masks_batched(
            raw_d, vh._fig_thresholds, vh._inner_thresholds
        )[0]

    ms_ccl = marginal_ms(step_ccl, sync1)
    print(json.dumps({"stage": "ccl_cleanup_batched", "ms": round(ms_ccl, 3)}))

    def step_fused():
        return vh.process_frame_fast(frames, layout="blocked")

    ms_fused = marginal_ms(step_fused, sync_tuple, iters=10)
    print(json.dumps({"stage": "full_fused_step_host_roundtrip",
                      "ms": round(ms_fused, 3)}))


def bench_device_program():
    """Compute-only: the fused device program with device-resident frames
    (what a co-located host pays per frame)."""
    import jax
    import jax.numpy as jnp

    from vbr_tpu.models import visual_hull as vhm
    from vbr_tpu.models.visual_hull import VisualHull
    from vbr_tpu.utils import video as vio

    data_dir = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
    vh = VisualHull.from_data_dir(data_dir, train_background=False)
    cache = os.path.join("artifacts", "bg_cache")
    if not vh.load_background_models(cache):
        vh.train_background(data_dir)
    vh._ensure_fast_state()
    vh._ensure_btab()
    frames = np.stack([
        vio.read_video(os.path.join(data_dir, f"cam{i}", "video.avi"),
                       max_frames=1)[0]
        for i in range(1, 5)
    ])
    frames_d = jnp.asarray(frames)

    for layout in ("blocked", "packed"):
        def step():
            return vhm._full_step_pallas(
                vh._stacked_fz, frames_d,
                vh._btab.pk, vh._btab.lcc, vh._btab.vorig, vh._btab.uorig,
                vh._btab.allv, vh._btab.ry, vh._btab.rx,
                btab_static=vhm._btab_static(vh._btab),
                mask_params=vh._mask_params_t,
                use_hsv=vh.mog_params[0].use_hsv,
                fig_thresholds=vh._fig_thresholds,
                inner_thresholds=vh._inner_thresholds,
                views_threshold=vh.rig.views_threshold,
                layout=layout,
            )

        def sync(out):
            for x in jax.tree_util.tree_leaves(out):
                np.asarray(x.ravel()[:1])
                break

        ms = marginal_ms(step, sync, iters=16)
        print(json.dumps({"stage": f"fused_device_program_{layout}",
                          "ms": round(ms, 3)}))


if __name__ == "__main__":
    if os.environ.get("VBR_BENCH_DEVICE_ONLY"):
        sys.exit(bench_device_program())
    main()
    sys.exit(bench_device_program())
