"""In-context stage split of the fused per-frame program.

Jits PREFIXES of the production fused step (raw masks → +CCL cleanup →
+finalize → +Pallas carve) and reports each stage as the marginal
difference between consecutive prefixes — unlike timing the stages as
standalone programs, this keeps XLA's cross-stage fusion and scheduling
in place, so the splits add up to the measured fused total.

Usage:  python scripts/bench_fused_breakdown.py   (from /root/repo, axon)
"""

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import marginal_ms  # noqa: E402


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp

    from vbr_tpu.models import visual_hull as vhm
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
    frames_d = jnp.asarray(np.stack([
        vio.read_video(os.path.join(data_dir, f"cam{i}", "video.avi"),
                       max_frames=1)[0]
        for i in range(1, 5)
    ]))

    use_hsv = vh.mog_params[0].use_hsv
    mp = vh._mask_params_t
    figs, inners = vh._fig_thresholds, vh._inner_thresholds

    @functools.partial(jax.jit, static_argnames=())
    def p_raw(fz, frames):
        return background.raw_masks_batched_fz.__wrapped__(
            fz, frames, mp, use_hsv)

    @jax.jit
    def p_ccl(fz, frames):
        raw = background.raw_masks_batched_fz.__wrapped__(
            fz, frames, mp, use_hsv)
        cleaned, ovf = background.ccl.clean_masks_batched.__wrapped__(
            raw, figs, inners)
        return cleaned, ovf

    @jax.jit
    def p_fin(fz, frames):
        raw = background.raw_masks_batched_fz.__wrapped__(
            fz, frames, mp, use_hsv)
        cleaned, ovf = background.ccl.clean_masks_batched.__wrapped__(
            raw, figs, inners)
        return background.finalize_masks_batched.__wrapped__(cleaned, mp), ovf

    def p_full():
        return vhm._full_step_pallas(
            vh._stacked_fz, frames_d,
            vh._btab.pk, vh._btab.lcc, vh._btab.vorig, vh._btab.uorig,
            vh._btab.allv, vh._btab.ry, vh._btab.rx,
            btab_static=vhm._btab_static(vh._btab),
            mask_params=mp, use_hsv=use_hsv,
            fig_thresholds=figs, inner_thresholds=inners,
            views_threshold=vh.rig.views_threshold, layout="blocked",
        )

    def sync(out):
        x = out[0] if isinstance(out, tuple) else out
        np.asarray(x.ravel()[:1])

    iters = int(os.environ.get("VBR_BENCH_ITERS", "24"))
    prefixes = [
        ("raw_masks", lambda: p_raw(vh._stacked_fz, frames_d)),
        ("+ccl_cleanup", lambda: p_ccl(vh._stacked_fz, frames_d)),
        ("+finalize", lambda: p_fin(vh._stacked_fz, frames_d)),
        ("+carve(full)", p_full),
    ]
    prev = 0.0
    totals = {}
    for name, fn in prefixes:
        ms = marginal_ms(fn, sync, iters=iters)
        totals[name] = ms
        print(json.dumps({"prefix": name, "ms": round(ms, 3),
                          "stage_delta_ms": round(ms - prev, 3)}),
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
