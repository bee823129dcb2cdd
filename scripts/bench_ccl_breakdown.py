"""Split the batched CCL cleanup cost: labeling kernel vs statistics.

Times, on the real rig's raw MOG masks (steady-state marginal ms):
  * ops.ccl_pallas.label_components_batched on the 8-image fg+bg batch
  * ops.ccl.clean_masks_batched end to end
  * the stats tail = difference

Usage:  python scripts/bench_ccl_breakdown.py   (from /root/repo, axon)
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_fused_step import marginal_ms  # noqa: E402


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp

    from vbr_tpu.models.visual_hull import VisualHull
    from vbr_tpu.ops import ccl, ccl_pallas
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

    frames = np.stack([
        vio.read_video(os.path.join(data_dir, f"cam{i}", "video.avi"),
                       max_frames=1)[0]
        for i in range(1, 5)
    ])
    frames_d = jnp.asarray(frames)
    np.asarray(jnp.zeros((8,)))  # warm the axon session

    raw_d = background.raw_masks_batched_fz(
        vh._stacked_fz, frames_d, vh._mask_params_t, vh.mog_params[0].use_hsv
    )

    def sync1(x):
        np.asarray(x.ravel()[:1])

    C, H, W = raw_d.shape
    Hp, Wp = ccl._pad_to_tiles(H, W)
    fg = raw_d > 0
    fg_p = jnp.pad(fg, ((0, 0), (0, Hp - H), (0, Wp - W)))
    bg_p = jnp.pad(~fg, ((0, 0), (0, Hp - H), (0, Wp - W)),
                   constant_values=True)
    batch = jnp.concatenate([fg_p, bg_p], axis=0).astype(jnp.int32)
    batch = jax.device_put(batch)

    def step_label():
        return ccl_pallas.label_components_batched(batch)

    ms_label = marginal_ms(step_label, sync1)
    print(json.dumps({"stage": "label_batched_8imgs",
                      "ms": round(ms_label, 3)}))

    # combined-phase kernel (the r3 production path): fg AND bg of each
    # camera in one program — compare labels for exactness, then time
    comb = ccl_pallas.label_components_combined(fg_p)
    ref = np.asarray(ccl_pallas.label_components_batched(batch))
    comb_h = np.asarray(comb)
    fg_h = np.asarray(fg_p)
    ok_f = (np.where(fg_h, comb_h, 2**30) == ref[:C]).all()
    ok_b = (np.where(~fg_h, comb_h, 2**30) == ref[C:]).all()
    print(json.dumps({"stage": "combined_exactness",
                      "fg": bool(ok_f), "bg": bool(ok_b)}))

    def step_combined():
        return ccl_pallas.label_components_combined(fg_p)

    ms_comb = marginal_ms(step_combined, sync1)
    print(json.dumps({"stage": "label_combined_4imgs",
                      "ms": round(ms_comb, 3)}))

    def step_full():
        return ccl.clean_masks_batched(
            raw_d, vh._fig_thresholds, vh._inner_thresholds)[0]

    ms_full = marginal_ms(step_full, sync1)
    print(json.dumps({"stage": "clean_masks_batched",
                      "ms": round(ms_full, 3)}))
    print(json.dumps({"stage": "stats_tail",
                      "ms": round(ms_full - ms_label, 3)}))


if __name__ == "__main__":
    main()
