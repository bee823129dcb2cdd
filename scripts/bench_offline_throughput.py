"""Offline batched fused-step throughput on the TPU.

Measures ms/frame of VisualHull's _full_step_frames device program (the
process_frames_offline chunk: batched mask stages over (frame, camera) +
frame-packed counts carve) at several frames_per_launch values, against
the single-frame fused step measured in the same run.  Prints one JSON
line per measurement.

Usage:  python scripts/bench_offline_throughput.py  (from /root/repo)
"""

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

    # NF genuinely distinct frame-sets from the production videos
    nf_max = 8
    per_cam = [
        vio.read_video(os.path.join(data_dir, f"cam{i}", "video.avi"),
                       max_frames=nf_max)
        for i in range(1, 5)
    ]
    frames_seq = np.stack(per_cam, axis=1)  # (NF, C, H, W, 3)

    def sync(out):
        np.asarray(out[0].ravel()[:1])

    # single-frame fused step in the same run (the latency path);
    # frames uploaded once — re-uploading per call would time the tunnel
    frame0_d = jnp.asarray(frames_seq[0])

    def step_one():
        return vhm._full_step_pallas(
            vh._stacked_fz, frame0_d,
            vh._btab.pk, vh._btab.lcc, vh._btab.vorig, vh._btab.uorig,
            vh._btab.allv, vh._btab.ry, vh._btab.rx,
            btab_static=vhm._btab_static(vh._btab),
            mask_params=vh._mask_params_t,
            use_hsv=vh.mog_params[0].use_hsv,
            fig_thresholds=vh._fig_thresholds,
            inner_thresholds=vh._inner_thresholds,
            views_threshold=vh.rig.views_threshold,
            layout="blocked",
        )

    ms1 = marginal_ms(step_one, sync, iters=12)
    print(json.dumps({"stage": "fused_step_single_frame",
                      "ms_per_frame": round(ms1, 3)}), flush=True)

    for nf in (2, 4, 8):
        chunk = jnp.asarray(frames_seq[:nf])

        def step_nf():
            return vhm._full_step_frames(
                vh._stacked_fz, chunk,
                vh._btab.pk, vh._btab.vorig, vh._btab.allv,
                vh._btab.ry, vh._btab.rx,
                btab_static=vhm._btab_static(vh._btab),
                mask_params=vh._mask_params_t,
                use_hsv=vh.mog_params[0].use_hsv,
                fig_thresholds=vh._fig_thresholds,
                inner_thresholds=vh._inner_thresholds,
                views_threshold=vh.rig.views_threshold,
            )

        # parity vs the per-frame table step on the first run
        occ_nf, ovf = step_nf()
        assert not np.asarray(ovf).any(), "unexpected CCL overflow on rig"
        ms = marginal_ms(step_nf, sync, iters=8)
        per = ms / nf
        print(json.dumps({
            "stage": f"offline_fused_frames{nf}",
            "ms_per_launch": round(ms, 3),
            "ms_per_frame": round(per, 3),
            "fps": round(1000.0 / per, 1),
        }), flush=True)

    # occupancy parity vs the single-frame fused pipeline (canonical)
    occ8, _ = vhm._full_step_frames(
        vh._stacked_fz, jnp.asarray(frames_seq),
        vh._btab.pk, vh._btab.vorig, vh._btab.allv,
        vh._btab.ry, vh._btab.rx,
        btab_static=vhm._btab_static(vh._btab),
        mask_params=vh._mask_params_t,
        use_hsv=vh.mog_params[0].use_hsv,
        fig_thresholds=vh._fig_thresholds,
        inner_thresholds=vh._inner_thresholds,
        views_threshold=vh.rig.views_threshold,
    )
    occ8 = np.asarray(occ8)
    mism = 0
    for f in range(nf_max):
        occ1, _, _ = vhm._full_step_pallas(
            vh._stacked_fz, jnp.asarray(frames_seq[f]),
            vh._btab.pk, vh._btab.lcc, vh._btab.vorig, vh._btab.uorig,
            vh._btab.allv, vh._btab.ry, vh._btab.rx,
            btab_static=vhm._btab_static(vh._btab),
            mask_params=vh._mask_params_t,
            use_hsv=vh.mog_params[0].use_hsv,
            fig_thresholds=vh._fig_thresholds,
            inner_thresholds=vh._inner_thresholds,
            views_threshold=vh.rig.views_threshold,
            layout="canonical",
        )
        mism += int((np.asarray(occ1) != occ8[f]).sum())
    print(json.dumps({"stage": "offline_vs_single_parity",
                      "mismatched_voxels": mism, "frames": nf_max}),
          flush=True)
    if mism:
        sys.exit(1)


if __name__ == "__main__":
    main()
