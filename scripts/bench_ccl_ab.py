"""A/B: per-camera-loop CCL stats tail vs the vmapped-batched tail.

Times both variants interleaved in one process on identical inputs with a
high-iteration marginal protocol (the tunnel's sync noise is ~ the signal
at default settings), and checks bit-identical outputs first.

Usage:  python scripts/bench_ccl_ab.py   (from /root/repo, axon)
"""
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from scripts._timing import marginal_ms as marginal_ms_hi  # noqa: E402,F401


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp
    from jax import lax

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
    np.asarray(jnp.zeros((8,)))

    raw_d = jax.device_put(background.raw_masks_batched_fz(
        vh._stacked_fz, frames_d, vh._mask_params_t, vh.mog_params[0].use_hsv
    ))
    fig_t = vh._fig_thresholds
    inner_t = vh._inner_thresholds

    # ---- OLD variant: the r4-early per-camera unrolled loop -------------
    @functools.partial(jax.jit, static_argnames=("fig_ts", "inner_ts"))
    def clean_old(raw, fig_ts, inner_ts):
        C, H, W = raw.shape
        Hp, Wp = ccl._pad_to_tiles(H, W)
        fg = raw > 0
        fg_p = jnp.pad(fg, ((0, 0), (0, Hp - H), (0, Wp - W)))
        bg_p = jnp.pad(~fg, ((0, 0), (0, Hp - H), (0, Wp - W)),
                       constant_values=True)
        comb = ccl_pallas.label_components_combined(fg_p)
        labs_f = jnp.where(fg_p, comb, ccl.BIG).reshape(C, Hp * Wp)
        labs_b = jnp.where(bg_p, comb, ccl.BIG).reshape(C, Hp * Wp)
        kf, kb = 512, 128
        k_keep, k_hole = 16, 64
        bidx = [np.arange(Wp), (H - 1) * Wp + np.arange(Wp),
                np.arange(Hp) * Wp, np.arange(Hp) * Wp + (W - 1)]
        if Hp > H:
            bidx.append(np.array([H * Wp]))
        elif Wp > W:
            bidx.append(np.array([W]))
        bidx_a = jnp.asarray(np.unique(np.concatenate(bidx)).astype(np.int32))
        outs, ovfs = [], []
        for c in range(C):
            Lf, Lb = labs_f[c], labs_b[c]
            roots_f, nf = ccl._compact_roots(Lf, kf)
            roots_b, nb = ccl._compact_roots(Lb, kb)
            eq_f = Lf[:, None] == roots_f[None, :]
            areas_f = jnp.sum(eq_f, axis=0)
            keep_f = (areas_f >= fig_ts[c]) & (roots_f >= 0)
            kroots, nkeep = ccl._subselect_roots(roots_f, keep_f, k_keep)
            kept_px = jnp.any(Lf[:, None] == kroots[None, :], axis=1)
            kept_adj = lax.reduce_window(
                kept_px.reshape(Hp, Wp).astype(jnp.int32), 0, lax.max,
                window_dimensions=(3, 3), window_strides=(1, 1),
                padding=((1, 1), (1, 1))).reshape(-1) > 0
            border_labels = jnp.take(Lb, bidx_a)
            outside_b = jnp.any(
                border_labels[:, None] == roots_b[None, :], axis=0)
            hroots, nhole = ccl._subselect_roots(
                roots_b, (roots_b >= 0) & ~outside_b, k_hole)
            eq_h = Lb[:, None] == hroots[None, :]
            areas_b = jnp.sum(eq_h, axis=0)
            touch_b = jnp.any(eq_h & kept_adj[:, None], axis=0)
            in_kept_hole = (hroots >= 0) & touch_b
            bgc = bg_p[c]
            labc = jnp.where(bgc.reshape(-1), Lb, ccl.BIG).reshape(Hp, Wp)
            ha, hb_ = bgc[:-1, :-1], bgc[:-1, 1:]
            hc_, hd = bgc[1:, :-1], bgc[1:, 1:]
            la, lb2 = labc[:-1, :-1], labc[:-1, 1:]
            lc2, ld = labc[1:, :-1], labc[1:, 1:]
            s2 = (ha.astype(jnp.int32) + hb_.astype(jnp.int32)
                  + hc_.astype(jnp.int32) + hd.astype(jnp.int32))
            diag2 = (ha & hd & ~hb_ & ~hc_) | (hb_ & hc_ & ~ha & ~hd)
            contrib4 = (jnp.where(s2 == 1, 1, 0)
                        + jnp.where((s2 == 2) & ~diag2, 2, 0)
                        + jnp.where(diag2, 2, 0)
                        + jnp.where(s2 == 3, 1, 0))
            blmin = jnp.minimum(jnp.minimum(la, lb2), jnp.minimum(lc2, ld))
            corner4_b = jnp.sum(
                jnp.where(blmin.reshape(-1)[:, None] == hroots[None, :],
                          contrib4.reshape(-1)[:, None], 0), axis=0)
            poly_area = (areas_b.astype(jnp.float32)
                         + corner4_b.astype(jnp.float32) * 0.25)
            fill_b = in_kept_hole & (poly_area < inner_ts[c])
            hole_white_px = jnp.any(eq_h & fill_b[None, :], axis=1)
            out = (kept_px | hole_white_px).reshape(Hp, Wp)[:H, :W]
            outs.append(jnp.where(out, jnp.uint8(255), jnp.uint8(0)))
            ovfs.append((nf > kf) | (nb > kb)
                        | (nkeep > k_keep) | (nhole > k_hole))
        return jnp.stack(outs), jnp.stack(ovfs)

    def sync(out):
        np.asarray(out[0].ravel()[:1])

    def step_old():
        return clean_old(raw_d, fig_t, inner_t)

    def step_new():
        return ccl.clean_masks_batched(raw_d, fig_t, inner_t)

    a = np.asarray(step_old()[0])
    b = np.asarray(step_new()[0])
    print(json.dumps({"stage": "exactness", "identical": bool((a == b).all())}))

    for rep in range(2):
        ms_old = marginal_ms_hi(step_old, sync)
        ms_new = marginal_ms_hi(step_new, sync)
        print(json.dumps({"rep": rep, "old_loop_ms": round(ms_old, 3),
                          "new_vmap_ms": round(ms_new, 3)}))


if __name__ == "__main__":
    main()
