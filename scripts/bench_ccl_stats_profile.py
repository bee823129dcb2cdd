"""Micro-profile the CCL statistics tail (everything after the labeler).

`clean_masks_batched` = combined-phase Pallas labeler (~0.6 ms) + a
statistics tail measured at ~2.4 ms on chip (r4).  This times each
ingredient of the tail in the production (per-camera unrolled) form with
a high-iteration marginal protocol (iters=64, the tunnel's sync noise is
~ the signal at the default iters=12), on the real rig's labels.

Usage:  python scripts/bench_ccl_stats_profile.py   (from /root/repo, axon)
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_ccl_ab import marginal_ms_hi  # noqa: E402


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
    np.asarray(jnp.zeros((8,)))  # warm the axon session

    raw_d = background.raw_masks_batched_fz(
        vh._stacked_fz, frames_d, vh._mask_params_t, vh.mog_params[0].use_hsv
    )
    C, H, W = raw_d.shape
    Hp, Wp = ccl._pad_to_tiles(H, W)
    fg = raw_d > 0
    fg_p = jnp.pad(fg, ((0, 0), (0, Hp - H), (0, Wp - W)))
    bg_p = jax.device_put(jnp.pad(
        ~fg, ((0, 0), (0, Hp - H), (0, Wp - W)), constant_values=True))
    comb = ccl_pallas.label_components_combined(fg_p)
    labs_f = jax.device_put(
        jnp.where(fg_p, comb, ccl.BIG).reshape(C, Hp * Wp))
    labs_b = jax.device_put(
        jnp.where(~fg_p.astype(bool), comb, ccl.BIG).reshape(C, Hp * Wp))

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    kf, kb, k_keep, k_hole = 512, 128, 16, 64
    fig_t = vh._fig_thresholds
    inner_t = vh._inner_thresholds

    bidx = [np.arange(Wp), (H - 1) * Wp + np.arange(Wp),
            np.arange(Hp) * Wp, np.arange(Hp) * Wp + (W - 1)]
    if Hp > H:
        bidx.append(np.array([H * Wp]))
    elif Wp > W:
        bidx.append(np.array([W]))
    bidx_a = jnp.asarray(np.unique(np.concatenate(bidx)).astype(np.int32))

    # ---- stage functions (per-camera unrolled, like production) ---------
    @jax.jit
    def f_compact(Lf, Lb):
        out = []
        for c in range(C):
            out.append(ccl._compact_roots(Lf[c], kf))
            out.append(ccl._compact_roots(Lb[c], kb))
        return out

    compacted = f_compact(labs_f, labs_b)
    roots_f = jax.device_put(jnp.stack([compacted[2 * c][0]
                                        for c in range(C)]))
    roots_b = jax.device_put(jnp.stack([compacted[2 * c + 1][0]
                                        for c in range(C)]))

    @jax.jit
    def f_compact_f_only(Lf):
        return [ccl._compact_roots(Lf[c], kf) for c in range(C)]

    @jax.jit
    def f_cumsum_only(Lf):
        # the compaction's cumsum alone (per camera, fg table)
        outs = []
        for c in range(C):
            iota = jnp.arange(Lf[c].shape[0], dtype=jnp.int32)
            is_root = (Lf[c] == iota) & (Lf[c] < ccl.BIG)
            outs.append(jnp.cumsum(is_root.astype(jnp.int32))[-1])
        return outs

    @jax.jit
    def f_areas(Lf, rf):
        return [jnp.sum(Lf[c][:, None] == rf[c][None, :], axis=0)
                for c in range(C)]

    areas_f = jax.device_put(jnp.stack(f_areas(labs_f, roots_f)))

    @jax.jit
    def f_kept(Lf, rf, af):
        outs = []
        for c in range(C):
            keep = (af[c] >= fig_t[c]) & (rf[c] >= 0)
            kroots, _ = ccl._subselect_roots(rf[c], keep, k_keep)
            kept_px = jnp.any(Lf[c][:, None] == kroots[None, :], axis=1)
            kept_adj = lax.reduce_window(
                kept_px.reshape(Hp, Wp).astype(jnp.int32), 0, lax.max,
                window_dimensions=(3, 3), window_strides=(1, 1),
                padding=((1, 1), (1, 1))).reshape(-1) > 0
            outs.append((kept_px, kept_adj))
        return outs

    kept = f_kept(labs_f, roots_f, areas_f)
    kept_adj = jax.device_put(jnp.stack([k[1] for k in kept]))

    @jax.jit
    def f_holes(Lb, rb):
        outs = []
        for c in range(C):
            border_labels = jnp.take(Lb[c], bidx_a)
            outside = jnp.any(
                border_labels[:, None] == rb[c][None, :], axis=0)
            outs.append(ccl._subselect_roots(
                rb[c], (rb[c] >= 0) & ~outside, k_hole)[0])
        return outs

    hroots = jax.device_put(jnp.stack(f_holes(labs_b, roots_b)))

    @jax.jit
    def f_hole_stats(Lb, hr, kadj):
        outs = []
        for c in range(C):
            eq_h = Lb[c][:, None] == hr[c][None, :]
            outs.append((jnp.sum(eq_h, axis=0),
                         jnp.any(eq_h & kadj[c][:, None], axis=0)))
        return outs

    @jax.jit
    def f_corner(bgp, Lb, hr):
        outs = []
        for c in range(C):
            bgc = bgp[c]
            labc = jnp.where(bgc.reshape(-1), Lb[c], ccl.BIG).reshape(Hp, Wp)
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
            outs.append(jnp.sum(
                jnp.where(blmin.reshape(-1)[:, None] == hr[c][None, :],
                          contrib4.reshape(-1)[:, None], 0), axis=0))
        return outs

    stages = [
        ("compact_fg512+bg128_4cam", lambda: f_compact(labs_f, labs_b)),
        ("compact_fg512_only_4cam", lambda: f_compact_f_only(labs_f)),
        ("cumsum_only_4cam", lambda: f_cumsum_only(labs_f)),
        ("areas_fg_HWx512_4cam", lambda: f_areas(labs_f, roots_f)),
        ("keptpx_HWx16+window_4cam",
         lambda: f_kept(labs_f, roots_f, areas_f)),
        ("hole_roots_border_4cam", lambda: f_holes(labs_b, roots_b)),
        ("hole_stats_HWx64x2_4cam",
         lambda: f_hole_stats(labs_b, hroots, kept_adj)),
        ("corner_HWx64_weighted_4cam",
         lambda: f_corner(bg_p, labs_b, hroots)),
    ]
    for name, fn in stages:
        fn()  # compile
    for name, fn in stages:
        ms = marginal_ms_hi(fn, sync)
        print(json.dumps({"stage": name, "ms": round(ms, 3)}))

    def step_full():
        return ccl.clean_masks_batched(raw_d, fig_t, inner_t)[0]

    ms_full = marginal_ms_hi(step_full, lambda x: np.asarray(x.ravel()[:1]))
    print(json.dumps({"stage": "clean_masks_batched_e2e",
                      "ms": round(ms_full, 3)}))


if __name__ == "__main__":
    main()
