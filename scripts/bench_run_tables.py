"""Micro-profile the row-run-table stats tail (ops.ccl._row_run_tables).

Times, per 4-camera rig on the real raw masks:
  * _row_run_tables fg+bg (the two packed (Hp, Wp, R) reductions)
  * run-table areas (Hp·R × kf weighted compare)
  * old full-width pixel areas (H·W × kf) for comparison
  * clean_masks_batched end to end

Usage:  python scripts/bench_run_tables.py   (from /root/repo, axon)
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
    fg_p = jax.device_put(jnp.pad(fg, ((0, 0), (0, Hp - H), (0, Wp - W))))
    bg_p = jax.device_put(jnp.pad(
        ~fg, ((0, 0), (0, Hp - H), (0, Wp - W)), constant_values=True))
    comb = ccl_pallas.label_components_combined(fg_p)
    labs_f = jax.device_put(
        jnp.where(fg_p, comb, ccl.BIG).reshape(C, Hp * Wp))
    labs_b = jax.device_put(
        jnp.where(~fg_p.astype(bool), comb, ccl.BIG).reshape(C, Hp * Wp))

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    R, kf = 64, 512

    @jax.jit
    def f_runtabs(fgp, Lf, Lb):
        out = []
        for c in range(C):
            lab2d = jnp.where(fgp[c].reshape(-1), Lf[c],
                              Lb[c]).reshape(Hp, Wp)
            out.append(ccl._row_run_tables(fgp[c], lab2d, R))
        return out

    tabs = f_runtabs(fg_p, labs_f, labs_b)
    lens_f = jax.device_put(jnp.stack([tabs[c][0] for c in range(C)]))
    labt_f = jax.device_put(jnp.stack([tabs[c][1] for c in range(C)]))
    root_f = jax.device_put(jnp.stack(
        [tabs[c][2] & tabs[c][3] for c in range(C)]))

    @jax.jit
    def f_runtab_extra(fgp, Lf, Lb, extra):
        out = []
        for c in range(C):
            lab2d = jnp.where(fgp[c].reshape(-1), Lf[c],
                              Lb[c]).reshape(Hp, Wp)
            out.append(ccl._row_run_tables(fgp[c], lab2d, R,
                                           extra2d=extra[c])[4])
        return out

    @jax.jit
    def f_areas_runs(lt, ln, rt):
        out = []
        for c in range(C):
            roots, _ = ccl._onehot_compact(
                lt[c].reshape(-1), rt[c].reshape(-1), kf)
            out.append(jnp.sum(
                jnp.where(lt[c].reshape(-1)[:, None] == roots[None, :],
                          ln[c].reshape(-1)[:, None], 0), axis=0))
        return out

    @jax.jit
    def f_areas_pixels(Lf):
        out = []
        for c in range(C):
            roots, _ = ccl._compact_roots(Lf[c], kf)
            out.append(jnp.sum(Lf[c][:, None] == roots[None, :], axis=0))
        return out

    fig_t = vh._fig_thresholds
    inner_t = vh._inner_thresholds

    stages = [
        ("runtabs_combined_4cam", lambda: f_runtabs(fg_p, labs_f, labs_b)),
        ("runtabs_extra_4cam",
         lambda: f_runtab_extra(fg_p, labs_f, labs_b, fg_p)),
        ("areas_from_runs_4cam",
         lambda: f_areas_runs(labt_f, lens_f, root_f)),
        ("areas_from_pixels_4cam(old)", lambda: f_areas_pixels(labs_f)),
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
