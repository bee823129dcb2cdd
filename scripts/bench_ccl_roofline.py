"""CCL roofline (VERDICT r4 #5): back the per-stage cost claims with a
checkable ops/bytes floor, on the production rig masks.

The fused-step CCL cleanup splits into three stages (r4 measured ~1.0 ms
labeler + ~0.8 ms run tables + ~0.8 ms stats/paint for all 4 cameras).
This script grounds each:

  * labeler — counts the ACTUAL fixpoint iterations on the rig masks by
    replicating the combined-kernel update (diagonal neighbor-min + 4
    gated segmented scans) in numpy, then computes the pure-VPU floor:
    passes/iteration × pixels ÷ VPU rate.  The kernel is VMEM-resident
    (zero HBM traffic in the loop), so the VPU is the only roof.
  * run tables / stats — elementwise-compare op counts from the code
    (widths after the r5 touched-hole subselection), ÷ VPU rate, plus
    the HBM bound if every big intermediate materialized once.
  * measured — steady-state marginals of the label kernel alone and
    clean_masks_batched end to end on the real chip.

VPU rate: TPU v5e ≈ 4 vector ALUs × (8×128) lanes × 0.94 GHz ≈ 3.85e12
i32 ops/s (public "How to Scale Your Model" numbers); HBM ≈ 819 GB/s.

Usage (axon TPU, from /root/repo):  python scripts/bench_ccl_roofline.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import marginal_ms  # noqa: E402

VPU_OPS = 3.85e12  # i32 elementwise ops/s, TPU v5e (4 ALUs × 1024 lanes)
HBM_BPS = 819e9

BIG = 2**30


def emit(**kv):
    print(json.dumps(kv))
    sys.stdout.flush()


def _np_seg_min_scan(v, reset, axis, reverse):
    """Host replica of ccl_pallas._seg_min_scan (Hillis-Steele)."""
    size = v.shape[axis]
    r = reset.copy()
    d = 1
    while d < size:
        s = -d if reverse else d
        vs = np.roll(v, s, axis=axis)
        rs = np.roll(r, s, axis=axis)
        # fill vacated cells
        sl = [slice(None)] * v.ndim
        if s > 0:
            sl[axis] = slice(0, s)
        else:
            sl[axis] = slice(size + s, size)
        vs[tuple(sl)] = BIG
        rs[tuple(sl)] = 1
        v = np.where(r > 0, v, np.minimum(v, vs))
        r = np.maximum(r, rs)
        d *= 2
    return v


def combined_fixpoint_iters(ph):
    """Iterations the combined-phase kernel needs on this (H, W) phase
    image (identical update rule; the kernel's while_loop counts the
    same way: one final no-change iteration included)."""
    H, W = ph.shape
    ih, iw = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    labels = (ih * W + iw).astype(np.int64)

    def shift_ph(dy, dx):
        out = np.full_like(ph, -1)
        ys = slice(max(dy, 0), H + min(dy, 0))
        xs = slice(max(dx, 0), W + min(dx, 0))
        out[ys, xs] = ph[max(-dy, 0):H - max(dy, 0),
                         max(-dx, 0):W - max(dx, 0)]
        return out

    resets = {
        (1, False): (ph != shift_ph(0, 1)).astype(np.int64),
        (1, True): (ph != shift_ph(0, -1)).astype(np.int64),
        (0, False): (ph != shift_ph(1, 0)).astype(np.int64),
        (0, True): (ph != shift_ph(-1, 0)).astype(np.int64),
    }
    diags = [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    ph_d = [shift_ph(dy, dx) for dy, dx in diags]
    it = 0
    while True:
        it += 1
        nm = labels.copy()
        for phs, (dy, dx) in zip(ph_d, diags):
            sh = np.full_like(labels, BIG)
            ys = slice(max(dy, 0), H + min(dy, 0))
            xs = slice(max(dx, 0), W + min(dx, 0))
            sh[ys, xs] = labels[max(-dy, 0):H - max(dy, 0),
                                max(-dx, 0):W - max(dx, 0)]
            nm = np.minimum(nm, np.where(phs == ph, sh, BIG))
        l2 = _np_seg_min_scan(nm, resets[(1, False)], 1, False)
        l2 = _np_seg_min_scan(l2, resets[(1, True)], 1, True)
        l2 = _np_seg_min_scan(l2, resets[(0, False)], 0, False)
        l2 = _np_seg_min_scan(l2, resets[(0, True)], 0, True)
        if (l2 == labels).all():
            return it
        labels = l2


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
        vh._stacked_fz, frames_d, vh._mask_params_t,
        vh.mog_params[0].use_hsv,
    )
    raw = np.asarray(raw_d)
    C, H, W = raw.shape
    Hp, Wp = ccl._pad_to_tiles(H, W)
    HW = Hp * Wp

    # --- labeler iterations (host replica of the kernel update) ---------
    iters = []
    for c in range(C):
        ph = np.zeros((Hp, Wp), np.int64)
        ph[:H, :W] = raw[c] > 0
        iters.append(combined_fixpoint_iters(ph))
    emit(metric="labeler_fixpoint_iters", per_camera=iters)

    # --- analytic floors -------------------------------------------------
    # per-iteration elementwise passes over (Hp, Wp) i32 (counted from
    # ccl_pallas._make_combined_kernel):
    #   4 diagonal shifts (roll+fill ≈ 3) + phase-select + min  ≈ 4×5
    #   4 gated scans × log2 steps (row 10+10, col 9+9 at 512×768)
    #     × (shift 3 + gate extract 2 + min/select 2)            ≈ 38×7
    #   changed-reduce                                           ≈ 2
    row_steps = int(np.ceil(np.log2(Wp)))
    col_steps = int(np.ceil(np.log2(Hp)))
    passes_per_iter = 4 * 5 + 2 * (row_steps + col_steps) * 7 + 2
    lab_floor_ms = sum(
        passes_per_iter * it * HW / VPU_OPS for it in iters) * 1e3
    emit(metric="labeler_vpu_floor_ms", value=round(lab_floor_ms, 3),
         passes_per_iter=passes_per_iter,
         note="VMEM-resident: no HBM term")

    # run tables: 2 full builds (cnt+lab packs) + 1 counts-only build,
    # each a fused (Hp, Wp, 64) compare+select+add
    R = 64
    rt_ops = (2 + 2 + 1) * Hp * Wp * R * 3
    emit(metric="runtables_vpu_floor_ms",
         value=round(C * rt_ops / VPU_OPS * 1e3, 3),
         hbm_floor_ms=round(
             C * 5 * Hp * Wp * R * 4 / HBM_BPS * 1e3, 3),
         note="hbm term only if the (Hp,Wp,64) intermediates "
              "materialize; XLA fuses them into the reductions")

    # stats/paint big compares (widths after the r5 touched-hole
    # subselection; HR = Hp·64 run slots)
    HR = Hp * R
    stats_ops = 3 * (
        HR * 512        # roots_f one-hot compact
        + HR * 512      # areas_f
        + HR * 128      # roots_b
        + HW * 16       # kept_px
        + HR * 64       # eq_hr touch
        + HR * 32       # eq_tr areas
        + HW * 32       # corner pass
        + HW * 32       # fill paint
        + HW * 9        # kept_adj reduce_window
    )
    emit(metric="stats_vpu_floor_ms",
         value=round(C * stats_ops / VPU_OPS * 1e3, 3))

    # --- measured --------------------------------------------------------
    fg = raw_d > 0
    fg_p = jnp.pad(fg, ((0, 0), (0, Hp - H), (0, Wp - W)))

    def step_label():
        return (ccl_pallas.label_components_combined(fg_p),)

    ms_label = marginal_ms(step_label, iters=24)
    emit(metric="labeler_measured_ms", value=round(ms_label, 3),
         vs_floor=round(ms_label / lab_floor_ms, 2))

    FIG = tuple(float(p.figure_threshold) for p in vh.mask_params)
    INNER = tuple(float(p.inner_threshold) for p in vh.mask_params)

    def step_clean():
        return (ccl.clean_masks_batched(raw_d, FIG, INNER)[0],)

    out, ovf = ccl.clean_masks_batched(raw_d, FIG, INNER)
    assert not bool(np.asarray(ovf).any())
    # exactness vs host path on the real masks
    for c in range(C):
        ref = ccl.clean_mask_host(raw[c], FIG[c], INNER[c])
        np.testing.assert_array_equal(np.asarray(out[c]), ref)
    ms_clean = marginal_ms(step_clean, iters=16)
    emit(metric="clean_e2e_measured_ms", value=round(ms_clean, 3),
         stats_tail_ms=round(ms_clean - ms_label, 3))


if __name__ == "__main__":
    main()
