"""Sharded PRODUCTION Pallas step == single-chip, bit-identical.

VERDICT r3 #1: the multi-chip path must run the production kernels.
These gates run the full fused program (frozen-GMM apply → morphology →
combined-phase Pallas CCL → blocked Pallas carve) under shard_map on the
8-device CPU mesh in Pallas interpret mode and require bitwise equality
with the single-chip pipeline (same kernels, same interpret mode) —
occupancy, colors, AND overflow flags.  Superblock padding (mesh shard
count not dividing nsuper) is exercised explicitly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbr_tpu.ops import carve_pallas, gmm, morphology
from vbr_tpu.ops import ccl as ccl_ops
from vbr_tpu.ops import color as color_ops
from vbr_tpu.parallel import carve_sharded, pallas_sharded
from vbr_tpu.utils import synthetic
from vbr_tpu.utils.config import DEFAULT_MASK_PARAMS, GridConfig

H, W = 64, 96
C = 4
KE = 2
FIG_THR = (40.0, 40.0, 60.0, 40.0)
INNER_THR = (8.0, 8.0, 12.0, 8.0)


def _rig(sup):
    cams = synthetic.synthetic_cameras(C, image_hw=(H, W), f=80.0)
    grid = GridConfig(
        nx=32, ny=32, nz=32,
        x_min=-900, x_max=1100, y_min=-1050, y_max=950,
        z_min=-1700, z_max=300,
    )
    btab = carve_pallas.build_block_tables(
        cams, grid, (H, W), sub=(8, 8, 8), sup=sup, color_camera=1,
    )
    return cams, grid, btab


def _synthetic_state_and_frames(frames_n, seed=0):
    """Frozen GMM state + frames engineered to give structured masks:
    background = state means, a moving bright square = foreground."""
    rng = np.random.default_rng(seed)
    bg = rng.integers(0, 200, size=(C, H, W, 3), dtype=np.uint8)
    frames = []
    for f in range(frames_n):
        fr = bg.copy()
        y0, x0 = 12 + 6 * f, 20 + 9 * f
        fr[:, y0 : y0 + 28, x0 : x0 + 30] = 255  # person stand-in
        fr[:, 5:9, 60:64] = 250  # small blob (below figure threshold)
        frames.append(fr)
    frames = np.stack(frames)  # (F, C, H, W, 3)

    hsv_bg = np.stack(
        [np.asarray(color_ops.bgr_to_hsv_u8(jnp.asarray(bg[c])))
         for c in range(C)]
    ).astype(np.float32)
    mean = np.zeros((C, H, W, KE, 3), np.float32)
    mean[:, :, :, 0, :] = hsv_bg
    mean[:, :, :, 1, :] = -1000.0  # never matches
    thr = np.full((C, H, W, KE), 3 * 12.0**2, np.float32)
    bcount = np.ones((C, H, W), np.int32)
    fz = gmm.FrozenMOGState(
        mean=jnp.asarray(mean), thr=jnp.asarray(thr),
        bcount=jnp.asarray(bcount),
    )
    return fz, frames


def _single_chip_reference(fz, frames_one, btab, mask_params):
    """The production single-chip fused step, interpret-mode kernels."""
    hsv = jnp.stack(
        [color_ops.bgr_to_hsv_u8(jnp.asarray(frames_one[c]))
         for c in range(C)]
    )

    raws = []
    for c in range(C):
        raw = gmm.apply_frozen_compressed(
            gmm.FrozenMOGState(
                mean=fz.mean[c], thr=fz.thr[c], bcount=fz.bcount[c]
            ),
            hsv[c],
        )
        mp = mask_params[c]
        if mp.opening_pre:
            raw = morphology.opening(raw, (3, 3))
        if mp.closing_pre:
            raw = morphology.closing(raw, (3, 3))
        raws.append(raw)
    raw = jnp.stack(raws)
    cleaned, ovf = ccl_ops.clean_masks_batched(
        raw, FIG_THR, INNER_THR, interpret=True
    )
    ms = []
    for c in range(C):
        m = cleaned[c]
        mp = mask_params[c]
        if mp.opening_post:
            m = morphology.opening(m, (2, 2))
        if mp.closing_post:
            m = morphology.closing(m, (2, 2))
        ms.append(jnp.where(m > 0, jnp.uint8(255), jnp.uint8(0)))
    masks = jnp.stack(ms)
    occ, col = carve_pallas.carve_blocked(
        masks, jnp.asarray(frames_one[1]), btab,
        views_threshold=4, interpret=True, layout="blocked",
    )
    return np.asarray(occ), np.asarray(col), np.asarray(ovf)


@pytest.mark.parametrize(
    "sup,frames_n,cam_ways,grid_ways,order_mode",
    [
        ((1, 1, 1), 1, 4, 2, None),  # nsuper=64, divides 8 evenly
        ((2, 2, 4), 1, 4, 2, None),  # nsuper=4 → padded to 8 (pad gate)
        ((1, 1, 1), 2, 2, 2, None),  # data axis + 2-camera shards
        ((1, 1, 1), 1, 4, 2, "strided"),  # balanced superblock order
        ((2, 2, 4), 1, 4, 2, "strided"),  # …with interleaved pad blocks
    ],
)
def test_sharded_production_step_bitwise(
    sup, frames_n, cam_ways, grid_ways, order_mode
):
    cams, grid, btab = _rig(sup)
    fz, frames = _synthetic_state_and_frames(frames_n)
    mask_params = DEFAULT_MASK_PARAMS[:C]

    mesh = carve_sharded.make_carve_mesh(
        frames_n * cam_ways * grid_ways, num_cameras=cam_ways,
        frame_batch=frames_n,
    )
    assert mesh.shape == {
        "data": frames_n, "cam": cam_ways, "grid": grid_ways,
    }

    order = None
    if order_mode is not None:
        order = pallas_sharded.superblock_order(
            btab.nsuper, cam_ways * grid_ways, order_mode
        )
    st = pallas_sharded.shard_block_tables(mesh, btab, order=order)
    step = pallas_sharded.sharded_production_step(
        mesh, st.local_static, use_hsv=True, views_threshold=4,
        interpret=True,
    )
    placed = pallas_sharded.place_production_inputs(
        mesh, frames, fz, FIG_THR, INNER_THR,
        pallas_sharded.mask_flags_array(mask_params),
    )
    occ_b, col_b, ovf = step(
        *placed, st.pk, st.lcc, st.vorig, st.uorig, st.allv, st.ry, st.rx
    )
    occ_b, col_b = pallas_sharded.unshuffle_blocked(
        occ_b, col_b, btab, st.order
    )
    occ_b = np.asarray(occ_b)
    col_b = np.asarray(col_b)
    ovf = np.asarray(ovf)

    any_fg = False
    for f in range(frames_n):
        occ_ref, col_ref, ovf_ref = _single_chip_reference(
            fz, frames[f], btab, mask_params
        )
        assert (occ_b[f] == occ_ref).all(), "occupancy diverged"
        assert (col_b[f] == col_ref).all(), "colors diverged"
        assert (ovf[f] == ovf_ref).all(), "overflow flags diverged"
        any_fg = any_fg or occ_ref.any()
    assert not ovf.any()  # the synthetic scene must not overflow tables
    assert any_fg, "degenerate test: nothing carved in any frame"


def test_padding_blocks_are_inert():
    """Padded superblocks must emit zero occupancy/colors."""
    cams, grid, btab = _rig((2, 2, 4))  # nsuper=4
    fz, frames = _synthetic_state_and_frames(1)
    mesh = carve_sharded.make_carve_mesh(8, num_cameras=4, frame_batch=1)
    st = pallas_sharded.shard_block_tables(mesh, btab)
    assert st.nsuper_pad == 8 and btab.nsuper == 4
    step = pallas_sharded.sharded_production_step(
        mesh, st.local_static, use_hsv=True, views_threshold=4,
        interpret=True,
    )
    placed = pallas_sharded.place_production_inputs(
        mesh, frames, fz, FIG_THR, INNER_THR,
        pallas_sharded.mask_flags_array(DEFAULT_MASK_PARAMS[:C]),
    )
    occ_b, col_b, _ = step(
        *placed, st.pk, st.lcc, st.vorig, st.uorig, st.allv, st.ry, st.rx
    )
    assert np.asarray(occ_b)[:, btab.nsuper :].sum() == 0
    assert np.asarray(col_b)[:, btab.nsuper :].sum() == 0


@pytest.mark.parametrize(
    "sup,nshards,order_mode",
    [
        ((1, 1, 1), 8, None),
        ((2, 2, 4), 3, None),
        ((1, 1, 1), 8, "strided"),
        ((1, 1, 1), 5, "cost"),  # pad interleaves under LPT too
    ],
)
def test_local_table_slice_union_is_exact(sup, nshards, order_mode):
    """Per-shard local programs (scripts/bench_sharded_production.py)
    tile the full carve exactly: union of slice outputs == full output —
    for every superblock→shard assignment mode."""
    cams, grid, btab = _rig(sup)
    fz, frames = _synthetic_state_and_frames(1)
    _, _, masks = (None, None, None)
    # masks straight from the single-chip reference's mask stage
    occ_full, col_full, _ = _single_chip_reference(
        fz, frames[0], btab, DEFAULT_MASK_PARAMS[:C]
    )
    # reconstruct the mask set the reference used (same stage, reused)
    hsv = jnp.stack(
        [color_ops.bgr_to_hsv_u8(jnp.asarray(frames[0][c]))
         for c in range(C)]
    )
    raws = []
    for c in range(C):
        raw = gmm.apply_frozen_compressed(
            gmm.FrozenMOGState(
                mean=fz.mean[c], thr=fz.thr[c], bcount=fz.bcount[c]
            ),
            hsv[c],
        )
        mp = DEFAULT_MASK_PARAMS[c]
        if mp.opening_pre:
            raw = morphology.opening(raw, (3, 3))
        if mp.closing_pre:
            raw = morphology.closing(raw, (3, 3))
        raws.append(raw)
    cleaned, _ = ccl_ops.clean_masks_batched(
        jnp.stack(raws), FIG_THR, INNER_THR, interpret=True
    )
    ms = []
    for c in range(C):
        m = cleaned[c]
        mp = DEFAULT_MASK_PARAMS[c]
        if mp.opening_post:
            m = morphology.opening(m, (2, 2))
        if mp.closing_post:
            m = morphology.closing(m, (2, 2))
        ms.append(jnp.where(m > 0, jnp.uint8(255), jnp.uint8(0)))
    masks = jnp.stack(ms)

    order = None
    if order_mode is not None:
        costs = None
        if order_mode == "cost":
            costs = pallas_sharded.superblock_costs(
                btab, np.asarray(masks), views_threshold=4
            )
        order = pallas_sharded.superblock_order(
            btab.nsuper, nshards, order_mode, costs=costs
        )

    occ_parts, col_parts = [], []
    for k in range(nshards):
        loc = pallas_sharded.local_table_slice(btab, k, nshards,
                                               order=order)
        o, cl = carve_pallas.carve_blocked(
            masks, jnp.asarray(frames[0][1]), loc,
            views_threshold=4, interpret=True, layout="blocked",
        )
        occ_parts.append(np.asarray(o))
        col_parts.append(np.asarray(cl))
    occ_u = np.concatenate(occ_parts, axis=0)[None]
    col_u = np.concatenate(col_parts, axis=0)[None]
    occ_u, col_u = pallas_sharded.unshuffle_blocked(
        occ_u, col_u, btab, order
    )
    assert (occ_u[0] == occ_full).all()
    assert (col_u[0] == col_full).all()


class TestSuperblockOrder:
    def test_modes_are_permutations(self):
        costs = np.arange(10, dtype=np.float64) ** 2
        for mode, c in (("contiguous", None), ("strided", None),
                        ("cost", costs)):
            order = pallas_sharded.superblock_order(10, 4, mode, costs=c)
            assert sorted(order.tolist()) == list(range(12))

    def test_strided_pattern(self):
        order = pallas_sharded.superblock_order(8, 4, "strided")
        np.testing.assert_array_equal(
            order, [0, 4, 1, 5, 2, 6, 3, 7]
        )  # shard k slice = ids ≡ k (mod 4)

    def test_cost_mode_balances_better_than_contiguous(self):
        rng = np.random.default_rng(0)
        # slab-concentrated costs, like a centered subject
        x = np.arange(64, dtype=np.float64)
        costs = np.exp(-((x - 30) ** 2) / 40.0) + 0.01 * rng.random(64)

        def imbalance(order, nshards=8):
            c = np.concatenate([costs, np.zeros(len(order) - 64)])
            per = c[order].reshape(nshards, -1).sum(axis=1)
            return per.max() / per.mean()

        contig = pallas_sharded.superblock_order(64, 8, "contiguous")
        lpt = pallas_sharded.superblock_order(64, 8, "cost", costs=costs)
        strided = pallas_sharded.superblock_order(64, 8, "strided")
        assert imbalance(lpt) < 1.02
        assert imbalance(strided) < 1.25
        assert imbalance(contig) > 2.0

    def test_cost_mode_validates_inputs(self):
        with pytest.raises(ValueError):
            pallas_sharded.superblock_order(8, 4, "cost")
        with pytest.raises(ValueError):
            pallas_sharded.superblock_order(
                8, 4, "cost", costs=-np.ones(8)
            )
        with pytest.raises(ValueError):
            pallas_sharded.superblock_order(8, 4, "nope")


class TestVisualHullShardedRunner:
    """User-facing seam: VisualHull.sharded_runner == single-chip step."""

    def _model(self):
        import dataclasses

        from vbr_tpu.models.visual_hull import VisualHull
        from vbr_tpu.pipelines import background
        from vbr_tpu.utils.config import MOGParams, RigConfig

        cams = synthetic.synthetic_cameras(C, image_hw=(H, W), f=80.0)
        grid = GridConfig(
            nx=32, ny=32, nz=32,
            x_min=-900, x_max=1100, y_min=-1050, y_max=950,
            z_min=-1700, z_max=300,
        )
        # small synthetic figure → scale the production area thresholds
        mask_params = tuple(
            dataclasses.replace(p, figure_threshold=40.0,
                                inner_threshold=8.0)
            for p in DEFAULT_MASK_PARAMS[:C]
        )
        model = VisualHull(
            cams, grid,
            RigConfig(image_height=H, image_width=W),
            mask_params=mask_params,
        )
        rng = np.random.default_rng(5)
        bg = rng.integers(0, 200, size=(C, 6, H, W, 3), dtype=np.uint8)
        p = MOGParams(history=6)
        model.bg_states = [
            background.train_background_model(bg[c], p) for c in range(C)
        ]
        model.mog_params = [p] * C
        frames = bg[:, 0].copy()
        frames[:, 14:44, 22:60] = 255  # person stand-in
        return model, np.stack([frames, frames])  # F=2 identical frames

    @pytest.mark.parametrize("order", ["strided", "cost"])
    def test_runner_matches_single_chip(self, order):
        from vbr_tpu.ops import carve_pallas as cpk

        model, frames = self._model()
        mesh = carve_sharded.make_carve_mesh(
            8, num_cameras=2, frame_batch=2
        )  # (data=2, cam=2, grid=2)
        run = model.sharded_runner(
            mesh, order=order,
            costing_frames=frames[0] if order == "cost" else None,
            interpret=True,
        )
        occ_b, col_b = run(frames)
        assert occ_b.shape[0] == 2

        masks0 = model.masks(frames[0])
        occ_ref, col_ref = cpk.carve_blocked(
            jnp.asarray(masks0), jnp.asarray(frames[0][1]),
            model._btab, views_threshold=4, interpret=True,
            layout="blocked",
        )
        assert np.asarray(occ_ref).sum() > 0, "degenerate: nothing carved"
        for f in range(2):  # identical input frames → identical outputs
            assert (occ_b[f] == np.asarray(occ_ref)).all()
            assert (col_b[f] == np.asarray(col_ref)).all()

    def test_runner_validates_inputs(self):
        model, frames = self._model()
        mesh = carve_sharded.make_carve_mesh(8, num_cameras=2,
                                             frame_batch=2)
        with pytest.raises(ValueError, match="costing_frames"):
            model.sharded_runner(mesh, order="cost", interpret=True)
        run = model.sharded_runner(mesh, interpret=True)
        with pytest.raises(ValueError, match="data-axis"):
            run(frames[:1])

    def test_runner_stream_matches_per_batch(self):
        """The sharded multi-frame streaming seam (VERDICT r4 #7): a
        data×grid sharded stream of batches through the depth-2 async
        pipeline is bit-identical to calling the runner per batch."""
        model, frames = self._model()
        # three distinct 2-frame batches
        b1 = frames.copy()
        b1[:, :, 18:48, 30:68] = 255
        b2 = frames.copy()
        b2[:, :, 8:50, 26:58] = 255
        batches = [frames, b1, b2]
        mesh = carve_sharded.make_carve_mesh(8, num_cameras=2,
                                             frame_batch=2)
        run = model.sharded_runner(mesh, interpret=True)
        ref = [run(b) for b in batches]
        out = list(run.stream(iter(batches), depth=2))
        assert len(out) == 3
        for (occ_s, col_s), (occ_r, col_r) in zip(out, ref):
            np.testing.assert_array_equal(occ_s, occ_r)
            np.testing.assert_array_equal(col_s, col_r)
        # distinct batches produced distinct hulls (guards a degenerate
        # fixture where the pipeline could echo one batch)
        assert not np.array_equal(out[0][0], out[2][0])

    def test_runner_rebalance_preserves_results(self):
        """Re-costing/re-placing mid-stream never changes outputs (order
        is exactness-free); it only moves superblocks between shards."""
        model, frames = self._model()
        mesh = carve_sharded.make_carve_mesh(
            8, num_cameras=2, frame_batch=2
        )
        runner = model.sharded_runner(
            mesh, order="contiguous", interpret=True, rebalance_every=1
        )
        occ_a, col_a = runner(frames)  # _runs 0 → no auto rebalance yet
        # explicit rebalance from the live frame (min_gain=0 forces the
        # re-place even when the predicted critical path ties)
        replaced = runner.rebalance(frames[0], min_gain=0.0)
        assert replaced
        assert runner.mode == "cost" and runner.costs is not None
        assert runner.imbalance() >= 1.0
        # table shards = cam × grid (the data axis replicates tables)
        assert len(runner.shard_costs()) == 4
        occ_b, col_b = runner(frames)  # also trips the auto-rebalance hook
        assert (occ_a == occ_b).all()
        assert (col_a == col_b).all()
