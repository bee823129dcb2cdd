"""Pallas CCL labeler + scatter-free batched cleanup + packed wire format.

On CPU the batched cleanup routes to the XLA while-loop labeler (same
labels); the Pallas kernel itself is locked via interpret mode on a small
image.  Reference semantics: background_subtraction.py:171-193.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vbr_tpu.ops import ccl, ccl_pallas


def _noisy_mask(rng, H=96, W=128):
    """A figure + speckle noise + holes, like a raw GMM mask."""
    m = np.zeros((H, W), np.uint8)
    m[20:80, 30:90] = 255  # figure
    m[40:52, 50:62] = 0  # big hole
    m[28:31, 40:43] = 0  # small hole
    for _ in range(40):  # speckles
        y, x = rng.integers(0, H), rng.integers(0, W)
        m[y : y + 2, x : x + 2] = 255
    return m


class TestLabelerInterpret:
    def test_matches_xla_labeler_partition(self):
        rng = np.random.default_rng(0)
        m = _noisy_mask(rng) > 0
        pad = np.zeros((2, 96, 128), np.int32)
        pad[0] = m
        pad[1] = ~m
        got = np.asarray(
            ccl_pallas.label_components_batched(
                jnp.asarray(pad), interpret=True
            )
        )
        for b in range(2):
            ref = np.asarray(ccl.label_components(jnp.asarray(pad[b] > 0)))
            pairs = set(zip(ref.ravel().tolist(), got[b].ravel().tolist()))
            a = {}
            c = {}
            for x, y in pairs:
                a[x] = a.get(x, 0) + 1
                c[y] = c.get(y, 0) + 1
            assert all(v == 1 for v in a.values())
            assert all(v == 1 for v in c.values())


class TestCombinedLabelerInterpret:
    def test_matches_separate_labelings(self):
        """Combined-phase labels == separate fg/bg labelings, exactly."""
        rng = np.random.default_rng(3)
        masks = np.stack([_noisy_mask(rng) for _ in range(2)]) > 0
        comb = np.asarray(
            ccl_pallas.label_components_combined(
                jnp.asarray(masks.astype(np.int32)), interpret=True
            )
        )
        for b in range(2):
            for phase_img in (masks[b], ~masks[b]):
                ref = np.asarray(
                    ccl.label_components(jnp.asarray(phase_img))
                )
                got = np.where(phase_img, comb[b], 2**30)
                np.testing.assert_array_equal(got, ref)

    def test_checkerboard_worst_case(self):
        """Every pixel its own component in both phases (max resets)."""
        yy, xx = np.mgrid[:8, :128]
        ph = ((yy + xx) % 2).astype(np.int32)
        # single-pixel scan segments mean the min label travels one
        # diagonal step per iteration: needs ~H+W iters, not the default
        comb = np.asarray(
            ccl_pallas.label_components_combined(
                jnp.asarray(ph[None]), max_iters=256, interpret=True
            )
        )[0]
        # 8-connectivity: same-phase diagonal neighbors DO merge, so each
        # phase of a checkerboard is one big diagonal-connected component
        lin = (yy * 128 + xx).astype(np.int32)
        for val in (0, 1):
            sel = ph == val
            assert (comb[sel] == lin[sel].min()).all()


class TestBatchedCleanup:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_host_cleanup(self, seed):
        rng = np.random.default_rng(seed)
        raw = np.stack([_noisy_mask(rng) for _ in range(3)])
        fig = (900.0, 1200.0, 600.0)
        inner = (40.0, 80.0, 20.0)
        out, ovf = ccl.clean_masks_batched(jnp.asarray(raw), fig, inner)
        out = np.asarray(out)
        assert not np.asarray(ovf).any()
        for c in range(3):
            ref = ccl.clean_mask_host(raw[c], fig[c], inner[c])
            np.testing.assert_array_equal(out[c], ref)

    def test_cleanup_via_combined_kernel_interpret(self):
        """End-to-end cleanup through the combined Pallas labeler path
        (the TPU production route) matches the host oracle."""
        rng = np.random.default_rng(7)
        raw = _noisy_mask(rng)[None]
        out, ovf = ccl.clean_masks_batched(
            jnp.asarray(raw), (900.0,), (40.0,), interpret=True
        )
        assert not np.asarray(ovf).any()
        np.testing.assert_array_equal(
            np.asarray(out)[0], ccl.clean_mask_host(raw[0], 900.0, 40.0)
        )

    def test_overflow_flag(self):
        # hundreds of isolated speckles (8-connectivity keeps them apart
        # only with ≥2-px gaps): must flag overflow
        H, W = 64, 128
        yy, xx = np.mgrid[:H, :W]
        raw = (((yy % 3 == 0) & (xx % 3 == 0)) * 255).astype(np.uint8)
        _, ovf = ccl.clean_masks_batched(
            jnp.asarray(raw[None]), (5.0,), (2.0,), kf=64, kb=32
        )
        assert bool(np.asarray(ovf)[0])

    def test_run_table_overflow_flag(self):
        # comb: ONE component whose teeth put 32 fg + 32 bg = 64 combined
        # runs in each top row — exact (vs host) at the default per-row
        # run cap, overflow-flagged when the cap is squeezed below it
        H, W = 32, 128
        raw = np.zeros((H, W), np.uint8)
        raw[:, ::4] = 255  # teeth: 32 fg runs per row (+32 bg gaps)
        raw[-4:, :] = 255  # spine joins them into one component
        out, ovf = ccl.clean_masks_batched(
            jnp.asarray(raw[None]), (50.0,), (10.0,)
        )
        assert not bool(np.asarray(ovf)[0])
        np.testing.assert_array_equal(
            np.asarray(out)[0], ccl.clean_mask_host(raw, 50.0, 10.0)
        )
        _, ovf_small = ccl.clean_masks_batched(
            jnp.asarray(raw[None]), (50.0,), (10.0,), k_runs=16
        )
        assert bool(np.asarray(ovf_small)[0])

    def test_golden_masks_roundtrip(self, golden_masks):
        """Shipped golden masks: cleanup is idempotent-ish (already clean
        figures are kept; output matches the host path exactly)."""
        fig = (5000.0,) * 4
        inner = (115.0, 115.0, 175.0, 115.0)
        out, ovf = ccl.clean_masks_batched(
            jnp.asarray(golden_masks), fig, inner
        )
        out = np.asarray(out)
        assert not np.asarray(ovf).any()
        for c in range(4):
            ref = ccl.clean_mask_host(golden_masks[c], fig[c], inner[c])
            np.testing.assert_array_equal(out[c], ref)


class TestPackedWire:
    def test_pack_unpack_roundtrip(self, rig_cameras, golden_masks,
                                   first_frames):
        from vbr_tpu.ops import carve, carve_pallas
        from vbr_tpu.utils.config import GridConfig

        grid = GridConfig(nx=16, ny=16, nz=16)
        btab = carve_pallas.build_block_tables(
            rig_cameras, grid, (486, 644), sub=(8, 8, 8), sup=(1, 1, 1)
        )
        occ_b, col_b = carve_pallas.carve_blocked(
            jnp.asarray(golden_masks), jnp.asarray(first_frames[1]), btab,
            views_threshold=4, interpret=True, layout="blocked",
        )
        packed_k, ids, n_blocks, n_vox, cols, ovf = (
            carve_pallas.pack_blocked_outputs(
                occ_b, col_b, k_blocks=16, k_voxels=4096)
        )
        assert not bool(np.asarray(ovf))
        pos_p, rgb_p = carve_pallas.viewer_arrays_from_packed(
            packed_k, ids, n_blocks, n_vox, cols, btab, grid
        )
        pos_r, rgb_r = carve_pallas.compact_voxels_blocked(
            occ_b, col_b, btab, grid
        )
        np.testing.assert_array_equal(pos_p, pos_r)
        np.testing.assert_array_equal(rgb_p, rgb_r)

        wire = carve_pallas.encode_wire(
            packed_k, ids, n_blocks, n_vox, cols, jnp.int32(0)
        )
        (any_ovf, nb2, nv2, ids2, packed2,
         cols2) = carve_pallas.decode_wire(
            np.asarray(wire), 16, 4096)
        assert any_ovf == 0 and nb2 == int(np.asarray(n_blocks))
        assert nv2 == int(np.asarray(n_vox))
        np.testing.assert_array_equal(ids2, np.asarray(ids))
        np.testing.assert_array_equal(packed2, np.asarray(packed_k))
        np.testing.assert_array_equal(cols2, np.asarray(cols))
