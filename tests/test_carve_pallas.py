"""Blocked Pallas carve kernel vs the float64 table path (interpret mode).

The compiled-on-TPU path is exercised by bench.py and scripts; interpret
mode locks the kernel's arithmetic (one-hot matmul gather, bit packing,
2^-b exponent trick, color panels) bit-exactly in CI.
"""

import numpy as np
import pytest

from vbr_tpu.ops import carve, carve_pallas
from vbr_tpu.utils.config import GridConfig


@pytest.fixture(scope="module")
def small_setup(rig_cameras, golden_masks, first_frames):
    grid = GridConfig(nx=16, ny=16, nz=16)
    tables = carve.build_projection_tables(rig_cameras, grid, (486, 644))
    btab = carve_pallas.build_block_tables(
        rig_cameras, grid, (486, 644), sub=(8, 8, 8), sup=(1, 1, 1)
    )
    return grid, tables, btab


class TestBlockedKernel:
    def test_occupancy_and_colors_bit_exact(
        self, small_setup, golden_masks, first_frames
    ):
        import jax.numpy as jnp

        grid, tables, btab = small_setup
        occ_p, col_p = carve_pallas.carve_blocked(
            jnp.asarray(golden_masks), jnp.asarray(first_frames[1]), btab,
            views_threshold=4, interpret=True,
        )
        occ_t, col_t = carve.carve_from_tables(
            jnp.asarray(golden_masks), jnp.asarray(first_frames),
            tables.valid, tables.lin_idx, views_threshold=4, color_camera=1,
        )
        occ_p, col_p = np.asarray(occ_p), np.asarray(col_p)
        occ_t, col_t = np.asarray(occ_t), np.asarray(col_t)
        np.testing.assert_array_equal(occ_p, occ_t)
        assert occ_p.sum() > 0
        np.testing.assert_array_equal(col_p[occ_t], col_t[occ_t])

    def test_threshold_3(self, small_setup, golden_masks, first_frames):
        import jax.numpy as jnp

        grid, tables, btab = small_setup
        occ_p, _ = carve_pallas.carve_blocked(
            jnp.asarray(golden_masks), jnp.asarray(first_frames[1]), btab,
            views_threshold=3, interpret=True,
        )
        occ_t, _ = carve.carve_from_tables(
            jnp.asarray(golden_masks), jnp.asarray(first_frames),
            tables.valid, tables.lin_idx, views_threshold=3, color_camera=1,
        )
        np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_t))

    def test_packing_helpers_exact(self, golden_masks, first_frames):
        import jax.numpy as jnp

        packed = np.asarray(
            carve_pallas.pack_masks(
                jnp.asarray(golden_masks), Hp=536, n_words=81
            )
        ).astype(np.float64)
        # unpack word 0 of row 0, cam 0 and compare to the mask bits
        bits = (golden_masks[0, 0, :8] > 0).astype(np.int64)
        expected = (bits * (2 ** np.arange(8))).sum()
        assert packed[0, 0, 0] == expected

        planes = np.asarray(
            carve_pallas.pack_image(jnp.asarray(first_frames[1]), Hp=536, Wc=768)
        )
        assert planes.shape == (2, 3, 536, 768)
        np.testing.assert_array_equal(
            planes[0, :, :486, :644].astype(np.uint8),
            np.transpose(first_frames[1], (2, 0, 1)),
        )
        # shifted copy property: copy1[:, :, x] == copy0[:, :, x+64]
        np.testing.assert_array_equal(
            planes[1, :, :486, : 644 - 64], planes[0, :, :486, 64:644]
        )


class TestMultiFrameKernel:
    """Multi-frame batched counts kernel (offline throughput path)."""

    def test_occupancy_matches_tables_per_frame(
        self, small_setup, golden_masks, first_frames
    ):
        import jax.numpy as jnp

        grid, tables, btab = small_setup
        # 3 distinct frames: golden masks, a shifted copy, and an eroded one
        m0 = golden_masks
        m1 = np.roll(golden_masks, 25, axis=2)
        m2 = golden_masks.copy()
        m2[:, ::3] = 0
        masks_f = np.stack([m0, m1, m2])
        imgs = np.stack([first_frames[1]] * 3)

        occ = np.asarray(carve_pallas.carve_frames_blocked(
            jnp.asarray(masks_f), btab,
            views_threshold=4, frames_per_launch=2,  # exercises padding
            interpret=True,
        ))
        total = 0
        for f in range(3):
            occ_t, col_t = carve.carve_from_tables(
                jnp.asarray(masks_f[f]),
                jnp.asarray(np.stack([first_frames[1]] * 4)),
                tables.valid, tables.lin_idx,
                views_threshold=4, color_camera=1,
            )
            occ_t = np.asarray(occ_t)
            np.testing.assert_array_equal(occ[f], occ_t)
            # host color gather at occupied voxels == table-path colors
            idx, col = carve_pallas.frame_colors_host(
                occ[f], imgs[f], np.asarray(tables.lin_idx), color_camera=1
            )
            np.testing.assert_array_equal(col, np.asarray(col_t)[idx])
            total += occ_t.sum()
        assert total > 0

    def test_threshold_3_multiframe(self, small_setup, golden_masks,
                                    first_frames):
        import jax.numpy as jnp

        grid, tables, btab = small_setup
        masks_f = np.stack([golden_masks, golden_masks])
        imgs = np.stack([first_frames[1]] * 2)
        occ = carve_pallas.carve_frames_blocked(
            jnp.asarray(masks_f), btab,
            views_threshold=3, frames_per_launch=2, interpret=True,
        )
        occ_t, _ = carve.carve_from_tables(
            jnp.asarray(golden_masks),
            jnp.asarray(np.stack([first_frames[1]] * 4)),
            tables.valid, tables.lin_idx, views_threshold=3, color_camera=1,
        )
        np.testing.assert_array_equal(np.asarray(occ[0]), np.asarray(occ_t))
        np.testing.assert_array_equal(np.asarray(occ[1]), np.asarray(occ_t))


def test_accelerated_block_tables_exact(rig_cameras):
    """accelerate=True block tables == pure-f64 block tables (32³)."""
    import numpy as np

    g = GridConfig(nx=32, ny=32, nz=32)
    a = carve_pallas.build_block_tables(
        rig_cameras, g, (486, 644), sub=(8, 8, 8), sup=(2, 2, 2),
        accelerate=True,
    )
    b = carve_pallas.build_block_tables(
        rig_cameras, g, (486, 644), sub=(8, 8, 8), sup=(2, 2, 2),
        accelerate=False,
    )
    for name in ("pk", "lcc", "vorig", "uorig", "allv"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )
    for name in ("ry", "rx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name), dtype=np.float32),
            np.asarray(getattr(b, name), dtype=np.float32),
            err_msg=name,
        )
    assert (a.WH, a.WC, a.Hp, a.Wc) == (b.WH, b.WC, b.Hp, b.Wc)
    assert a.n_fcells_hw == b.n_fcells_hw

    # the chunked path (what a 512³ build exercises): tiny chunk_voxels
    # forces multiple (camera, chunk) folds through the same buffers
    c = carve_pallas.build_block_tables_device(
        rig_cameras, g, (486, 644), sub=(8, 8, 8), sup=(2, 2, 2),
        chunk_voxels=4096,
    )
    for name in ("pk", "lcc", "vorig", "uorig", "allv"):
        np.testing.assert_array_equal(
            np.asarray(getattr(c, name)), np.asarray(getattr(b, name)),
            err_msg="chunked " + name,
        )
    for name in ("ry", "rx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(c, name), dtype=np.float32),
            np.asarray(getattr(b, name), dtype=np.float32),
            err_msg="chunked " + name,
        )
    assert (c.WH, c.WC, c.Hp, c.Wc) == (b.WH, b.WC, b.Hp, b.Wc)


def test_full_interior_blocks_exact(rig_cameras, first_frames):
    """Provably-full interior shortcut: giant foreground regions make
    hull-interior sub-blocks skip compute; occupancy must stay
    bit-identical to the table path and the fast path must actually
    fire."""
    import jax.numpy as jnp

    grid = GridConfig(nx=16, ny=16, nz=16)
    tables = carve.build_projection_tables(rig_cameras, grid, (486, 644))
    btab = carve_pallas.build_block_tables(
        rig_cameras, grid, (486, 644), sub=(8, 8, 8), sup=(1, 1, 1)
    )
    # nearly-all-foreground masks → interior blocks provably full
    masks = np.full((4, 486, 644), 255, np.uint8)
    masks[:, :4] = 0  # keep a border of background

    active, full = carve_pallas._block_activity(
        jnp.asarray(masks), 4, btab.allv, btab.ry, btab.rx,
    )
    assert int(np.asarray(full).sum()) > 0, "full fast path never fires"

    occ_p, col_p = carve_pallas.carve_blocked(
        jnp.asarray(masks), jnp.asarray(first_frames[1]), btab,
        views_threshold=4, interpret=True,
    )
    occ_t, col_t = carve.carve_from_tables(
        jnp.asarray(masks), jnp.asarray(first_frames),
        tables.valid, tables.lin_idx, views_threshold=4, color_camera=1,
    )
    occ_p, occ_t = np.asarray(occ_p), np.asarray(occ_t)
    np.testing.assert_array_equal(occ_p, occ_t)
    np.testing.assert_array_equal(
        np.asarray(col_p)[occ_t], np.asarray(col_t)[occ_t]
    )

    # threshold < C: full blocks still carry the exact count C
    occ_p3, _ = carve_pallas.carve_blocked(
        jnp.asarray(masks), jnp.asarray(first_frames[1]), btab,
        views_threshold=3, interpret=True,
    )
    occ_t3, _ = carve.carve_from_tables(
        jnp.asarray(masks), jnp.asarray(first_frames),
        tables.valid, tables.lin_idx, views_threshold=3, color_camera=1,
    )
    np.testing.assert_array_equal(np.asarray(occ_p3), np.asarray(occ_t3))

    # multi-frame path: intersection-full blocks shortcut per frame
    masks_f = np.stack([masks, masks, np.roll(masks, 30, axis=2)])
    occ_f = np.asarray(carve_pallas.carve_frames_blocked(
        jnp.asarray(masks_f), btab, views_threshold=4,
        frames_per_launch=2, interpret=True,
    ))
    for f in range(3):
        occ_tf, _ = carve.carve_from_tables(
            jnp.asarray(masks_f[f]), jnp.asarray(first_frames),
            tables.valid, tables.lin_idx, views_threshold=4, color_camera=1,
        )
        np.testing.assert_array_equal(occ_f[f], np.asarray(occ_tf))
