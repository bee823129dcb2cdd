"""Device-resident surface extraction (ops.marching_cubes.surface_program)
and the fused frame→mesh step (VisualHull.process_frame_surface).

Gates: surface_program's filtered triangles are BIT-IDENTICAL to
extract_mesh on the same volume (all algorithms/ambiguity rules), the
capacity-overflow signal fires, and the one-program frame→mesh step
reproduces extract_surface exactly on a synthetic rig.  Reference analog:
the offline skimage+matplotlib surface of voxel_reconstruction.py:127-163,
here as a streaming device program.
"""

import dataclasses

import numpy as np
import pytest

from vbr_tpu.ops import marching_cubes as mc
from vbr_tpu.pipelines import background
from vbr_tpu.utils import synthetic
from vbr_tpu.utils.config import (
    DEFAULT_MASK_PARAMS,
    GridConfig,
    MOGParams,
    RigConfig,
)


def _random_volume(seed, shape=(12, 10, 14), p=0.35):
    rng = np.random.default_rng(seed)
    return rng.uniform(size=shape) < p


@pytest.mark.parametrize(
    "algorithm,ambiguity",
    [("tetrahedra", "separate"), ("cubes", "separate"), ("cubes", "join")],
)
def test_surface_program_matches_extract_mesh(algorithm, ambiguity):
    vol = _random_volume(3)
    origin = (-512.0, -1024.0, -2048.0)
    spacing = (12.0, 16.0, 20.0)
    ref, n_ref = mc.extract_mesh(
        vol, origin=origin, spacing=spacing, algorithm=algorithm,
        ambiguity=ambiguity,
    )
    verts, valid, n_active = mc.surface_program(
        np.asarray(vol), algorithm=algorithm, ambiguity=ambiguity,
        capacity=2048,
    )
    assert int(n_active) <= 2048
    got = mc.world_triangles(verts, valid, origin, spacing)
    assert got.shape == (n_ref, 3, 3)
    np.testing.assert_array_equal(got, ref)  # bit-identical


def test_surface_program_empty_and_full():
    empty = np.zeros((6, 6, 6), bool)
    verts, valid, n_active = mc.surface_program(empty, capacity=64)
    assert int(n_active) == 0 and not np.asarray(valid).any()
    full = np.ones((6, 6, 6), bool)
    verts, valid, n_active = mc.surface_program(full, capacity=64)
    assert int(n_active) == 0 and not np.asarray(valid).any()


def test_surface_program_capacity_overflow_is_signaled():
    vol = _random_volume(11)
    ref, n_ref = mc.extract_mesh(vol, algorithm="tetrahedra")
    _, _, n_active = mc.surface_program(vol, capacity=8)
    assert int(n_active) > 8  # caller must redo via extract_mesh


def test_surface_program_block_overflow_is_signaled():
    """The r5 scatter-free compaction adds a second truncation mode:
    active cells spread over more than ``block_capacity`` 128-cell
    blocks.  The reported count must then exceed ``capacity`` so the
    callers' existing redo check fires, even though the true active
    count fits."""
    # 3 isolated cubes far apart along x → ≥3 distinct 128-cell blocks
    vol = np.zeros((40, 8, 8), bool)
    for x0 in (2, 16, 30):
        vol[x0 : x0 + 2, 2:4, 2:4] = True
    n_true = int(np.asarray(mc.active_cells_mask(np.asarray(vol))).sum())
    assert n_true <= 128
    _, _, n_rep = mc.surface_program(vol, capacity=128, block_capacity=2)
    assert int(n_rep) > 128  # forced above capacity → host redo
    # with enough blocks the same volume reports the true count and
    # matches the host path bit-identically
    verts, valid, n_ok = mc.surface_program(vol, capacity=128,
                                            block_capacity=64)
    assert int(n_ok) == n_true
    got = mc.world_triangles(verts, valid, (0, 0, 0), (1, 1, 1))
    ref, n_ref = mc.extract_mesh(vol, algorithm="tetrahedra")
    np.testing.assert_array_equal(got, ref)


H, W = 64, 96
C = 4


@pytest.fixture(scope="module")
def model_and_frame():
    from vbr_tpu.models.visual_hull import VisualHull

    cams = synthetic.synthetic_cameras(C, image_hw=(H, W), f=80.0)
    grid = GridConfig(
        nx=32, ny=32, nz=32,
        x_min=-900, x_max=1100, y_min=-1050, y_max=950,
        z_min=-1700, z_max=300,
    )
    mask_params = tuple(
        dataclasses.replace(p, figure_threshold=40.0, inner_threshold=8.0)
        for p in DEFAULT_MASK_PARAMS[:C]
    )
    model = VisualHull(
        cams, grid, RigConfig(image_height=H, image_width=W),
        mask_params=mask_params,
    )
    rng = np.random.default_rng(7)
    bg = rng.integers(0, 200, size=(C, 6, H, W, 3), dtype=np.uint8)
    p = MOGParams(history=6)
    model.bg_states = [
        background.train_background_model(bg[c], p) for c in range(C)
    ]
    model.mog_params = [p] * C
    frame = bg[:, 0].copy()
    frame[:, 14:44, 22:60] = 255
    return model, frame


@pytest.mark.parametrize(
    "algorithm,ambiguity", [("tetrahedra", "separate"), ("cubes", "join")]
)
def test_process_frame_surface_matches_extract_surface(
    model_and_frame, algorithm, ambiguity
):
    model, frame = model_and_frame
    tris, occ, col = model.process_frame_surface(
        frame, algorithm=algorithm, ambiguity=ambiguity, capacity=4096
    )
    occ_ref, col_ref = model.process_frame(frame)
    occ_ref = np.asarray(occ_ref)
    assert occ_ref.any(), "degenerate fixture: nothing carved"
    np.testing.assert_array_equal(np.asarray(occ), occ_ref)
    np.testing.assert_array_equal(
        np.asarray(col)[occ_ref], np.asarray(col_ref)[occ_ref]
    )
    ref_tris, n_ref = model.extract_surface(
        frame, algorithm=algorithm, ambiguity=ambiguity
    )
    assert len(tris) == n_ref > 0
    np.testing.assert_array_equal(tris, ref_tris)


def test_full_step_surface_pallas_interpret_matches_extract(model_and_frame):
    """The production Pallas composition of _full_step_surface (the branch
    CPU CI would otherwise never execute — conftest pins JAX_PLATFORMS=cpu
    so the model dispatch always takes the tables branch), run in Pallas
    interpret mode and gated bit-identically against extract_surface."""
    import jax.numpy as jnp

    from vbr_tpu.models import visual_hull as vhm

    model, frame = model_and_frame
    model._ensure_fast_state()
    model._ensure_btab()
    assert model._btab is not None  # 32³ grid is 8-divisible
    mc.table_emitter("cubes", "join", 0.5)
    verts, valid, n_active, occ, col, ovf = vhm._full_step_surface(
        model._stacked_fz, jnp.asarray(frame),
        model._btab.pk, model._btab.lcc, model._btab.vorig,
        model._btab.uorig, model._btab.allv, model._btab.ry,
        model._btab.rx, btab_static=vhm._btab_static(model._btab),
        mask_params=model._mask_params_t,
        use_hsv=model.mog_params[0].use_hsv,
        fig_thresholds=model._fig_thresholds,
        inner_thresholds=model._inner_thresholds,
        views_threshold=model.rig.views_threshold,
        grid_shape=model.grid.shape, algorithm="cubes", ambiguity="join",
        capacity=4096, interpret=True,
    )
    assert not bool(np.asarray(ovf).any())
    assert 0 < int(n_active) <= 4096
    origin, spacing = model._world_frame()
    tris = mc.world_triangles(verts, valid, origin, spacing)
    ref_tris, n_ref = model.extract_surface(
        frame, algorithm="cubes", ambiguity="join"
    )
    assert len(tris) == n_ref > 0
    np.testing.assert_array_equal(tris, ref_tris)


def test_process_frame_surface_capacity_fallback(model_and_frame):
    model, frame = model_and_frame
    # force the capacity fallback: still exact, via the host redo
    tris, occ, _ = model.process_frame_surface(frame, capacity=8)
    ref_tris, n_ref = model.extract_surface(frame)
    assert len(tris) == n_ref
    np.testing.assert_array_equal(tris, ref_tris)


def test_stream_surface_matches_per_frame(model_and_frame):
    model, frame = model_and_frame
    # 3 distinct frame-sets through the depth-2 pipeline
    f1 = frame.copy()
    f1[:, 18:48, 30:68] = 255
    f2 = frame.copy()
    f2[:, 8:50, 26:58] = 255
    frames = [frame, f1, f2]
    out = list(model.stream_surface(iter(frames), depth=2, capacity=4096))
    assert len(out) == 3
    for fr, (tris, occ) in zip(frames, out):
        ref_tris, ref_occ, _ = model.process_frame_surface(
            fr, algorithm="cubes", ambiguity="join", capacity=4096
        )
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref_occ))
        np.testing.assert_array_equal(tris, ref_tris)
    assert not np.array_equal(np.asarray(out[0][1]), np.asarray(out[2][1]))


@pytest.mark.parametrize(
    "algorithm,ambiguity",
    [("tetrahedra", "separate"), ("cubes", "join")],
)
def test_surface_wire_matches_extract_mesh(algorithm, ambiguity):
    """Wire-format extraction (device: cell ids + configs only; host:
    generated-table emission) is bit-identical to extract_mesh."""
    vol = _random_volume(9)
    origin = (-512.0, -1024.0, -2048.0)
    spacing = (12.0, 16.0, 20.0)
    ref, n_ref = mc.extract_mesh(vol, origin=origin, spacing=spacing,
                                 algorithm=algorithm, ambiguity=ambiguity)
    idx, cfg, n_active = mc.surface_wire_program(
        np.asarray(vol), capacity=2048)
    assert 0 < int(n_active) <= 2048
    tris = mc.triangles_from_wire(
        idx, cfg, n_active, vol.shape, origin, spacing,
        algorithm=algorithm, ambiguity=ambiguity)
    assert tris.shape == (n_ref, 3, 3)
    np.testing.assert_array_equal(tris, ref)


def test_stream_surface_wire_matches_full(model_and_frame):
    """transfer='wire' (cell ids + configs + packed occupancy over the
    link, host table emission) == transfer='full', bit-identical."""
    model, frame = model_and_frame
    f1 = frame.copy()
    f1[:, 18:48, 30:68] = 255
    frames = [frame, f1]
    full = list(model.stream_surface(iter(frames), depth=2,
                                     capacity=4096, transfer="full"))
    wire = list(model.stream_surface(iter(frames), depth=2,
                                     capacity=4096, transfer="wire"))
    assert len(full) == len(wire) == 2
    for (t_f, o_f), (t_w, o_w) in zip(full, wire):
        np.testing.assert_array_equal(t_w, t_f)
        np.testing.assert_array_equal(np.asarray(o_w),
                                      np.asarray(o_f))
    with pytest.raises(ValueError, match="transfer"):
        next(iter(model.stream_surface(iter(frames), transfer="zip")))


def test_stream_surface_wire_with_roi_ingest(model_and_frame):
    """transfer='wire' composed with ingest='yuv420_roi': the stream
    must equal the wire stream fed the host-reconstructed frames (the
    loss lives in the ingest format, never in the composition)."""
    from vbr_tpu.ops import color as color_ops
    from vbr_tpu.pipelines import background as bg

    model, frame = model_and_frame
    frames = [frame, frame.copy()]
    frames[1][:, 18:48, 30:68] = 255
    out = list(model.stream_surface(
        iter(frames), depth=2, capacity=4096, transfer="wire",
        ingest="yuv420_roi", roi_hw=(48, 64)))
    assert len(out) == 2
    # reference: reconstruct each frame the way the ingest does, then
    # run the plain wire stream on the reconstructions
    tracker = model._roi_tracker((48, 64))
    recon = []
    for fr in frames:
        mode, upload, roi_off = model._ingest_prepare(
            "yuv420_roi", tracker, fr)
        recon.append(model._ingest_reconstruct(mode, upload, roi_off))
    ref = list(model.stream_surface(
        iter(recon), depth=2, capacity=4096, transfer="wire"))
    for (t_a, o_a), (t_b, o_b) in zip(out, ref):
        np.testing.assert_array_equal(t_a, t_b)
        np.testing.assert_array_equal(np.asarray(o_a), np.asarray(o_b))
    assert len(out[1][0]) > 0


def test_native_wire_emit_matches_numpy():
    """The C++ wire-emission tail is bitwise identical to the numpy
    reference (same float op order); skip where the toolchain is absent."""
    try:
        from vbr_tpu.native import mc_emit  # noqa: F401
    except Exception:
        pytest.skip("native host lib unavailable")
    vol = _random_volume(21, shape=(14, 11, 13), p=0.4)
    idx, cfg, n = mc.surface_wire_program(np.asarray(vol), capacity=2048)
    n = int(n)
    assert n <= 2048
    tv, tvalid = mc._binary_emit_table("cubes", "join", 0.5)
    ref = mc._triangles_from_wire_numpy(
        np.asarray(idx), np.asarray(cfg), n, tv, tvalid,
        vol.shape[1] - 1, vol.shape[2] - 1,
        (-512.0, -1024.0, -2048.0), (12.0, 16.0, 20.0))
    got = mc.triangles_from_wire(
        idx, cfg, n, vol.shape, (-512.0, -1024.0, -2048.0),
        (12.0, 16.0, 20.0))
    np.testing.assert_array_equal(got, ref)
    assert len(got) > 0
