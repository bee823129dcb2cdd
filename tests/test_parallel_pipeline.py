"""Sharded full pipeline step + sharded marching-cubes halo exchange."""

import jax
import numpy as np
import pytest

from vbr_tpu.ops import carve, gmm, marching_cubes as mc
from vbr_tpu.parallel import carve_sharded, mesh_sharded, pipeline_sharded
from vbr_tpu.utils.config import GridConfig, MOGParams


def test_sharded_full_step_matches_reference(rig_cameras, golden_masks,
                                             first_frames):
    grid = GridConfig(nx=16, ny=16, nz=16)
    tables = carve.build_projection_tables(rig_cameras, grid, (486, 644))
    mesh = carve_sharded.make_carve_mesh(8, num_cameras=4, frame_batch=2)

    # tiny trained-ish GMM state: one strong mixture at the frame value →
    # mask = zero everywhere; second frame perturbed → foreground regions
    H, W, K = 486, 644, 4
    rng = np.random.default_rng(0)
    base = first_frames.astype(np.float32)  # (C, H, W, 3) as HSV stand-in
    weight = np.zeros((4, H, W, K), np.float32)
    weight[..., 0] = 1.0
    mean = np.zeros((4, H, W, K, 3), np.float32)
    mean[..., 0, :] = base
    var = np.full((4, H, W, K), 225.0, np.float32)

    frames_b = np.stack([first_frames, np.roll(first_frames, 40, axis=2)])

    step = pipeline_sharded.sharded_pipeline_step(mesh, views_threshold=4)
    args = pipeline_sharded.place_pipeline_inputs(
        mesh, frames_b, weight, mean, var, tables.valid, tables.lin_idx
    )
    occ = np.asarray(step(*args))
    assert occ.shape == (2, grid.num_voxels)
    # frame 0 equals the model means → empty masks → nothing carved
    assert occ[0].sum() == 0
    # frame 1 is shifted → foreground appears somewhere
    # (not asserting voxels: depends on geometry; assert at mask level via
    # a single-device replication of the same math)
    state0 = gmm.MOGState(
        weight=__import__("jax.numpy", fromlist=["asarray"]).asarray(weight[0]),
        mean=__import__("jax.numpy", fromlist=["asarray"]).asarray(mean[0]),
        var=__import__("jax.numpy", fromlist=["asarray"]).asarray(var[0]),
        nframes=__import__("jax.numpy", fromlist=["asarray"]).asarray(10),
    )
    p = MOGParams(use_hsv=False, n_mixtures=K)
    raw = np.asarray(gmm.apply_frozen(state0, frames_b[1][0], p))
    assert (raw > 0).sum() > 0


def test_sharded_marching_cubes_matches_single(rig_cameras):
    from jax.sharding import Mesh

    vol = np.zeros((32, 20, 20), bool)
    g = np.arange(32)[:, None, None]
    vol[(np.abs(g - 15) < 8) & (np.arange(20)[None, :, None] % 19 > 3)
        & (np.arange(20)[None, None, :] > 6)] = True

    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, axis_names=("grid",))
    tris_s, n_s = mesh_sharded.extract_mesh_sharded(vol, mesh)
    tris_r, n_r = mc.extract_mesh(vol)
    assert n_s == n_r
    # on-shard emission preserves the exact global cell order → soup is
    # bit-identical, not just set-equal
    np.testing.assert_array_equal(tris_s, tris_r)


def test_sharded_step_with_cleanup_matches_single_device(rig_cameras,
                                                         first_frames):
    """clean=True inserts the contour-hierarchy cleanup shard-locally;
    sharded occupancy == a single-device replication of the same math."""
    import jax.numpy as jnp

    from vbr_tpu.ops import ccl

    grid = GridConfig(nx=16, ny=16, nz=16)
    tables = carve.build_projection_tables(rig_cameras, grid, (486, 644))
    mesh = carve_sharded.make_carve_mesh(8, num_cameras=4, frame_batch=2)

    H, W, K = 486, 644, 4
    base = first_frames.astype(np.float32)
    weight = np.zeros((4, H, W, K), np.float32)
    weight[..., 0] = 1.0
    mean = np.zeros((4, H, W, K, 3), np.float32)
    mean[..., 0, :] = base
    var = np.full((4, H, W, K), 225.0, np.float32)
    frames_b = np.stack([first_frames, np.roll(first_frames, 40, axis=2)])
    fig_thr = np.full(4, 5000.0)
    inner_thr = np.full(4, 115.0)

    step = pipeline_sharded.sharded_pipeline_step(
        mesh, views_threshold=4, clean=True)
    args = pipeline_sharded.place_pipeline_inputs(
        mesh, frames_b, weight, mean, var, tables.valid, tables.lin_idx,
        fig_thr=fig_thr, inner_thr=inner_thr)
    occ = np.asarray(step(*args))

    # single-device replication: apply + 3x3 opening + cleanup + carve
    from vbr_tpu.ops import morphology
    p = MOGParams(use_hsv=False, n_mixtures=K)
    occ_ref = []
    for f in range(2):
        masks = []
        for c in range(4):
            st = gmm.MOGState(
                weight=jnp.asarray(weight[c]), mean=jnp.asarray(mean[c]),
                var=jnp.asarray(var[c]), nframes=jnp.asarray(10))
            raw = gmm.apply_frozen(st, frames_b[f][c], p)
            raw = morphology.opening(raw, (3, 3))
            cleaned = ccl.clean_mask(raw, fig_thr[c], inner_thr[c])
            masks.append(np.asarray(cleaned))
        occ_f, _ = carve.carve_from_tables(
            jnp.asarray(np.stack(masks)), jnp.asarray(frames_b[f]),
            tables.valid, tables.lin_idx, views_threshold=4,
            color_camera=1)
        occ_ref.append(np.asarray(occ_f))
    np.testing.assert_array_equal(occ, np.stack(occ_ref))


def test_sharded_marching_cubes_classic_mc_matches_single():
    """algorithm='cubes' (classic 256-case) shards bit-identically too."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(11)
    vol = rng.uniform(size=(16, 12, 12)) < 0.4
    vol[0] = vol[-1] = False

    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, axis_names=("grid",))
    tris_s, n_s = mesh_sharded.extract_mesh_sharded(
        vol, mesh, algorithm="cubes")
    tris_r, n_r = mc.extract_mesh(vol, algorithm="cubes")
    assert n_s == n_r
    np.testing.assert_array_equal(tris_s, tris_r)


def test_sharded_marching_cubes_capacity_overflow_recovers():
    from jax.sharding import Mesh

    vol = np.zeros((16, 12, 12), bool)
    vol[4:12, 2:10, 2:10] = True  # 8×8×8 solid box

    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, axis_names=("grid",))
    # capacity 8 per shard is far too small: the overflow path must
    # detect via counts and re-run with a larger capacity
    tris_s, n_s = mesh_sharded.extract_mesh_sharded(vol, mesh, capacity=8)
    tris_r, n_r = mc.extract_mesh(vol)
    assert n_s == n_r
    np.testing.assert_array_equal(tris_s, tris_r)


def test_sharded_marching_cubes_scaled_coords():
    from jax.sharding import Mesh

    vol = np.zeros((16, 10, 10), bool)
    vol[3:12, 2:8, 3:9] = True
    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, axis_names=("grid",))
    tris_s, _ = mesh_sharded.extract_mesh_sharded(
        vol, mesh, origin=(10, 20, 30), spacing=(2, 2, 2)
    )
    tris_r, _ = mc.extract_mesh(vol, origin=(10, 20, 30), spacing=(2, 2, 2))
    np.testing.assert_array_equal(tris_s, tris_r)


@pytest.mark.slow
def test_sharded_marching_cubes_256(rig_cameras):
    """VERDICT r1 item 6 gate: sharded == single-device at 256³."""
    from jax.sharding import Mesh

    n = 256
    g = np.arange(n, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    vol = ((x - 128) ** 2 + (y - 120) ** 2 + (z - 136) ** 2) < 100.0**2

    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, axis_names=("grid",))
    tris_s, n_s = mesh_sharded.extract_mesh_sharded(vol, mesh, capacity=32768)
    tris_r, n_r = mc.extract_mesh(vol)
    assert n_s == n_r
    np.testing.assert_array_equal(tris_s, tris_r)


def test_sharded_step_occupancy_equals_single_device(rig_cameras):
    """The sharded pipeline step's masks use the REAL apply_frozen —
    occupancy must equal a single-device replication exactly."""
    import jax.numpy as jnp

    from vbr_tpu.utils.config import MOGParams

    grid = GridConfig(nx=16, ny=16, nz=16)
    tables = carve.build_projection_tables(rig_cameras, grid, (486, 644))
    mesh = carve_sharded.make_carve_mesh(8, num_cameras=4, frame_batch=2)

    H, W, K = 486, 644, 4
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (4, H, W, 3)).astype(np.float32)
    weight = np.zeros((4, H, W, K), np.float32)
    weight[..., 0] = 0.7
    weight[..., 1] = 0.3
    mean = rng.uniform(0, 255, (4, H, W, K, 3)).astype(np.float32)
    mean[..., 0, :] = base
    var = rng.uniform(100, 700, (4, H, W, K)).astype(np.float32)
    frames_b = np.stack(
        [base.astype(np.uint8), np.roll(base.astype(np.uint8), 60, axis=2)]
    )

    p = MOGParams(use_hsv=False, n_mixtures=K)
    step = pipeline_sharded.sharded_pipeline_step(
        mesh, views_threshold=4, mog_params=p
    )
    args = pipeline_sharded.place_pipeline_inputs(
        mesh, frames_b, weight, mean, var,
        tables.valid, tables.lin_idx,
    )
    occ_sharded = np.asarray(step(*args))

    # single-device replication: production apply_frozen + the same 3×3
    # opening + table carve
    import jax

    for f in range(2):
        masks = []
        for c in range(4):
            st = gmm.MOGState(
                weight=jnp.asarray(weight[c]), mean=jnp.asarray(mean[c]),
                var=jnp.asarray(var[c]),
                nframes=jnp.zeros((), jnp.int32),
            )
            raw = gmm.apply_frozen(st, jnp.asarray(frames_b[f, c]), p)
            fg = (np.asarray(raw) > 0).astype(np.int32)
            er = -jax.lax.reduce_window(
                -jnp.asarray(fg), -1, jax.lax.max, (3, 3), (1, 1),
                ((1, 1), (1, 1)),
            )
            di = jax.lax.reduce_window(
                er, 0, jax.lax.max, (3, 3), (1, 1), ((1, 1), (1, 1))
            )
            masks.append((np.asarray(di) > 0).astype(np.uint8) * 255)
        occ_ref, _ = carve.carve_from_tables(
            jnp.asarray(np.stack(masks)),
            jnp.zeros((4, H, W, 3), jnp.uint8),
            tables.valid, tables.lin_idx, views_threshold=4, color_camera=1,
        )
        np.testing.assert_array_equal(occ_sharded[f], np.asarray(occ_ref))
