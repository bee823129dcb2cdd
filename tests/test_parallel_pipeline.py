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
        mesh, frames_b, weight, mean, var, 0.9, tables.valid, tables.lin_idx
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
    a = np.sort(tris_s.reshape(n_s, -1), axis=0)
    b = np.sort(tris_r.reshape(n_r, -1), axis=0)
    np.testing.assert_allclose(a, b, atol=1e-6)
