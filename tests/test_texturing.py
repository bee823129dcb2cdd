"""Textured hull: depth maps + nearest-non-occluded-camera coloring."""

import numpy as np
import pytest

from vbr_tpu.ops import carve, texturing
from vbr_tpu.utils import synthetic
from vbr_tpu.utils.config import GridConfig

GRID = GridConfig(
    nx=24, ny=24, nz=24,
    x_min=-900, x_max=1100, y_min=-1050, y_max=950, z_min=-1700, z_max=300,
)


@pytest.fixture(scope="module")
def scene():
    cams, masks, frames = synthetic.synthetic_rig()
    # make each camera's frame a distinct solid color for attribution
    for c in range(4):
        frames[c] = 0
        frames[c, :, :, c % 3] = 200 + c * 10
    ptab = carve.build_projection_tables(cams, GRID, (486, 644))
    ttab = texturing.build_texturing_tables(cams, GRID, (486, 644))
    import jax.numpy as jnp

    occ, _ = carve.carve_from_tables(
        jnp.asarray(masks), jnp.asarray(frames), ptab.valid, ptab.lin_idx
    )
    return cams, masks, frames, ttab, np.asarray(occ)


class TestDepthMaps:
    def test_depth_maps_sane(self, scene):
        import jax.numpy as jnp

        cams, masks, frames, ttab, occ = scene
        dm = np.asarray(
            texturing.depth_maps(
                jnp.asarray(occ), ttab.valid, ttab.lin_idx, ttab.depth,
                image_hw=(486, 644),
            )
        )
        finite = dm < 1e30
        assert finite.any(axis=1).all(), "every camera sees the sphere"
        # depths must be within the plausible camera-distance range
        vals = dm[finite]
        assert 2000 < vals.min() < vals.max() < 8000

    def test_depth_map_matches_bruteforce(self, scene):
        import jax.numpy as jnp

        cams, masks, frames, ttab, occ = scene
        dm = np.asarray(
            texturing.depth_maps(
                jnp.asarray(occ), ttab.valid, ttab.lin_idx, ttab.depth,
                image_hw=(486, 644),
            )
        )
        c = 0
        valid = np.asarray(ttab.valid[c]) & occ
        lin = np.asarray(ttab.lin_idx[c])[valid]
        dep = np.asarray(ttab.depth[c])[valid]
        # brute force scatter-min over a sample of pixels
        for px in np.unique(lin)[:50]:
            expected = dep[lin == px].min()
            assert abs(dm[c, px] - expected) < 1e-3


class TestTexturedColors:
    def test_front_voxels_use_front_camera(self, scene):
        import jax.numpy as jnp

        cams, masks, frames, ttab, occ = scene
        colors, cam_choice = texturing.textured_colors(
            jnp.asarray(occ), jnp.asarray(frames),
            ttab.valid, ttab.lin_idx, ttab.depth, image_hw=(486, 644),
        )
        cam_choice = np.asarray(cam_choice)
        colors = np.asarray(colors)
        assert (cam_choice[occ] >= 0).all()
        # all 4 cameras should be chosen for some voxels (sphere seen all
        # around)
        used = set(np.unique(cam_choice[occ]).tolist())
        assert used == {0, 1, 2, 3}, f"cameras used: {used}"
        # voxels attributed to camera c must carry camera c's color
        for c in range(4):
            sel = occ & (cam_choice == c)
            if sel.sum() == 0:
                continue
            expected = frames[c].reshape(-1, 3).max(0)
            got = colors[sel]
            assert (got.max(0) == expected).all()

    def test_chosen_camera_is_nearest_visible(self, scene):
        import jax.numpy as jnp

        cams, masks, frames, ttab, occ = scene
        _, cam_choice = texturing.textured_colors(
            jnp.asarray(occ), jnp.asarray(frames),
            ttab.valid, ttab.lin_idx, ttab.depth, image_hw=(486, 644),
        )
        cam_choice = np.asarray(cam_choice)
        depth = np.asarray(ttab.depth)
        # sample occupied voxels: chosen camera depth <= other visible
        # cameras' depths (within tolerance semantics)
        idxs = np.flatnonzero(occ)[:: max(1, occ.sum() // 200)]
        dm = np.asarray(
            texturing.depth_maps(
                jnp.asarray(occ), ttab.valid, ttab.lin_idx, ttab.depth,
                image_hw=(486, 644),
            )
        )
        lin = np.asarray(ttab.lin_idx)
        valid = np.asarray(ttab.valid)
        for v in idxs:
            c = cam_choice[v]
            vis = [
                k
                for k in range(4)
                if valid[k, v]
                and depth[k, v] <= dm[k, lin[k, v]] + 40.0
            ]
            if vis:
                assert c in vis
                assert depth[c, v] == min(depth[k, v] for k in vis)
