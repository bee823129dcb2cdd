"""Scaling benchmark: carve at 64^3 / 128^3 / 256^3 (+ optionally 512^3)
with 4 and 8 cameras (BASELINE configs 1-5).

Usage: python scripts/bench_scale.py [--grids 64,128,256] [--cams 4,8]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from vbr_tpu.ops import carve
    from vbr_tpu.utils import synthetic
    from vbr_tpu.utils.config import GridConfig

    grids = [int(g) for g in "64,128,256".split(",")]
    cams_list = [4, 8]
    for a in sys.argv:
        if a.startswith("--grids="):
            grids = [int(g) for g in a.split("=")[1].split(",")]
        if a.startswith("--cams="):
            cams_list = [int(c) for c in a.split("=")[1].split(",")]

    for n_cams in cams_list:
        cams, masks, frames = synthetic.synthetic_rig(num_cameras=n_cams)
        masks_d = jnp.asarray(masks)
        frames_d = jnp.asarray(frames)
        for g in grids:
            grid = GridConfig(nx=g, ny=g, nz=g)
            t0 = time.time()
            tables = carve.build_projection_tables(cams, grid, (486, 644))
            t_build = time.time() - t0

            def step():
                return carve.carve_from_tables(
                    masks_d, frames_d, tables.valid, tables.lin_idx,
                    views_threshold=n_cams, color_camera=1,
                    packed_colors=(g >= 512),
                )

            occ, col = step()
            _ = np.asarray(occ.ravel()[:1])
            iters = max(2, int(2e7 / grid.num_voxels))
            t0 = time.time()
            for _ in range(iters):
                occ, col = step()
            _ = np.asarray(occ.ravel()[:1])
            dt = (time.time() - t0) / iters
            print(
                f"grid {g}^3 x {n_cams} cams: {dt*1e3:8.2f} ms/frame "
                f"({grid.num_voxels * n_cams / dt / 1e9:6.2f} Gvoxel-tests/s) "
                f"[tables {t_build:.1f}s] occ={int(np.asarray(occ).sum())}",
                flush=True,
            )


if __name__ == "__main__":
    main()
