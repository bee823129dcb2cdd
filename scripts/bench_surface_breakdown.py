"""Stage breakdown of the device surface program (r5 perf work).

`_full_step_surface` was measured at 26.6 ms/frame in r4 while the fused
occupancy step alone is ~4.6 ms and the MXU table emission ~1.8 ms — so
~20 ms hides in the dense config grid + fixed-capacity compaction
(`ops.marching_cubes.surface_program`).  This script isolates, as
steady-state marginals on the real chip:

  * cell_configs alone (dense shifted adds over 127³ cells);
  * configs + active mask + jnp.nonzero(size=capacity) compaction;
  * the emit stage alone (precomputed idx);
  * the full surface_program;
  * candidate compaction strategies (for A/B while optimizing).

Usage (axon TPU, from /root/repo):  python scripts/bench_surface_breakdown.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import marginal_ms  # noqa: E402


def emit(**kv):
    print(json.dumps(kv))
    sys.stdout.flush()


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import functools

    import jax.numpy as jnp

    from vbr_tpu.ops import carve, marching_cubes as mc
    from vbr_tpu.pipelines import reconstruction
    from vbr_tpu.utils.config import GridConfig, RigConfig

    data_dir = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
    grid = GridConfig()
    rig = RigConfig()
    import cv2

    cameras = reconstruction.load_rig(data_dir)
    masks, frames = [], []
    for i in range(1, 5):
        m = cv2.imread(os.path.join(data_dir, f"cam{i}", "mask_MOG.jpg"), 0)
        masks.append((m > 127).astype(np.uint8) * 255)
        cap = cv2.VideoCapture(os.path.join(data_dir, f"cam{i}", "video.avi"))
        ok, f = cap.read()
        cap.release()
        frames.append(f)
    masks = np.stack(masks)
    frames = np.stack(frames)
    H, W = masks.shape[1:3]
    tables = carve.build_projection_tables(cameras, grid, (H, W))
    occ, col = carve.carve_from_tables(
        jnp.asarray(masks), jnp.asarray(frames), tables.valid,
        tables.lin_idx, views_threshold=rig.views_threshold,
        color_camera=rig.color_camera,
    )
    vol = jnp.asarray(np.asarray(occ).reshape(grid.shape))
    capacity = 32768

    cfg_fn = jax.jit(lambda v: mc.cell_configs(v, level=0.5))
    ms = marginal_ms(lambda: (cfg_fn(vol),), iters=32)
    emit(metric="cell_configs_ms", value=round(ms, 3))

    @jax.jit
    def cfg_nonzero(v):
        cfg_flat = mc.cell_configs(v, level=0.5).reshape(-1).astype(jnp.int32)
        active = (cfg_flat != 0) & (cfg_flat != 255)
        n_active = jnp.sum(active.astype(jnp.int32))
        (idx,) = jnp.nonzero(active, size=capacity, fill_value=0)
        return idx, n_active

    idx_d, n_active = cfg_nonzero(vol)
    emit(metric="active_cells", value=int(n_active))
    ms = marginal_ms(lambda: (cfg_nonzero(vol)[0],), iters=16)
    emit(metric="cfg_plus_nonzero_ms", value=round(ms, 3))

    emit_fn = mc.table_emitter("cubes", "join", 0.5)

    @jax.jit
    def emit_only(v, idx):
        cfg_flat = mc.cell_configs(v, level=0.5).reshape(-1).astype(jnp.int32)
        return emit_fn(v, idx, capacity=capacity, cfg_flat=cfg_flat)[0]

    ms = marginal_ms(lambda: (emit_only(vol, idx_d),), iters=16)
    emit(metric="cfg_plus_emit_ms", value=round(ms, 3))

    surf = functools.partial(
        mc.surface_program, algorithm="cubes", ambiguity="join",
        capacity=capacity,
    )
    ms = marginal_ms(lambda: (surf(vol)[0],), iters=16)
    emit(metric="surface_program_ms", value=round(ms, 3))


if __name__ == "__main__":
    main()
