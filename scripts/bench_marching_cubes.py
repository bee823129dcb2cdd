"""On-chip timing of the marching-cubes surface extraction.

The viewer's surface mode (M key) re-extracts the hull isosurface after
every carve (reference analog: voxel_reconstruction.py:127-163 via the
commented assignment.py:134-147 block), so extraction latency matters for
interactivity.  This times `extract_mesh` end-to-end (device passes +
host compaction/concat) on the REAL rig hull at 128³ for both algorithms,
and separates the device-emit cost from the host tail.

Usage:  python scripts/bench_marching_cubes.py         (rig hull, 128³)
        python scripts/bench_marching_cubes.py 256      (synthetic sphere)
Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp

    from vbr_tpu.ops import marching_cubes as mc

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    if n:  # synthetic sphere at a larger grid (extraction-scaling mode)
        ax = np.arange(n, dtype=np.float32) - (n - 1) / 2
        r2 = (ax[:, None, None] ** 2 + ax[None, :, None] ** 2
              + ax[None, None, :] ** 2)
        volume = r2 < (0.42 * n) ** 2
        tag = f"{n}_sphere"
    else:  # the real rig hull at the production 128³ grid
        import cv2

        from vbr_tpu.ops import carve
        from vbr_tpu.pipelines import reconstruction
        from vbr_tpu.utils.config import GridConfig, RigConfig

        data_dir = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
        grid, rig = GridConfig(), RigConfig()
        cameras = reconstruction.load_rig(data_dir)
        masks, frames = [], []
        for i in range(1, 5):
            m = cv2.imread(
                os.path.join(data_dir, f"cam{i}", "mask_MOG.jpg"), 0)
            masks.append((m > 127).astype(np.uint8) * 255)
            cap = cv2.VideoCapture(
                os.path.join(data_dir, f"cam{i}", "video.avi"))
            ok, f = cap.read()
            cap.release()
            frames.append(f)
        H, W = masks[0].shape
        tables = carve.build_projection_tables(cameras, grid, (H, W))
        occ, _ = carve.carve_from_tables(
            jnp.asarray(np.stack(masks)), jnp.asarray(np.stack(frames)),
            tables.valid, tables.lin_idx,
            views_threshold=rig.views_threshold,
            color_camera=rig.color_camera,
        )
        volume = np.asarray(occ).reshape(grid.shape)
        tag = "128"
    np.asarray(jnp.zeros((8,)))  # session warm
    n_occ = int(volume.sum())

    # sphere mode: host_table only (the per-cell device pass at ~200k
    # active cells costs seconds/rep and its 128³ number already stands)
    emits = ("host_table",) if n else ("host_table", "device")
    for algorithm in ("tetrahedra", "cubes"):
        for emit in emits:
            # warm (compile cached across runs via the persistent cache)
            tris, nt = mc.extract_mesh(volume, algorithm=algorithm,
                                       emit=emit)
            reps = int(os.environ.get("VBR_MC_REPS", "3" if n else "10"))
            t0 = time.perf_counter()
            for _ in range(reps):
                tris, nt = mc.extract_mesh(
                    volume, algorithm=algorithm, emit=emit)
            ms = (time.perf_counter() - t0) / reps * 1e3
            print(json.dumps({
                "metric": f"marching_cubes_{tag}_{algorithm}_{emit}_ms",
                "value": round(ms, 2),
                "unit": "ms (end-to-end incl. host tail)",
                "triangles": int(nt),
                "occupied_voxels": n_occ,
            }))
            sys.stdout.flush()

    # device-emit marginal alone (the repeated per-carve cost once the
    # active set is known): one 65536-cell pass on the hull's active cells
    mask_bits = np.asarray(jnp.packbits(
        mc.active_cells_mask(jnp.asarray(volume)).reshape(-1)))
    idx = np.flatnonzero(np.unpackbits(
        mask_bits, count=int(np.prod([s - 1 for s in volume.shape]))))
    cap_n = 65536
    padded = np.zeros(cap_n, np.int64)
    padded[: min(len(idx), cap_n)] = idx[:cap_n]
    cells = jnp.asarray(padded)
    vol_d = jnp.asarray(volume)

    from scripts._timing import marginal_ms

    tet_table = mc.table_emitter("tetrahedra", "separate", 0.5)
    mc_table = mc.table_emitter("cubes", "separate", 0.5)
    cases = [
        ("tetrahedra", lambda: mc._emit_triangles(
            vol_d, cells, capacity=cap_n), 12),
        ("cubes", lambda: mc._emit_triangles_mc(
            vol_d, cells, capacity=cap_n, ambiguity="separate", level=0.5),
         12),
        ("tetrahedra_table", lambda: tet_table(
            vol_d, cells, capacity=cap_n), 96),
        ("cubes_table", lambda: mc_table(
            vol_d, cells, capacity=cap_n), 96),
    ]
    if n:  # sphere mode: table emitters only (see emits note above)
        cases = cases[2:]
    for algorithm, emit_fn, iters in cases:
        ms = marginal_ms(emit_fn, iters=iters, pairs=3, warmup=2)
        print(json.dumps({
            "metric": f"mc_device_emit_{tag}_{algorithm}_ms",
            "value": round(ms, 2),
            "unit": "ms (one device emit pass, marginal)",
            "cells_in_pass": int(min(len(idx), cap_n)),
            "active_cells_total": int(len(idx)),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
