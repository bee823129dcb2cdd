"""On-chip timing for the fused frame→mesh step (r4 late addition).

Measures, as steady-state marginals on the real chip:

  * the fused per-frame pipeline alone (_full_step_pallas, canonical
    layout) — the baseline the surface stage is added to;
  * the fused frame→SURFACE program (_full_step_surface: the same
    pipeline + dense config grid + fixed-capacity compaction +
    generated-table MXU emission), for both mesh algorithms;
  * the end-to-end mesh latency over the tunnel (program + verts/valid
    pull + host filter/world placement), vs the previous best
    (process_frame_fast occupancy pull + extract_mesh host table path).

Prints one JSON line per measurement.  Usage (axon TPU, from /root/repo):
    python scripts/bench_fused_surface.py
"""

import json
import os
import sys
import time

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
    import cv2
    import jax.numpy as jnp  # noqa: F401

    from vbr_tpu.models import visual_hull as vhm
    from vbr_tpu.models.visual_hull import VisualHull
    from vbr_tpu.ops import marching_cubes as mc

    data_dir = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
    vh = VisualHull.from_data_dir(data_dir, train_background=False)
    bg_cache = os.path.join("artifacts", "bg_cache")
    if not vh.load_background_models(bg_cache):
        vh.train_background(data_dir)
        os.makedirs(bg_cache, exist_ok=True)
        vh.save_background_models(bg_cache)
    vh._ensure_fast_state()
    vh._ensure_btab()

    frames = []
    for i in range(1, 5):
        cap = cv2.VideoCapture(os.path.join(data_dir, f"cam{i}", "video.avi"))
        ok, f = cap.read()
        cap.release()
        frames.append(f)
    frames_d = jnp.asarray(np.stack(frames))

    common = dict(
        btab_static=vhm._btab_static(vh._btab),
        mask_params=vh._mask_params_t,
        use_hsv=vh.mog_params[0].use_hsv,
        fig_thresholds=vh._fig_thresholds,
        inner_thresholds=vh._inner_thresholds,
        views_threshold=vh.rig.views_threshold,
    )
    targs = (vh._stacked_fz, frames_d, vh._btab.pk, vh._btab.lcc,
             vh._btab.vorig, vh._btab.uorig, vh._btab.allv, vh._btab.ry,
             vh._btab.rx)

    # baseline: the fused step alone (canonical layout, what the surface
    # program builds on)
    def step_plain():
        out = vhm._full_step_pallas(*targs, layout="canonical", **common)
        return (out[0],)

    ms_plain = marginal_ms(step_plain, iters=12)
    emit(metric="fused_step_canonical_ms", value=round(ms_plain, 3))

    origin, spacing = vh._world_frame()
    for algorithm, ambiguity in (("cubes", "join"),
                                 ("tetrahedra", "separate")):
        mc.table_emitter(algorithm, ambiguity, 0.5)

        def step_surface():
            out = vhm._full_step_surface(
                *targs, grid_shape=vh.grid.shape, algorithm=algorithm,
                ambiguity=ambiguity, capacity=32768, **common,
            )
            return (out[0],)

        ms_surf = marginal_ms(step_surface, iters=10)
        verts, valid, n_active, occ, col, ovf = vhm._full_step_surface(
            *targs, grid_shape=vh.grid.shape, algorithm=algorithm,
            ambiguity=ambiguity, capacity=32768, **common,
        )
        tris = mc.world_triangles(verts, valid, origin, spacing)
        emit(
            metric="fused_surface_ms", algorithm=algorithm,
            ambiguity=ambiguity, value=round(ms_surf, 3),
            surface_stage_ms=round(ms_surf - ms_plain, 3),
            active_cells=int(n_active), triangles=len(tris),
        )

    # end-to-end over the tunnel: fused surface program + result pull +
    # host placement, vs the previous best (occ pull + host-table MC)
    def e2e_fused():
        verts, valid, n_active, occ, col, ovf = vhm._full_step_surface(
            *targs, grid_shape=vh.grid.shape, algorithm="cubes",
            ambiguity="join", capacity=32768, **common,
        )
        return mc.world_triangles(verts, valid, origin, spacing)

    reps = 5
    e2e_fused()
    t0 = time.perf_counter()
    for _ in range(reps):
        tris = e2e_fused()
    emit(metric="mesh_e2e_fused_ms",
         value=round((time.perf_counter() - t0) / reps * 1e3, 1),
         triangles=len(tris))

    def e2e_prev():
        occ, col = vh.process_frame_fast(frames_d, layout="canonical")
        vol = np.asarray(occ).reshape(vh.grid.shape)
        return mc.extract_mesh(vol, origin=origin, spacing=spacing,
                               algorithm="cubes", ambiguity="join")

    e2e_prev()
    t0 = time.perf_counter()
    for _ in range(reps):
        tris_p, n_p = e2e_prev()
    emit(metric="mesh_e2e_occpull_hosttable_ms",
         value=round((time.perf_counter() - t0) / reps * 1e3, 1),
         triangles=int(n_p))

    np.testing.assert_array_equal(tris, tris_p)
    emit(metric="parity", value="fused surface bit-identical to "
         "occ-pull + host-table extract_mesh")


if __name__ == "__main__":
    main()
