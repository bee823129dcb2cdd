"""Full sharded per-frame production step over the (data, cam, grid) mesh.

The multi-chip version of VisualHull.process_frame: per-camera frozen GMM
apply + morphology run sharded over (data=frames, cam=cameras) — both
purely local — then the carve gathers run sharded over (cam, grid) with a
``psum`` view-count reduction over the camera axis.  This is the step
``__graft_entry__.dryrun_multichip`` compiles and executes on the virtual
mesh (SURVEY.md §2c's DP/TP/SP mapping).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vbr_tpu.ops import ccl as ccl_ops
from vbr_tpu.ops import gmm as gmm_ops
from vbr_tpu.utils.config import MOGParams


def sharded_pipeline_step(mesh: Mesh, *, views_threshold: int = 4,
                          mog_params: MOGParams = MOGParams(),
                          clean: bool = False):
    """Build the jitted sharded step.

    Signature:
        step(frames_hsv (F, C, H, W, 3) u8,
             weight (C, H, W, K), mean (C, H, W, K, 3), var (C, H, W, K),
             valid (C, N) bool, lin_idx (C, N) i32
             [, fig_thr (C,) f32, inner_thr (C,) f32  when clean=True])
          -> occupancy (F, N) bool

    frames sharded (data, cam); GMM state sharded (cam); carve tables
    sharded (cam, grid).  Masks flow shard-locally from the GMM stage into
    the carve stage — no resharding between stages.  The GMM apply is the
    REAL production `gmm.apply_frozen` (MOGState.var = channel-summed
    variance, OpenCV break-at-first-empty prefix and kForeground
    conventions) so sharded masks match the single-chip path; all gate
    parameters (incl. ``bg_ratio``) come from ``mog_params`` (static),
    like everywhere else.

    ``clean=True`` inserts the contour-hierarchy CCL cleanup
    (ops.ccl.clean_mask semantics: keep figures ≥ fig_thr solid, re-carve
    enclosed holes ≥ inner_thr) between the morphology and the carve —
    shard-local along the camera axis like the mask stages, with the
    per-camera thresholds flowing in as cam-sharded arrays.
    """

    def _local(frames, weight, mean, var, valid, lin_idx,
               fig_thr=None, inner_thr=None):
        f, c, H, W, _ = frames.shape

        def apply_one(frame, w, mu, v):
            state = gmm_ops.MOGState(
                weight=w, mean=mu, var=v,
                nframes=jnp.zeros((), jnp.int32),
            )
            raw = gmm_ops.apply_frozen.__wrapped__(state, frame, mog_params)
            fg = raw > 0
            # 3×3 opening (erode+dilate) — shard-local pre-morphology
            fgi = fg.astype(jnp.int32)
            er = -jax.lax.reduce_window(
                -fgi, -1, jax.lax.max, (3, 3), (1, 1), ((1, 1), (1, 1))
            )
            di = jax.lax.reduce_window(
                er, 0, jax.lax.max, (3, 3), (1, 1), ((1, 1), (1, 1))
            )
            return di > 0

        # vmap over local frames × local cameras
        masks = jax.vmap(
            lambda fr: jax.vmap(apply_one)(fr, weight, mean, var)
        )(frames)  # (f, c, H, W) bool

        if clean:
            def clean_one(m, ft, it_):
                u8 = jnp.where(m, jnp.uint8(255), jnp.uint8(0))
                return ccl_ops.clean_mask.__wrapped__(u8, ft, it_) > 0

            masks = jax.vmap(
                lambda fr: jax.vmap(clean_one)(fr, fig_thr, inner_thr)
            )(masks)

        masks_flat = masks.reshape(f, c, H * W)

        def carve_frame(mf):
            def per_cam(m, v, idx):
                return v & jnp.take(m, idx, axis=0)

            vis = jax.vmap(per_cam)(mf, valid, lin_idx)
            return jnp.sum(vis.astype(jnp.int32), axis=0)

        partial = jax.vmap(carve_frame)(masks_flat)  # (f, n)
        count = jax.lax.psum(partial, axis_name="cam")
        return count >= views_threshold

    in_specs = [
        P("data", "cam", None, None, None),  # frames
        P("cam", None, None, None),  # weight
        P("cam", None, None, None, None),  # mean
        P("cam", None, None, None),  # var
        P("cam", "grid"),  # valid
        P("cam", "grid"),  # lin_idx
    ]
    if clean:
        in_specs += [P("cam"), P("cam")]  # fig_thr, inner_thr
    mapped = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P("data", "grid"),
        check_vma=False,
    )
    return jax.jit(mapped)


def place_pipeline_inputs(mesh, frames_hsv, weight, mean, var,
                          valid, lin_idx, fig_thr=None, inner_thr=None):
    put = lambda x, spec: jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    out = (
        put(frames_hsv, P("data", "cam", None, None, None)),
        put(weight, P("cam", None, None, None)),
        put(mean, P("cam", None, None, None, None)),
        put(var, P("cam", None, None, None)),
        put(valid, P("cam", "grid")),
        put(lin_idx, P("cam", "grid")),
    )
    if fig_thr is not None:
        out += (
            put(np.asarray(fig_thr, np.float32), P("cam")),
            put(np.asarray(inner_thr, np.float32), P("cam")),
        )
    return out
