"""A/B candidate compaction strategies for surface_program (r5 perf).

jax's ``jnp.nonzero(mask, size=K)`` lowers to
``cumsum(bincount(cumsum(mask), length=K))`` — the bincount is a
full-length scatter (2.05M updates at 127³ cells), which serializes on
TPU.  Candidates measured here on a realistic active mask (the rig
hull's surface cells):

  * baseline — jnp.nonzero(size=capacity) over the full mask;
  * hier_sort — two-level: block-any over z-column blocks of 128 →
    small nonzero over 16K blocks → per-row sort_key_val compaction of
    the gathered active rows (scatter-free) → rank→(block, slot) map via
    repeat/searchsorted over the small block-count table;
  * hier_nonzero — two-level with jnp.nonzero for stage 2 (smaller
    scatter, NB·128 elements).

Each returns indices identical to the baseline (asserted) so any can be
swapped into surface_program.

Usage (axon TPU, from /root/repo):  python scripts/bench_compaction_ab.py
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


CAPACITY = 32768
NB = 4096  # active-block capacity (z-column blocks of 128)
B = 128


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
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
    tables = carve.build_projection_tables(
        cameras, grid, masks[0].shape)
    occ, _ = carve.carve_from_tables(
        jnp.asarray(np.stack(masks)), jnp.asarray(np.stack(frames)),
        tables.valid, tables.lin_idx, views_threshold=rig.views_threshold,
        color_camera=rig.color_camera,
    )
    vol = jnp.asarray(np.asarray(occ).reshape(grid.shape))

    cfg_flat_f = jax.jit(
        lambda v: mc.cell_configs(v, level=0.5).reshape(-1).astype(jnp.int32)
    )
    cfg_flat = cfg_flat_f(vol)
    n_cells = cfg_flat.shape[0]
    n_pad = (-n_cells) % B
    nblk = (n_cells + n_pad) // B

    @jax.jit
    def baseline(cfg_flat):
        active = (cfg_flat != 0) & (cfg_flat != 255)
        n_active = jnp.sum(active.astype(jnp.int32))
        (idx,) = jnp.nonzero(active, size=CAPACITY, fill_value=0)
        return idx, n_active

    idx_ref, n_active = baseline(cfg_flat)
    idx_ref = np.asarray(idx_ref)
    emit(metric="active_cells", value=int(n_active), nblk=nblk)
    ms = marginal_ms(lambda: (baseline(cfg_flat)[0],), iters=16)
    emit(metric="baseline_nonzero_ms", value=round(ms, 3))

    @jax.jit
    def hier_sort(cfg_flat):
        active = (cfg_flat != 0) & (cfg_flat != 255)
        a = jnp.pad(active, (0, n_pad)).reshape(nblk, B)
        counts = jnp.sum(a.astype(jnp.int32), axis=1)  # (nblk,)
        n_active = jnp.sum(counts)
        # stage 1: active blocks (small nonzero: 16K-element scatter)
        (bidx,) = jnp.nonzero(counts > 0, size=NB, fill_value=nblk - 1)
        nb_used = jnp.sum((counts > 0).astype(jnp.int32))
        slot_ok = jnp.arange(NB) < nb_used
        bcounts = jnp.where(slot_ok, counts[bidx], 0)  # (NB,)
        a_g = jnp.where(slot_ok[:, None], a[bidx], False)  # (NB, B)
        # stage 2: scatter-free within-row compaction by sort
        pos = jnp.cumsum(a_g.astype(jnp.int32), axis=1) - 1
        key = jnp.where(a_g, pos, B + jnp.arange(B)[None, :])
        val = bidx[:, None] * B + jnp.arange(B)[None, :]
        _, v_sorted = jax.lax.sort_key_val(key, val, dimension=1)
        # rank → (row, slot): row via repeat over the per-block counts
        offs = jnp.cumsum(bcounts)
        row = jnp.searchsorted(offs, jnp.arange(CAPACITY), side="right")
        row = jnp.minimum(row, NB - 1)
        slot = jnp.arange(CAPACITY) - (offs[row] - bcounts[row])
        idx = v_sorted[row, jnp.minimum(slot, B - 1)]
        idx = jnp.where(jnp.arange(CAPACITY) < n_active, idx, 0)
        return idx, n_active, nb_used

    idx_h, n_h, nb_used = hier_sort(cfg_flat)
    emit(metric="active_blocks", value=int(nb_used), nb_capacity=NB)
    assert int(n_h) == int(n_active)
    np.testing.assert_array_equal(np.asarray(idx_h), idx_ref)
    ms = marginal_ms(lambda: (hier_sort(cfg_flat)[0],), iters=16)
    emit(metric="hier_sort_ms", value=round(ms, 3))

    @jax.jit
    def hier_nonzero(cfg_flat):
        active = (cfg_flat != 0) & (cfg_flat != 255)
        a = jnp.pad(active, (0, n_pad)).reshape(nblk, B)
        counts = jnp.sum(a.astype(jnp.int32), axis=1)
        n_active = jnp.sum(counts)
        (bidx,) = jnp.nonzero(counts > 0, size=NB, fill_value=nblk - 1)
        nb_used = jnp.sum((counts > 0).astype(jnp.int32))
        slot_ok = jnp.arange(NB) < nb_used
        a_g = jnp.where(slot_ok[:, None], a[bidx], False)
        (pos2,) = jnp.nonzero(a_g.reshape(-1), size=CAPACITY, fill_value=0)
        idx = bidx[pos2 // B] * B + pos2 % B
        idx = jnp.where(jnp.arange(CAPACITY) < n_active, idx, 0)
        return idx, n_active

    idx_h2, n_h2 = hier_nonzero(cfg_flat)
    assert int(n_h2) == int(n_active)
    np.testing.assert_array_equal(np.asarray(idx_h2), idx_ref)
    ms = marginal_ms(lambda: (hier_nonzero(cfg_flat)[0],), iters=16)
    emit(metric="hier_nonzero_ms", value=round(ms, 3))

    # primitive costs, for the roofline notes
    mask = (cfg_flat != 0) & (cfg_flat != 255)

    cs = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32)))
    ms = marginal_ms(lambda: (cs(mask),), iters=16)
    emit(metric="prim_cumsum_2M_ms", value=round(ms, 3))

    bc = jax.jit(lambda m: jnp.bincount(
        jnp.cumsum(m.astype(jnp.int32)), length=CAPACITY))
    ms = marginal_ms(lambda: (bc(mask),), iters=8)
    emit(metric="prim_cumsum_bincount_2M_ms", value=round(ms, 3))


if __name__ == "__main__":
    main()
