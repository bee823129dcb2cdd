"""Third-round compaction A/B: shave hier_sort's stage1 (1.75 ms) and
remap (~2 ms).

  * counts_only / counts_nonzero / stage1 — sub-profile stage 1;
  * hier_sort_v2 — remap via searchsorted(method='sort') instead of the
    default binary-search scan;
  * hier_sort_v3 — v2 + stage-1 block compaction by sort instead of
    jnp.nonzero (no bincount scatter at all);
  * hier_sort_v4 — v3 with counts from a (nblk, B) @ ones matmul.

Usage (axon TPU, from /root/repo):  python scripts/bench_compaction_ab3.py
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
NB = 4096
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
    tables = carve.build_projection_tables(cameras, grid, masks[0].shape)
    occ, _ = carve.carve_from_tables(
        jnp.asarray(np.stack(masks)), jnp.asarray(np.stack(frames)),
        tables.valid, tables.lin_idx, views_threshold=rig.views_threshold,
        color_camera=rig.color_camera,
    )
    vol = jnp.asarray(np.asarray(occ).reshape(grid.shape))
    cfg_flat = jax.jit(
        lambda v: mc.cell_configs(v, level=0.5).reshape(-1).astype(jnp.int32)
    )(vol)
    n_cells = cfg_flat.shape[0]
    n_pad = (-n_cells) % B
    nblk = (n_cells + n_pad) // B
    idx_ref = np.flatnonzero(
        np.asarray((cfg_flat != 0) & (cfg_flat != 255)))

    @jax.jit
    def counts_only(cfg_flat):
        active = (cfg_flat != 0) & (cfg_flat != 255)
        a = jnp.pad(active, (0, n_pad)).reshape(nblk, B)
        return jnp.sum(a.astype(jnp.int32), axis=1)

    ms = marginal_ms(lambda: (counts_only(cfg_flat),), iters=24)
    emit(metric="counts_only_ms", value=round(ms, 3))

    @jax.jit
    def counts_nonzero(cfg_flat):
        counts = counts_only(cfg_flat)
        (bidx,) = jnp.nonzero(counts > 0, size=NB, fill_value=nblk - 1)
        return bidx

    ms = marginal_ms(lambda: (counts_nonzero(cfg_flat),), iters=24)
    emit(metric="counts_nonzero_ms", value=round(ms, 3))

    @jax.jit
    def counts_blocksort(cfg_flat):
        counts = counts_only(cfg_flat)
        keys = jnp.where(counts > 0, jnp.arange(nblk), nblk)
        bidx = jax.lax.sort(keys)[:NB]
        return bidx

    b1 = np.asarray(counts_nonzero(cfg_flat))
    b2 = np.asarray(counts_blocksort(cfg_flat))
    nbu = int((np.asarray(counts_only(cfg_flat)) > 0).sum())
    np.testing.assert_array_equal(b1[:nbu], b2[:nbu])
    ms = marginal_ms(lambda: (counts_blocksort(cfg_flat),), iters=24)
    emit(metric="counts_blocksort_ms", value=round(ms, 3))

    def _compact(cfg_flat, block_select, ss_method):
        active = (cfg_flat != 0) & (cfg_flat != 255)
        a = jnp.pad(active, (0, n_pad)).reshape(nblk, B)
        counts = jnp.sum(a.astype(jnp.int32), axis=1)
        n_active = jnp.sum(counts)
        if block_select == "nonzero":
            (bidx,) = jnp.nonzero(counts > 0, size=NB, fill_value=nblk - 1)
            nb_used = jnp.sum((counts > 0).astype(jnp.int32))
            slot_ok = jnp.arange(NB) < nb_used
        else:
            keys = jnp.where(counts > 0, jnp.arange(nblk), nblk)
            bidx = jax.lax.sort(keys)[:NB]
            nb_used = jnp.sum((counts > 0).astype(jnp.int32))
            slot_ok = bidx < nblk
            bidx = jnp.minimum(bidx, nblk - 1)
        bcounts = jnp.where(slot_ok, counts[bidx], 0)
        a_g = jnp.where(slot_ok[:, None], a[bidx], False)
        pos = jnp.cumsum(a_g.astype(jnp.int32), axis=1) - 1
        key = jnp.where(a_g, pos, B + jnp.arange(B)[None, :])
        val = bidx[:, None] * B + jnp.arange(B)[None, :]
        _, v_sorted = jax.lax.sort_key_val(key, val, dimension=1)
        offs = jnp.cumsum(bcounts)
        row = jnp.searchsorted(offs, jnp.arange(CAPACITY), side="right",
                               method=ss_method)
        row = jnp.minimum(row, NB - 1)
        slot = jnp.arange(CAPACITY) - (offs[row] - bcounts[row])
        idx = v_sorted[row, jnp.minimum(slot, B - 1)]
        idx = jnp.where(jnp.arange(CAPACITY) < n_active, idx, 0)
        return idx, n_active

    import functools

    for name, blocksel, ssm in (
        ("hier_sort_v2", "nonzero", "sort"),
        ("hier_sort_v3", "sort", "sort"),
    ):
        f = jax.jit(functools.partial(_compact, block_select=blocksel,
                                      ss_method=ssm))
        i, n = f(cfg_flat)
        np.testing.assert_array_equal(np.asarray(i)[: int(n)], idx_ref)
        ms = marginal_ms(lambda: (f(cfg_flat)[0],), iters=16)
        emit(metric=f"{name}_ms", value=round(ms, 3))


if __name__ == "__main__":
    main()
