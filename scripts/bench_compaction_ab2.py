"""Second-round compaction A/B: where do hier_sort's 4 ms go, and can a
bit-rank (sort-free) stage 2 beat the per-row sort?

Variants (all asserted identical to jnp.nonzero):

  * stage1_only — counts + block nonzero + row gather (no compaction);
  * hier_sort — the 4.0 ms r5 candidate (per-row sort_key_val);
  * hier_bitrank — stage 2 as pure arithmetic: pack each 128-cell block
    into 4 u32 words; per output slot, searchsorted the block offsets,
    then select the k-th set bit via word popcount-cumsum + 32-lane
    bit expansion.  No sort, no big scatter.

Usage (axon TPU, from /root/repo):  python scripts/bench_compaction_ab2.py
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

    active_np = np.asarray((cfg_flat != 0) & (cfg_flat != 255))
    idx_ref = np.flatnonzero(active_np)
    n_ref = len(idx_ref)

    @jax.jit
    def stage1_only(cfg_flat):
        active = (cfg_flat != 0) & (cfg_flat != 255)
        a = jnp.pad(active, (0, n_pad)).reshape(nblk, B)
        counts = jnp.sum(a.astype(jnp.int32), axis=1)
        (bidx,) = jnp.nonzero(counts > 0, size=NB, fill_value=nblk - 1)
        a_g = a[bidx]
        return bidx, counts, a_g

    ms = marginal_ms(lambda: (stage1_only(cfg_flat)[0],), iters=16)
    emit(metric="stage1_only_ms", value=round(ms, 3))

    @jax.jit
    def hier_sort(cfg_flat):
        active = (cfg_flat != 0) & (cfg_flat != 255)
        a = jnp.pad(active, (0, n_pad)).reshape(nblk, B)
        counts = jnp.sum(a.astype(jnp.int32), axis=1)
        n_active = jnp.sum(counts)
        (bidx,) = jnp.nonzero(counts > 0, size=NB, fill_value=nblk - 1)
        nb_used = jnp.sum((counts > 0).astype(jnp.int32))
        slot_ok = jnp.arange(NB) < nb_used
        bcounts = jnp.where(slot_ok, counts[bidx], 0)
        a_g = jnp.where(slot_ok[:, None], a[bidx], False)
        pos = jnp.cumsum(a_g.astype(jnp.int32), axis=1) - 1
        key = jnp.where(a_g, pos, B + jnp.arange(B)[None, :])
        val = bidx[:, None] * B + jnp.arange(B)[None, :]
        _, v_sorted = jax.lax.sort_key_val(key, val, dimension=1)
        offs = jnp.cumsum(bcounts)
        row = jnp.searchsorted(offs, jnp.arange(CAPACITY), side="right")
        row = jnp.minimum(row, NB - 1)
        slot = jnp.arange(CAPACITY) - (offs[row] - bcounts[row])
        idx = v_sorted[row, jnp.minimum(slot, B - 1)]
        idx = jnp.where(jnp.arange(CAPACITY) < n_active, idx, 0)
        return idx, n_active

    i1, n1 = hier_sort(cfg_flat)
    np.testing.assert_array_equal(np.asarray(i1)[: int(n1)], idx_ref)
    ms = marginal_ms(lambda: (hier_sort(cfg_flat)[0],), iters=16)
    emit(metric="hier_sort_ms", value=round(ms, 3))

    @jax.jit
    def hier_bitrank(cfg_flat):
        active = (cfg_flat != 0) & (cfg_flat != 255)
        a = jnp.pad(active, (0, n_pad)).reshape(nblk, B)
        counts = jnp.sum(a.astype(jnp.int32), axis=1)
        n_active = jnp.sum(counts)
        # pack 128 bools -> 4 u32 words (weighted sum along 32 lanes)
        w = a.reshape(nblk, 4, 32).astype(jnp.uint32) << jnp.arange(
            32, dtype=jnp.uint32
        )
        words = jnp.sum(w, axis=2)  # (nblk, 4) u32
        pc = jnp.sum(a.reshape(nblk, 4, 32).astype(jnp.int32), axis=2)
        (bidx,) = jnp.nonzero(counts > 0, size=NB, fill_value=nblk - 1)
        nb_used = jnp.sum((counts > 0).astype(jnp.int32))
        slot_ok = jnp.arange(NB) < nb_used
        bcounts = jnp.where(slot_ok, counts[bidx], 0)  # (NB,)
        words_g = words[bidx]  # (NB, 4) u32
        pc_g = jnp.where(slot_ok[:, None], pc[bidx], 0)  # (NB, 4)
        offs = jnp.cumsum(bcounts)
        s = jnp.arange(CAPACITY)
        row = jnp.minimum(
            jnp.searchsorted(offs, s, side="right"), NB - 1
        )
        k = s - (offs[row] - bcounts[row])  # rank within block
        pcr = pc_g[row]  # (CAP, 4)
        pcc = jnp.cumsum(pcr, axis=1)  # inclusive popcount cumsum
        wsel = jnp.sum((pcc <= k[:, None]).astype(jnp.int32), axis=1)
        wsel = jnp.minimum(wsel, 3)
        kw = k - jnp.where(wsel > 0, pcc[jnp.arange(CAPACITY), wsel - 1], 0)
        word = words_g[row, wsel]  # (CAP,) u32
        bits = (
            (word[:, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
        ).astype(jnp.int32)  # (CAP, 32)
        bcs = jnp.cumsum(bits, axis=1) - bits  # exclusive
        # position of the kw-th set bit
        hit = (bits == 1) & (bcs == kw[:, None])
        pos = jnp.argmax(hit, axis=1)
        idx = bidx[row] * B + wsel * 32 + pos
        idx = jnp.where(s < n_active, idx, 0)
        return idx, n_active

    i2, n2 = hier_bitrank(cfg_flat)
    np.testing.assert_array_equal(np.asarray(i2)[: int(n2)], idx_ref)
    assert int(n2) == n_ref
    ms = marginal_ms(lambda: (hier_bitrank(cfg_flat)[0],), iters=16)
    emit(metric="hier_bitrank_ms", value=round(ms, 3))

    # how costly is the remap alone? (sort variant minus its sort)
    @jax.jit
    def sort_only(cfg_flat):
        active = (cfg_flat != 0) & (cfg_flat != 255)
        a = jnp.pad(active, (0, n_pad)).reshape(nblk, B)
        counts = jnp.sum(a.astype(jnp.int32), axis=1)
        (bidx,) = jnp.nonzero(counts > 0, size=NB, fill_value=nblk - 1)
        a_g = a[bidx]
        pos = jnp.cumsum(a_g.astype(jnp.int32), axis=1) - 1
        key = jnp.where(a_g, pos, B + jnp.arange(B)[None, :])
        val = bidx[:, None] * B + jnp.arange(B)[None, :]
        _, v_sorted = jax.lax.sort_key_val(key, val, dimension=1)
        return v_sorted

    ms = marginal_ms(lambda: (sort_only(cfg_flat),), iters=16)
    emit(metric="stage1_plus_sort_ms", value=round(ms, 3))


if __name__ == "__main__":
    main()
