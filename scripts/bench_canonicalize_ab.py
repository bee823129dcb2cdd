"""Where does the blocked→canonical layout conversion cost go? (r5)

bench.py measures canonical-layout carve ≈ blocked + 1.8 ms.  The
conversion is a 9-axis reshape+transpose of 2 MB occupancy u8 + 6.3 MB
colors u8 — nominally memory-bandwidth, but the 8-element interleave
pattern fights the TPU lane layout.  Measured here:

  * carve blocked vs canonical (the end-to-end delta);
  * occ-only transpose, colors-only transpose (the split);
  * packed-z occ transpose: pack each sub-block's 8 z-voxels into one
    byte first (8× less data through the hostile transpose), then
    unpack elementwise — a candidate canonical-occ fast path.

Usage (axon TPU, from /root/repo):  python scripts/bench_canonicalize_ab.py
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
    import jax.numpy as jnp

    from vbr_tpu.ops import carve_pallas as cp
    from vbr_tpu.pipelines import reconstruction
    from vbr_tpu.utils.config import GridConfig, RigConfig
    import cv2

    data_dir = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
    grid = GridConfig()
    rig = RigConfig()
    cameras = reconstruction.load_rig(data_dir)
    masks, frames = [], []
    for i in range(1, 5):
        m = cv2.imread(os.path.join(data_dir, f"cam{i}", "mask_MOG.jpg"), 0)
        masks.append((m > 127).astype(np.uint8) * 255)
        cap = cv2.VideoCapture(os.path.join(data_dir, f"cam{i}", "video.avi"))
        ok, f = cap.read()
        cap.release()
        frames.append(f)
    masks_d = jnp.asarray(np.stack(masks))
    H, W = masks[0].shape
    btab = cp.build_block_tables(cameras, grid, (H, W),
                                 color_camera=rig.color_camera)
    img = jnp.asarray(frames[rig.color_camera])

    for layout in ("blocked", "canonical"):
        def step():
            return cp.carve_blocked(
                masks_d, img, btab, views_threshold=rig.views_threshold,
                layout=layout,
            )

        ms = marginal_ms(lambda: (step()[0],), iters=24)
        emit(metric=f"carve_{layout}_ms", value=round(ms, 3))

    occ_b, col_b = cp.carve_blocked(
        masks_d, img, btab, views_threshold=rig.views_threshold,
        layout="blocked",
    )
    st = cp.tables_static_tuple(btab)
    (_, nsuper, nsub, _, _, _, _, sub, sup, nblocks, _, _) = st

    occ_f = jax.jit(lambda o: cp._blocked_to_canonical(
        o.reshape(nsuper, nsub * 512), sub, sup, nblocks))
    ms = marginal_ms(lambda: (occ_f(occ_b),), iters=24)
    emit(metric="occ_only_transpose_ms", value=round(ms, 3))

    def col_fn(c):
        cv = jnp.transpose(c, (0, 1, 3, 2)).reshape(nsuper, nsub * 512, 3)
        return cp._blocked_to_canonical(cv, sub, sup, nblocks)

    col_f = jax.jit(col_fn)
    ms = marginal_ms(lambda: (col_f(col_b),), iters=24)
    emit(metric="colors_only_transpose_ms", value=round(ms, 3))

    # packed-z candidate: (nsuper, nsub, 512) u8 -> pack 8 z into a byte
    gx, gy, gz = nblocks
    spx, spy, spz = sup
    sbx, sby, sbz = sub
    assert sbz == 8

    def packedz(o):
        x = o.reshape(nsuper, nsub, sbx * sby, 8)
        w = (x.astype(jnp.uint32) << jnp.arange(8, dtype=jnp.uint32))
        packed = jnp.sum(w, axis=-1).astype(jnp.uint8)  # (nsuper,nsub,64)
        # transpose to canonical (nx, ny, nz/8) order
        t = packed.reshape(gx, gy, gz, spx, spy, spz, sbx, sby, 1)
        t = t.transpose(0, 3, 6, 1, 4, 7, 2, 5, 8)
        nx, ny, nz = grid.shape
        pk = t.reshape(nx, ny, nz // 8)
        bits = (pk[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
        return bits.reshape(nx, ny, nz).astype(jnp.bool_).reshape(-1)

    pz = jax.jit(packedz)
    out_ref = np.asarray(occ_f(occ_b)).astype(bool)
    np.testing.assert_array_equal(np.asarray(pz(occ_b)), out_ref)
    ms = marginal_ms(lambda: (pz(occ_b),), iters=24)
    emit(metric="occ_packedz_transpose_ms", value=round(ms, 3))


if __name__ == "__main__":
    main()
