"""Measured per-shard cost of the sharded production Pallas step.

Multi-chip hardware is not reachable from this host (one tunneled v5e
chip), so the sharded step's per-shard wall clock is measured the honest
way VERDICT r3 #6 prescribes: run each shard's ACTUAL local program —
the same table slice + full-camera mask set that
``parallel.pallas_sharded.sharded_production_step`` hands to shard k —
on the one real chip, and report the max over shards (the step's
critical path) plus an analytic ICI bound for the one collective (the
mask/frame all_gather, which the tunnel cannot measure).

Two configurations:
  * production 128³ × 4 cameras (reference rig, real masks) — 8 shards,
  * stretch  512³ × 8 synthetic cameras (BASELINE config 5) — 8 shards,
    replacing the r3 "124.1 / 8 ≈ 15.5 ms" unsharded-number division
    with a measured per-shard time.

Each configuration is measured under all three superblock→shard
assignment modes (contiguous slabs / strided / cost-LPT — see
pallas_sharded.superblock_order); the contiguous-vs-balanced gap is the
slab load imbalance.

Output: one JSON line per (configuration, mode).

ICI model: v5e 1D ring all_gather of B total bytes over S shards moves
(S-1)/S·B per link at ~45 GB/s full duplex; the gathered payload is the
packed masks + color frame only (see pallas_sharded's communication
design note).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ICI_GBPS = 45e9  # v5e per-link ICI bandwidth (public spec), bytes/s


from scripts._timing import marginal_ms  # noqa: E402


def _marginal_ms(fn, iters=24):
    return marginal_ms(fn, iters=iters, pairs=3, warmup=2)


def bench_config(name, cams, grid, masks, frames, views_threshold,
                 nshards=8, cache=None, iters=24):
    import jax
    import jax.numpy as jnp

    from vbr_tpu.ops import carve_pallas as cpk
    from vbr_tpu.parallel import pallas_sharded

    t0 = time.time()
    btab = None
    if cache and os.path.exists(cache):
        btab = _load_cached_tables(cache, cams, grid, masks.shape[1:3])
    if btab is None:
        btab = cpk.build_block_tables(
            cams, grid, masks.shape[1:3], color_camera=1
        )
        if cache:
            _save_cached_tables(cache, btab, cams)
    build_s = time.time() - t0

    masks_d = jnp.asarray(masks)
    fc = jnp.asarray(frames[1])

    # full unsharded reference number on the same chip
    def full():
        return cpk.carve_blocked(
            masks_d, fc, btab, views_threshold=views_threshold,
            layout="blocked",
        )

    ms_full = _marginal_ms(full, iters=max(6, iters // 3))
    occ_full = np.asarray(full()[0])

    # ICI bound for the one collective: all_gather of every camera's mask
    # plane + every camera's frame (u8), ring algorithm
    C, H, W = masks.shape
    payload = C * H * W * (1 + 3)  # masks + BGR frames
    ici_ms = (nshards - 1) / nshards * payload / ICI_GBPS * 1e3

    # per-shard local programs (max over shards = step critical path),
    # once per superblock→shard assignment mode
    all_exact = True
    for mode in ("contiguous", "strided", "cost"):
        costs = None
        if mode == "cost":
            costs = pallas_sharded.superblock_costs(
                btab, masks, views_threshold
            )
        order = pallas_sharded.superblock_order(
            btab.nsuper, nshards, mode, costs=costs
        )
        shard_ms = []
        occs = []
        for k in range(nshards):
            loc = pallas_sharded.local_table_slice(
                btab, k, nshards, order=order
            )

            def local():
                return cpk.carve_blocked(
                    masks_d, fc, loc, views_threshold=views_threshold,
                    layout="blocked",
                )

            o = local()
            occs.append(np.asarray(o[0]))
            shard_ms.append(_marginal_ms(local, iters=iters))

        # exactness: unshuffled union of shard slices == full carve
        stacked = np.concatenate(occs, axis=0)[None]
        unshuf, _ = pallas_sharded.unshuffle_blocked(
            stacked, stacked[..., None, :], btab, order
        )
        exact = bool((unshuf[0] == occ_full).all())
        all_exact &= exact

        per_shard = max(shard_ms)
        print(json.dumps({
            "metric": f"sharded_production_carve_{name}_{mode}",
            "value": round(per_shard + ici_ms, 3),
            "unit": "ms/frame (per-shard measured + ICI bound)",
            "extra": {
                "order_mode": mode,
                "per_shard_carve_ms_max": round(per_shard, 3),
                "per_shard_carve_ms_all": [round(m, 3) for m in shard_ms],
                "unsharded_ms": round(ms_full, 3),
                "speedup_vs_unsharded": round(
                    ms_full / (per_shard + ici_ms), 2
                ),
                "mask_allgather_ici_ms_bound": round(ici_ms, 4),
                "shards": nshards,
                "slices_union_bitexact": exact,
                "occupied_voxels": int(occ_full.sum()),
                "table_build_s": round(build_s, 1),
            },
        }), flush=True)
    return all_exact


def _table_fingerprint(btab, cams):
    """Geometry the cached arrays are only valid for: grid/block shapes,
    image size, camera count + a hash of every camera's parameters.  A
    stale or foreign cache must rebuild, not silently publish numbers
    from corrupt tables."""
    import hashlib

    h = hashlib.sha256()
    for cp in cams:
        for a in (cp.K, cp.dist, cp.rvec, cp.tvec):
            h.update(np.ascontiguousarray(np.asarray(a, np.float64)))
    return np.array(
        list(btab.grid_shape) + list(btab.sub_shape) + list(btab.sup_shape)
        + list(btab.image_hw)
        + [btab.num_cameras, btab.color_camera]
        + list(np.frombuffer(h.digest()[:16], np.int64)),
        np.int64,
    )


def _save_cached_tables(cache, btab, cams):
    np.savez(
        cache,
        pk=np.asarray(btab.pk), lcc=np.asarray(btab.lcc),
        vorig=np.asarray(btab.vorig), uorig=np.asarray(btab.uorig),
        allv=np.asarray(btab.allv),
        ry=np.asarray(btab.ry).astype(np.int8),
        rx=np.asarray(btab.rx).astype(np.int8),
        meta=np.array([btab.WH, btab.WC, btab.Hp, btab.Wc], np.int64),
        fingerprint=_table_fingerprint(btab, cams),
    )


def _load_cached_tables(cache, cams, grid, image_hw):
    """Rehydrate cached tables, or return None when the cache's stored
    fingerprint does not match this run's geometry/cameras (then the
    caller rebuilds — a stale cache must never publish numbers)."""
    import jax.numpy as jnp

    from vbr_tpu.ops import carve_pallas as cpk

    H, W = image_hw
    z = np.load(cache)
    WH, WC, Hp, Wc = [int(v) for v in z["meta"][:4]]
    perm, nblocks = cpk._blocked_permutation(grid.shape, (8, 8, 8), (2, 2, 4))
    btab = cpk.BlockTables(
        grid_shape=grid.shape, sub_shape=(8, 8, 8), sup_shape=(2, 2, 4),
        nblocks=nblocks, nsuper=perm.shape[0], nsub=perm.shape[1],
        num_cameras=len(cams), image_hw=(H, W), Hp=Hp,
        n_words=-(-W // cpk.WORD_BITS), Wc=Wc, WH=WH, WC=WC,
        color_camera=1,
        pk=jnp.asarray(z["pk"]), lcc=jnp.asarray(z["lcc"]),
        vorig=jnp.asarray(z["vorig"]), uorig=jnp.asarray(z["uorig"]),
        allv=jnp.asarray(z["allv"]),
        ry=jnp.asarray(z["ry"], dtype=jnp.bfloat16),
        rx=jnp.asarray(z["rx"], dtype=jnp.bfloat16),
        perm=perm,
    )
    want = _table_fingerprint(btab, cams)
    got = z["fingerprint"] if "fingerprint" in z.files else None
    if got is None or got.shape != want.shape or not (got == want).all():
        print(f"# cache {cache} fingerprint mismatch (stale/foreign); "
              "rebuilding tables", file=sys.stderr)
        return None
    return btab


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp  # noqa: F401

    import cv2

    from vbr_tpu.pipelines import reconstruction
    from vbr_tpu.utils import synthetic
    from vbr_tpu.utils.config import GridConfig

    only = sys.argv[1] if len(sys.argv) > 1 else "both"

    ok = True
    if only in ("both", "128"):
        data = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
        cams = reconstruction.load_rig(data)
        masks, frames = [], []
        for i in range(1, 5):
            m = cv2.imread(os.path.join(data, f"cam{i}", "mask_MOG.jpg"), 0)
            masks.append((m > 127).astype(np.uint8) * 255)
            cap = cv2.VideoCapture(os.path.join(data, f"cam{i}", "video.avi"))
            _, f = cap.read()
            cap.release()
            frames.append(f)
        ok &= bench_config(
            "128c4", cams, GridConfig(), np.stack(masks), np.stack(frames),
            views_threshold=4,
        )

    if only in ("both", "512"):
        cams8 = synthetic.synthetic_cameras(8)
        _, masks8, frames8 = synthetic.synthetic_rig(num_cameras=8)
        ok &= bench_config(
            "512c8", cams8, GridConfig(nx=512, ny=512, nz=512),
            masks8, frames8, views_threshold=8,
            cache=os.environ.get("VBR_512_CACHE", "/tmp/btab512.npz"),
            iters=8,
        )

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
