"""Fused Pallas TPU voxel-carving kernel (the north-star op).

Replaces the reference's 8.4M-iteration per-frame Python dict loop
(voxel_reconstruction.py:89-124) *and* XLA's slow general gather (~10
cycles/element ⇒ ~93 ms/frame at 128³×4 cams) with a blocked kernel built
around what TPUs are actually fast at: dense matmuls on the MXU.

Design (all geometry static per rig, precomputed on host in float64 with
the reference's exact trunc-to-int semantics):

  * Foreground masks are **bit-packed** 8 columns → one bf16 word.  All
    values involved (words ≤ 255, one-hots ∈ {0,1}, u8 color planes) are
    exactly representable in bfloat16, so the MXU's native bf16 matmul path
    is *exact* — no precision flags needed.  A full 4-camera 486×644 packed
    mask set is ~0.4 MB and lives entirely in VMEM — no per-block DMA.  The
    color frame is kept as three u8→bf16 planes (~2 MB), also VMEM-resident.
  * The voxel grid is tiled into 8³ **sub-blocks** (512 voxels) grouped
    into superblocks (one grid step each).  A sub-block's projected
    footprint is a few dozen pixels tall (measured ≤ 38 px at 128³ with the
    reference rig), so each sub-block reads only a ~48-row slice of the
    packed mask (dynamic sublane slice, 8-aligned origin).
  * The per-voxel "gather" is an *exact* one-hot contraction: a
    (512 × WH) row-one-hot matmul against the row slice (MXU), a word
    one-hot select, then bit extraction via an exponent-constructed 2⁻ᵇ
    multiply (VPU).  No data-dependent memory access anywhere.
  * Colors are gathered the same way from the packed frame — skipped for
    sub-blocks with no voxel reaching the view threshold (~85 % of blocks).

Occupancy is bit-identical to the float64 table path (and therefore to the
reference loop): identical truncated indices, exact integer arithmetic
throughout (one-hot rows have at most a single 1, so the f32 matmul sums
are exact).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.utils.config import CameraParams, GridConfig

BV = 512  # voxels per sub-block (8³)
WORD_BITS = 8  # mask columns packed per word (8 keeps words bf16-exact)
LANE = 128  # TPU lane width; lane-dim slices must be multiples of this
FCELL = 8  # activity/full-test fine-cell size in pixels


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class BlockTables:
    """Static per-rig tables for the blocked carve kernel."""

    # geometry (static python ints — part of the jit cache key)
    grid_shape: Tuple[int, int, int]
    sub_shape: Tuple[int, int, int]
    sup_shape: Tuple[int, int, int]  # in sub-blocks
    nblocks: Tuple[int, int, int]  # superblock grid (gx, gy, gz)
    nsuper: int
    nsub: int
    num_cameras: int
    image_hw: Tuple[int, int]
    Hp: int  # padded image rows (VMEM resident)
    n_words: int  # packed words per row
    Wc: int  # padded color image cols
    WH: int  # per-sub-block row window (8-aligned)
    WC: int  # color column window (multiple of 128)
    color_camera: int

    # device arrays
    # Packed per-voxel geometry, one i32 per (voxel, camera):
    #   bits 10..19 = absolute image row (1023 = invalid sentinel — never
    #                 matched, since row windows end below 648),
    #   bits 3..9   = word index (column // 8),
    #   bits 0..2   = bit within the word.
    # One packed word instead of three i32 planes: 3× less HBM + VMEM
    # traffic per sub-block, and the only cost is three VPU shift/ands.
    pk: jnp.ndarray  # (nsuper, nsub, C, BV) i32
    lcc: jnp.ndarray  # (nsuper, nsub, BV) i32 absolute color col, -1 invalid
    vorig: jnp.ndarray  # (nsuper, nsub, C) i32 8-aligned row-window origin
    uorig: jnp.ndarray  # (nsuper, nsub, 1) i32 128-aligned color col origin
    # activity / provably-full pruning, both exact-conservative and both
    # evaluated with the SAME factorized machinery: the block's projected
    # footprint bbox → FCELL-grid covering relation is axis-separable, so
    # ry/rx store row/column span indicators and a per-block reduction
    # over the covered cells is the bilinear form ryᵀ·M·rx (two thin
    # matmuls; the earlier per-block×cells membership matrix was a
    # memory-bound matvec costing ~86 ms/frame at 512³).
    #   * active: any-foreground via M = fg-max over fine cells,
    #     vetoed when fewer than views_threshold cameras hit;
    #   * full: all-foreground via M = 1 − fg-min, plus the static
    #     all-projections-valid flag — then every voxel counts C views
    #     and the kernel emits occupancy without computing.
    allv: jnp.ndarray = None  # (nsuper, nsub) i32
    ry: jnp.ndarray = None  # (C, nsuper*nsub, hf_pad) bf16 row spans
    rx: jnp.ndarray = None  # (C, nsuper*nsub, wf_pad) bf16 col spans
    n_fcells_hw: Tuple[int, int] = (0, 0)  # fine-cell grid (hf, wf)
    # host-side: canonical voxel index of each (superblock, sub, voxel) slot
    perm: np.ndarray = dataclasses.field(
        default=None, compare=False, hash=False
    )


def _blocked_permutation(grid_shape, sub, sup):
    """Canonical (ix,iy,iz) C-order → (superblock, sub-block, voxel) order."""
    nx, ny, nz = grid_shape
    sbx, sby, sbz = sub
    spx, spy, spz = sup
    gx, gy, gz = nx // (sbx * spx), ny // (sby * spy), nz // (sbz * spz)
    idx = np.arange(nx * ny * nz).reshape(nx, ny, nz)
    idx = idx.reshape(gx, spx, sbx, gy, spy, sby, gz, spz, sbz)
    idx = idx.transpose(0, 3, 6, 1, 4, 7, 2, 5, 8)
    perm = idx.reshape(gx * gy * gz, spx * spy * spz, sbx * sby * sbz)
    return perm, (gx, gy, gz)


def _check_block_geometry(grid, sub, sup, image_hw):
    H, W = image_hw
    for n, s, p in zip(grid.shape, sub, sup):
        if n % (s * p) != 0:
            raise ValueError(f"grid dim {n} not divisible by {s}*{p}")
    if sub[0] * sub[1] * sub[2] != BV:
        raise ValueError("sub-block must contain exactly 512 voxels")
    if W // WORD_BITS >= 128:
        raise ValueError("word index must fit 7 bits (image width < 1024)")
    if H >= 1023:
        raise ValueError(
            "image height must be < 1023 (row 1023 is the packed-geometry "
            "invalid sentinel)"
        )


def build_block_tables(
    cameras: Sequence[CameraParams],
    grid: GridConfig,
    image_hw: Tuple[int, int],
    sub: Tuple[int, int, int] = (8, 8, 8),
    sup: Tuple[int, int, int] = (2, 2, 4),
    color_camera: int = 1,
    accelerate: bool | None = None,
) -> BlockTables:
    """Precompute of all static kernel tables (one-time per rig/grid).

    ``accelerate=True`` routes to :func:`build_block_tables_device` —
    the fully device-side build (f32 projection + f64 host recheck of
    boundary-suspicious voxels only; bit-identical to pure f64, tested).
    ``accelerate=False`` is the pure-f64 single-core host build (the
    exactness oracle; ~21 min at 512³×8 on a one-core host).
    ``accelerate=None`` (default) auto-selects: device build for grids
    of ≥2²⁴ voxels (256³+), where the host build takes minutes, host
    build below that (the small-grid host build is seconds and avoids
    device compile latency)."""
    if accelerate is None:
        accelerate = int(np.prod(grid.shape)) >= (1 << 24)
    if accelerate:
        return build_block_tables_device(
            cameras, grid, image_hw, sub=sub, sup=sup,
            color_camera=color_camera,
        )
    H, W = image_hw
    C = len(cameras)
    _check_block_geometry(grid, sub, sup, image_hw)

    perm, nblocks = _blocked_permutation(grid.shape, sub, sup)
    nsuper, nsub, _ = perm.shape
    pts = None  # lazily built (f64 path only)

    n_words = _ceil_to(W, WORD_BITS) // WORD_BITS

    pk = np.zeros((nsuper, nsub, C, BV), dtype=np.int32)
    vorig = np.zeros((nsuper, nsub, C), dtype=np.int32)
    allv = np.ones((nsuper, nsub), dtype=bool)
    iy_color = None
    ix_color = None
    valid_color = None

    nblk = nsuper * nsub
    hf = -(-H // FCELL)
    wf = -(-W // FCELL)
    hf_p = _ceil_to(hf, LANE)
    wf_p = _ceil_to(wf, LANE)
    ry = np.zeros((C, nblk, hf_p), dtype=np.int8)
    rx = np.zeros((C, nblk, wf_p), dtype=np.int8)

    need_wh = 8
    for c, cp in enumerate(cameras):
        if pts is None:
            pts = grid.voxel_points()  # canonical order, float64
        uv = cam_ops.project_points(pts, cp.rvec, cp.tvec, cp.K,
                                    cp.dist, xp=np)
        x, y = uv[:, 0], uv[:, 1]
        valid = (y >= 0) & (y < H) & (x >= 0) & (x < W)
        iy = np.where(valid, np.trunc(y), 0).astype(np.int32)
        ix = np.where(valid, np.trunc(x), 0).astype(np.int32)
        iy_b = iy.astype(np.int32)[perm]
        ix_b = ix.astype(np.int32)[perm]
        valid_b = valid[perm]
        if c == color_camera:
            iy_color, ix_color, valid_color = iy_b, ix_b, valid_b
        # packed geometry word (row sentinel 1023 never matches a window)
        row_f = np.where(valid_b, iy_b, 1023)
        pk[:, :, c, :] = (
            (row_f << 10)
            | ((ix_b // WORD_BITS) << 3)
            | (ix_b % WORD_BITS)
        ).astype(np.int32)

        allv &= valid_b.all(axis=2)
        any_v = valid_b.any(axis=2)
        ymin = np.where(any_v, np.where(valid_b, iy_b, 10**6).min(axis=2), 0)
        ymax = np.where(any_v, np.where(valid_b, iy_b, -1).max(axis=2), 0)
        v0 = (ymin // 8) * 8
        need_wh = max(need_wh, int((ymax - v0).max()) + 1)
        vorig[:, :, c] = v0

        # footprint-bbox → fine row/col span indicators (1-D difference
        # image + cumsum; vectorized — a per-block python fill is minutes
        # at 512³)
        xmin_c = np.where(any_v, np.where(valid_b, ix_b, 10**6).min(axis=2), 0)
        xmax_c = np.where(any_v, np.where(valid_b, ix_b, -1).max(axis=2), 0)
        bidx = np.flatnonzero(any_v.ravel())
        y0F, y1F = (ymin // FCELL).ravel(), (ymax // FCELL).ravel()
        x0F, x1F = (xmin_c // FCELL).ravel(), (xmax_c // FCELL).ravel()
        dy = np.zeros((nblk, hf_p + 1), np.int8)
        np.add.at(dy, (bidx, y0F[bidx]), 1)
        np.add.at(dy, (bidx, y1F[bidx] + 1), -1)
        ry[c] = np.cumsum(dy, axis=1, dtype=np.int8)[:, :hf_p]
        dx = np.zeros((nblk, wf_p + 1), np.int8)
        np.add.at(dx, (bidx, x0F[bidx]), 1)
        np.add.at(dx, (bidx, x1F[bidx] + 1), -1)
        rx[c] = np.cumsum(dx, axis=1, dtype=np.int8)[:, :wf_p]

    WH = _ceil_to(need_wh, 8)
    Hp = _ceil_to(H, 8) + WH  # guarantees v0 + WH <= Hp for any v0 <= H-1

    # Color column windows: 64-aligned origin; the kernel reads a single
    # 128-wide lane panel from one of two image copies (the second shifted
    # left by 64 columns), so any 64-aligned origin maps to a 128-aligned
    # slice of one copy.  Requires the per-sub-block column bbox to fit in
    # 128 - 63 = 65 columns (it is ≤ ~35 px for supported grids; asserted).
    any_c = valid_color.any(axis=2)
    xmin = np.where(any_c, np.where(valid_color, ix_color, 10**6).min(axis=2), 0)
    xmax = np.where(any_c, np.where(valid_color, ix_color, -1).max(axis=2), 0)
    u0 = (xmin // 64) * 64
    WC = _ceil_to(int((xmax - u0).max()) + 1, LANE)
    Wc = _ceil_to(W, LANE) + WC  # panel + WC <= Wc for any u0 <= W-1
    uorig = u0.astype(np.int32).reshape(nsuper, nsub, 1)
    lcc = np.where(valid_color, ix_color, -1).astype(np.int32)

    return BlockTables(
        grid_shape=grid.shape,
        sub_shape=sub,
        sup_shape=sup,
        nblocks=nblocks,
        nsuper=nsuper,
        nsub=nsub,
        num_cameras=C,
        image_hw=(H, W),
        Hp=Hp,
        n_words=n_words,
        Wc=Wc,
        WH=WH,
        WC=WC,
        color_camera=color_camera,
        pk=jnp.asarray(pk),
        lcc=jnp.asarray(lcc),
        vorig=jnp.asarray(vorig),
        uorig=jnp.asarray(uorig),
        allv=jnp.asarray(allv.astype(np.int32)),
        ry=jnp.asarray(ry, dtype=jnp.bfloat16),
        rx=jnp.asarray(rx, dtype=jnp.bfloat16),
        n_fcells_hw=(hf, wf),
        perm=perm,
    )


# ---------------------------------------------------------------------------
# Device-side table build (no O(N) arrays cross the host↔device link)
# ---------------------------------------------------------------------------

_SUS_EPS = 2e-3  # ≫ observed f32 projection error (~1e-4 px at 644-px scale)
_SUS_Z_EPS = 8.0  # mm of camera-frame depth below which f32 1/Xz blows up


@functools.partial(jax.jit, static_argnames=("hw",))
def _proj_suspicion_chunk(jxc, jy, jz, rvec, tvec, K, dist, hw):
    """f32 truncated projection of an x-slab + boundary suspicion.

    Same suspicion rules as ``carve.exact_truncated_projections`` (pixel
    fraction band, bounds band, principal-plane depth band — ADVICE r1):
    a voxel is *suspicious* iff f32 rounding could plausibly flip its
    truncated index or validity; everything else is provably equal to
    the f64 result.  Returns (iy, ix, valid) on device plus a packed
    suspicion bitmap (the only O(chunk) host pull)."""
    h, w = hw
    gx, gy, gz = jnp.meshgrid(jxc, jy, jz, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    uv = cam_ops.project_points(pts, rvec, tvec, K, dist, xp=jnp)
    x, y = uv[:, 0], uv[:, 1]
    fx = x - jnp.floor(x)
    fy = y - jnp.floor(y)
    R = cam_ops.rodrigues(rvec, xp=jnp)
    depth = pts @ R[2, :] + tvec[2]
    eps = _SUS_EPS
    suspicious = (
        (fx < eps) | (fx > 1 - eps) | (fy < eps) | (fy > 1 - eps)
        | (jnp.abs(x) < eps) | (jnp.abs(x - w) < eps)
        | (jnp.abs(y) < eps) | (jnp.abs(y - h) < eps)
        | (jnp.abs(depth) < _SUS_Z_EPS)
    )
    valid = (y >= 0) & (y < h) & (x >= 0) & (x < w)
    iy = jnp.where(valid, jnp.trunc(y), 0).astype(jnp.int32)
    ix = jnp.where(valid, jnp.trunc(x), 0).astype(jnp.int32)
    return iy, ix, valid, jnp.packbits(suspicious)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _apply_corrections(iy, ix, valid, sidx, iy_e, ix_e, valid_e):
    """Scatter f64-rechecked values over the suspicious voxels.

    ``sidx`` is padded to a bucket size with the out-of-bounds index N
    (mode='drop' ignores those slots), so recompiles are bounded by the
    number of distinct bucket sizes, not suspicious counts."""
    iy = iy.at[sidx].set(iy_e, mode="drop")
    ix = ix.at[sidx].set(ix_e, mode="drop")
    valid = valid.at[sidx].set(valid_e, mode="drop")
    return iy, ix, valid


def build_block_tables_device(
    cameras: Sequence[CameraParams],
    grid: GridConfig,
    image_hw: Tuple[int, int],
    sub: Tuple[int, int, int] = (8, 8, 8),
    sup: Tuple[int, int, int] = (2, 2, 4),
    color_camera: int = 1,
    chunk_voxels: int = 1 << 24,
) -> BlockTables:
    """Fully device-side block-table build, bit-identical to the f64 host
    build (``accelerate=False``; equality is test-gated at 32³).

    The pure-host build is minutes-per-camera at 512³ on a one-core host
    (f64 projection of 1.3×10⁸ points), and the half-device variant that
    pulls index planes to the host for packing moves 4×~540 MB across
    the link.  Here *nothing* of size O(N) crosses the link in either
    direction, and nothing of size O(N) beyond the result tables exists
    on device (a flat 512³ build would hold ~10 half-GB projection
    temporaries next to the 4.3 GB pk table and OOM a 16 GB chip) —
    every step is chunked over the outermost superblock axis
    (``chunk_voxels`` per piece):

      * f32 projection + truncation on device; only a chunk/8-byte
        packed suspicion bitmap is pulled;
      * the suspicious set (boundary-band voxels, ~0.1-1 %) is
        re-projected in f64 on host and scattered back (drop-mode
        scatter, power-of-two bucket padding);
      * blocking (a pure reshape/transpose), the packed-geometry word,
        per-block row windows, activity spans, and color tables are all
        computed on device; per-(camera, chunk) results land in donated
        accumulator buffers via traced-index ``dynamic_update_slice``
        (one compiled program for all cameras and chunks);
      * only the static window scalars (WH/WC) are pulled.
    """
    H, W = image_hw
    C = len(cameras)
    _check_block_geometry(grid, sub, sup, image_hw)

    perm, nblocks = _blocked_permutation(grid.shape, sub, sup)
    nsuper, nsub, _ = perm.shape
    n_words = _ceil_to(W, WORD_BITS) // WORD_BITS
    nblk = nsuper * nsub
    hf = -(-H // FCELL)
    wf = -(-W // FCELL)
    hf_p = _ceil_to(hf, LANE)
    wf_p = _ceil_to(wf, LANE)
    N = int(np.prod(grid.shape))
    xs, ys, zs = grid.axis_ranges()
    jy = jnp.asarray(ys.astype(np.float32))
    jz = jnp.asarray(zs.astype(np.float32))

    sbx, sby, sbz = sub
    spx, spy, spz = sup
    g = tuple(n // (s * p) for n, s, p in zip(grid.shape, sub, sup))
    ny, nz = grid.shape[1], grid.shape[2]

    # chunk the build over the outermost superblock axis: gx is the
    # slowest-varying index of both the canonical order and the
    # superblock order, so a gx-range is a contiguous slice of BOTH the
    # flat voxel array and every (nsuper, ...) table — no O(N) array
    # (and no >O(N/nchunks) temporary) ever exists on device or host
    vox_per_gx = sbx * spx * ny * nz
    cg = max(1, min(g[0], chunk_voxels // max(vox_per_gx, 1)))
    while g[0] % cg:
        cg -= 1
    nchunks = g[0] // cg
    nsuper_c = cg * g[1] * g[2]  # superblocks per chunk
    x_per_chunk = cg * sbx * spx  # canonical x planes per chunk
    Nc = x_per_chunk * ny * nz  # voxels per chunk

    def to_blocked(a):
        a = a.reshape(cg, spx, sbx, g[1], spy, sby, g[2], spz, sbz)
        return a.transpose(0, 3, 6, 1, 4, 7, 2, 5, 8).reshape(
            nsuper_c, nsub, BV
        )

    lanes_h = jnp.arange(hf_p, dtype=jnp.int32)
    lanes_w = jnp.arange(wf_p, dtype=jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(3, 4, 5, 6, 7))
    def blocked_update(iy, ix, valid, pk_buf, vorig_buf, allv_buf,
                       ry_buf, rx_buf, c, so):
        """Fold one (camera, chunk) into the accumulator tables.

        ``c``/``so`` (camera, superblock offset) are traced scalars, so
        all cameras and chunks share ONE compiled program."""
        iy_b = to_blocked(iy)
        ix_b = to_blocked(ix)
        valid_b = to_blocked(valid)
        row_f = jnp.where(valid_b, iy_b, 1023)
        pk_c = (
            (row_f << 10) | ((ix_b // WORD_BITS) << 3) | (ix_b % WORD_BITS)
        ).astype(jnp.int32)
        pk_buf = jax.lax.dynamic_update_slice(
            pk_buf, pk_c[:, :, None, :], (so, 0, c, 0)
        )
        allv_c = jax.lax.dynamic_slice(
            allv_buf, (so, 0), (nsuper_c, nsub)
        ) & valid_b.all(axis=2)
        allv_buf = jax.lax.dynamic_update_slice(allv_buf, allv_c, (so, 0))
        any_v = valid_b.any(axis=2)
        big = jnp.int32(10 ** 6)
        ymin = jnp.where(any_v, jnp.where(valid_b, iy_b, big).min(axis=2), 0)
        ymax = jnp.where(any_v, jnp.where(valid_b, iy_b, -1).max(axis=2), 0)
        v0 = (ymin // 8) * 8
        vorig_buf = jax.lax.dynamic_update_slice(
            vorig_buf, v0[:, :, None].astype(jnp.int32), (so, 0, c)
        )
        whmax = jnp.max(ymax - v0) + 1
        xmin = jnp.where(any_v, jnp.where(valid_b, ix_b, big).min(axis=2), 0)
        xmax = jnp.where(any_v, jnp.where(valid_b, ix_b, -1).max(axis=2), 0)
        nblk_c = nsuper_c * nsub
        anyf = any_v.reshape(nblk_c, 1)
        y0F = (ymin // FCELL).reshape(nblk_c, 1)
        y1F = (ymax // FCELL).reshape(nblk_c, 1)
        x0F = (xmin // FCELL).reshape(nblk_c, 1)
        x1F = (xmax // FCELL).reshape(nblk_c, 1)
        ry_c = (
            anyf & (lanes_h[None, :] >= y0F) & (lanes_h[None, :] <= y1F)
        ).astype(jnp.bfloat16)
        rx_c = (
            anyf & (lanes_w[None, :] >= x0F) & (lanes_w[None, :] <= x1F)
        ).astype(jnp.bfloat16)
        ry_buf = jax.lax.dynamic_update_slice(
            ry_buf, ry_c[None], (c, so * nsub, 0)
        )
        rx_buf = jax.lax.dynamic_update_slice(
            rx_buf, rx_c[None], (c, so * nsub, 0)
        )
        return pk_buf, vorig_buf, allv_buf, ry_buf, rx_buf, whmax

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def color_tables(ix, valid, lcc_buf, uorig_buf, so):
        ix_b = to_blocked(ix)
        valid_b = to_blocked(valid)
        lcc_c = jnp.where(valid_b, ix_b, -1).astype(jnp.int32)
        lcc_buf = jax.lax.dynamic_update_slice(lcc_buf, lcc_c, (so, 0, 0))
        any_c = valid_b.any(axis=2)
        big = jnp.int32(10 ** 6)
        xmin = jnp.where(any_c, jnp.where(valid_b, ix_b, big).min(axis=2), 0)
        xmax = jnp.where(any_c, jnp.where(valid_b, ix_b, -1).max(axis=2), 0)
        u0 = (xmin // 64) * 64
        uorig_buf = jax.lax.dynamic_update_slice(
            uorig_buf, u0.astype(jnp.int32)[:, :, None], (so, 0, 0)
        )
        wcmax = jnp.max(xmax - u0) + 1
        return lcc_buf, uorig_buf, wcmax

    pk_buf = jnp.zeros((nsuper, nsub, C, BV), jnp.int32)
    vorig_buf = jnp.zeros((nsuper, nsub, C), jnp.int32)
    allv_buf = jnp.ones((nsuper, nsub), bool)
    ry_buf = jnp.zeros((C, nblk, hf_p), jnp.bfloat16)
    rx_buf = jnp.zeros((C, nblk, wf_p), jnp.bfloat16)
    lcc_buf = jnp.zeros((nsuper, nsub, BV), jnp.int32)
    uorig_buf = jnp.zeros((nsuper, nsub, 1), jnp.int32)
    need_wh = 8
    wc_need = 1

    for c, cp in enumerate(cameras):
        rvec_d = jnp.asarray(cp.rvec, jnp.float32)
        tvec_d = jnp.asarray(cp.tvec, jnp.float32)
        K_d = jnp.asarray(cp.K, jnp.float32)
        dist_d = jnp.asarray(cp.dist, jnp.float32)
        for ch in range(nchunks):
            x0 = ch * x_per_chunk
            jxc = jnp.asarray(
                xs[x0 : x0 + x_per_chunk].astype(np.float32)
            )
            iyd, ixd, validd, sus_packed = _proj_suspicion_chunk(
                jxc, jy, jz, rvec_d, tvec_d, K_d, dist_d, (H, W)
            )
            sus_idx = np.flatnonzero(
                np.unpackbits(np.asarray(sus_packed))[:Nc]
            )
            if len(sus_idx):
                # f64 recheck of the suspicious voxels only: world
                # coords straight from the axis samples (no (N, 3)
                # grid materialized)
                gidx = sus_idx + x0 * ny * nz
                pts64 = np.stack(
                    [
                        xs[gidx // (ny * nz)],
                        ys[(gidx // nz) % ny],
                        zs[gidx % nz],
                    ],
                    axis=-1,
                )
                uv_e = cam_ops.project_points(
                    pts64, cp.rvec, cp.tvec, cp.K, cp.dist, xp=np
                )
                x_e, y_e = uv_e[:, 0], uv_e[:, 1]
                valid_e = (y_e >= 0) & (y_e < H) & (x_e >= 0) & (x_e < W)
                iy_e = np.where(valid_e, np.trunc(y_e), 0).astype(np.int32)
                ix_e = np.where(valid_e, np.trunc(x_e), 0).astype(np.int32)
                bucket = max(8, 1 << (len(sus_idx) - 1).bit_length())
                pad = bucket - len(sus_idx)
                sidx = np.concatenate(
                    [sus_idx.astype(np.int64), np.full(pad, Nc, np.int64)]
                ).astype(np.int32)
                iyd, ixd, validd = _apply_corrections(
                    iyd, ixd, validd,
                    jnp.asarray(sidx),
                    jnp.asarray(np.pad(iy_e, (0, pad))),
                    jnp.asarray(np.pad(ix_e, (0, pad))),
                    jnp.asarray(np.pad(valid_e, (0, pad))),
                )
            so = ch * nsuper_c
            if c == color_camera:
                lcc_buf, uorig_buf, wcm = color_tables(
                    ixd, validd, lcc_buf, uorig_buf, so
                )
                wc_need = max(wc_need, int(wcm))
            (pk_buf, vorig_buf, allv_buf, ry_buf, rx_buf,
             whmax) = blocked_update(
                iyd, ixd, validd, pk_buf, vorig_buf, allv_buf,
                ry_buf, rx_buf, c, so,
            )
            need_wh = max(need_wh, int(whmax))
            del iyd, ixd, validd

    WH = _ceil_to(need_wh, 8)
    Hp = _ceil_to(H, 8) + WH
    WC = _ceil_to(wc_need, LANE)
    Wc = _ceil_to(W, LANE) + WC

    # Post-build f64 spot check (ADVICE r3): the device build's
    # bit-identity rests on the boundary-suspicion bands (_SUS_EPS /
    # _SUS_Z_EPS), validated empirically at the production rig's image
    # scale and distortion.  Guard out-of-envelope rigs (much larger
    # images, extreme distortion, near-camera voxels) by re-projecting a
    # random voxel sample in f64 on the host and comparing the packed
    # geometry words — a mismatch means the bands were too narrow for
    # this rig, and silent table corruption would follow.
    rng = np.random.default_rng(0)
    M = min(2048, N)
    so_s = rng.integers(0, nsuper, M)
    sb_s = rng.integers(0, nsub, M)
    sl_s = rng.integers(0, BV, M)
    gidx = perm[so_s, sb_s, sl_s]
    pts64 = np.stack(
        [xs[gidx // (ny * nz)], ys[(gidx // nz) % ny], zs[gidx % nz]],
        axis=-1,
    )
    got_all = np.asarray(
        pk_buf[jnp.asarray(so_s), jnp.asarray(sb_s), :, jnp.asarray(sl_s)]
    )  # (M, C) — one tiny device gather for all cameras
    for c, cp in enumerate(cameras):
        uv_s = cam_ops.project_points(
            pts64, cp.rvec, cp.tvec, cp.K, cp.dist, xp=np
        )
        x_s, y_s = uv_s[:, 0], uv_s[:, 1]
        valid_s = (y_s >= 0) & (y_s < H) & (x_s >= 0) & (x_s < W)
        iy_s = np.where(valid_s, np.trunc(y_s), 0).astype(np.int64)
        ix_s = np.where(valid_s, np.trunc(x_s), 0).astype(np.int64)
        row_s = np.where(valid_s, iy_s, 1023)
        want = (
            (row_s << 10) | ((ix_s // WORD_BITS) << 3) | (ix_s % WORD_BITS)
        ).astype(np.int32)
        bad = np.flatnonzero(got_all[:, c] != want)
        if bad.size:
            raise AssertionError(
                f"device table build failed the f64 spot check: camera "
                f"{c}, {bad.size}/{M} sampled voxels mismatch (first at "
                f"canonical index {int(gidx[bad[0]])}) — this rig is "
                "outside the suspicion-band envelope; rebuild with "
                "accelerate=False (pure f64 host build)"
            )

    return BlockTables(
        grid_shape=grid.shape,
        sub_shape=sub,
        sup_shape=sup,
        nblocks=nblocks,
        nsuper=nsuper,
        nsub=nsub,
        num_cameras=C,
        image_hw=(H, W),
        Hp=Hp,
        n_words=n_words,
        Wc=Wc,
        WH=WH,
        WC=WC,
        color_camera=color_camera,
        pk=pk_buf,
        lcc=lcc_buf,
        vorig=vorig_buf,
        uorig=uorig_buf,
        allv=allv_buf.astype(jnp.int32),
        ry=ry_buf,
        rx=rx_buf,
        n_fcells_hw=(hf, wf),
        perm=perm,
    )


# ---------------------------------------------------------------------------
# Frame packing (XLA ops, run once per frame on device)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("Hp", "n_words"))
def pack_masks(masks: jnp.ndarray, *, Hp: int, n_words: int) -> jnp.ndarray:
    """(C, H, W) u8 masks → (C, Hp, n_words) bf16 of 8-bit packed columns."""
    C, H, W = masks.shape
    bits = (masks > 0).astype(jnp.float32)
    bits = jnp.pad(bits, ((0, 0), (0, Hp - H), (0, n_words * WORD_BITS - W)))
    bits = bits.reshape(C, Hp, n_words, WORD_BITS)
    weights = 2.0 ** jnp.arange(WORD_BITS, dtype=jnp.float32)
    packed = jnp.einsum("chwb,b->chw", bits, weights)
    return packed.astype(jnp.bfloat16)  # values <= 255: exact


@functools.partial(jax.jit, static_argnames=("Hp", "Wc"))
def pack_image(image: jnp.ndarray, *, Hp: int, Wc: int) -> jnp.ndarray:
    """(H, W, 3) u8 BGR frame → (2, 3, Hp, Wc) bf16 channel planes (exact).

    Copy 0 is the frame; copy 1 is shifted left by 64 columns, so any
    64-aligned column origin is a 128-aligned slice into one of the copies.
    """
    H, W, _ = image.shape
    planes = jnp.transpose(image, (2, 0, 1)).astype(jnp.bfloat16)
    base = jnp.pad(planes, ((0, 0), (0, Hp - H), (0, Wc - W)))
    shifted = jnp.pad(
        planes[:, :, 64:], ((0, 0), (0, Hp - H), (0, Wc - W + 64))
    )
    return jnp.stack([base, shifted])


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _make_kernel(C, nsub, WH, WC, n_words, color_camera, views_threshold):
    def kernel(
        pk_ref,  # (1, nsub, C, BV) i32 packed row/word/bit (see BlockTables)
        lcc_ref,  # (1, nsub, BV) i32
        vorig_ref,  # (1, nsub, C) i32
        uorig_ref,  # (1, nsub, 1) i32 (64-aligned color column origin)
        active_ref,  # (1, nsub, 1) i32 — 0 ⇒ provably below threshold
        full_ref,  # (1, nsub, 1) i32 — 1 ⇒ provably fully occupied
        mask_ref,  # (C, Hp, n_words) bf16   — full VMEM resident
        img_ref,  # (2, 3, Hp, Wc) bf16     — full VMEM resident (dual copy)
        count_ref,  # (1, nsub, BV) i32
        color_ref,  # (1, nsub, 3, BV) f32
    ):
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (BV, WH), 1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (BV, n_words), 1)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (BV, WC), 1)
        ones_w = jnp.ones((n_words, 1), jnp.float32)
        ones_c = jnp.ones((WC, 1), jnp.float32)

        def row_dot(a, b):
            """Row-wise dot Σ_j a[i,j]·b[i,j] via elementwise ⊙ + MXU
            ones-contraction (measured faster than a VPU lane-reduce)."""
            ones = ones_w if a.shape[1] == n_words else ones_c
            return jax.lax.dot_general(
                a * b, ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BV, 1)

        def sub_body(s, carry):
            @pl.when(full_ref[0, s, 0] != 0)
            def _full():
                # provably fully occupied: emit counts = C, colors only
                count_ref[0, s, :] = jnp.full((BV,), C, jnp.int32)
                _color_gather(s)

            @pl.when((active_ref[0, s, 0] != 0) & (full_ref[0, s, 0] == 0))
            def _compute():
                counts = jnp.zeros((BV, 1), jnp.float32)
                for c in range(C):
                    v0 = vorig_ref[0, s, c]
                    win = mask_ref[c, pl.ds(pl.multiple_of(v0, 8), WH), :]
                    pkv = pk_ref[0, s, c, :][:, None]
                    lr = pkv >> 10  # 1023 sentinel never matches a window
                    b = pkv & 7
                    # One-hot carrying 2^-b (exact powers of two in bf16):
                    # sel[v, w] = word[v0-window row lr[v], w] · 2^-b[v]
                    scale = pltpu.bitcast(
                        ((127 - b) << 23).astype(jnp.int32), jnp.float32
                    ).astype(jnp.bfloat16)
                    # (cmp → bf16 multiply rather than a broadcast `where`:
                    # Mosaic rejects the i1 relayout the latter needs)
                    oh = (lr == iota_h + v0).astype(jnp.bfloat16) * scale
                    sel = jax.lax.dot_general(
                        oh,
                        win,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (BV, n_words) — exact: bf16 words ≤ 255, 2^-b exact
                    awv = (pkv >> 3) & 127
                    shifted = jnp.floor(
                        row_dot(sel, (awv == iota_w).astype(jnp.float32))
                    )
                    bit = shifted - 2.0 * jnp.floor(shifted * 0.5)
                    counts = counts + bit
                count_ref[0, s, :] = counts[:, 0].astype(jnp.int32)

                # Color gather — pruned by occupancy: only ~1/3 of active
                # sub-blocks contain a voxel reaching the view threshold;
                # the rest never have their colors read downstream.
                block_max = jnp.max(counts)

                @pl.when(block_max >= views_threshold)
                def _color():
                    _color_gather(s)

            return carry

        def _color_gather(s):
                # a WC-column panel from one of the two 64-shifted copies
                v0c = vorig_ref[0, s, color_camera]
                u0c = uorig_ref[0, s, 0]
                copy_idx = jax.lax.rem(u0c // 64, 2)  # 0: aligned, 1: shifted
                panel = (u0c // LANE) * LANE
                lrc = pk_ref[0, s, color_camera, :][:, None] >> 10
                ohc = (lrc == iota_h + v0c).astype(jnp.bfloat16)
                relc = lcc_ref[0, s, :][:, None] - u0c
                oh_col = (relc == iota_c).astype(jnp.float32)
                for ch in range(3):
                    winc = img_ref[
                        copy_idx,
                        ch,
                        pl.ds(pl.multiple_of(v0c, 8), WH),
                        pl.ds(pl.multiple_of(panel, LANE), WC),
                    ]
                    selc = jax.lax.dot_general(
                        ohc,
                        winc,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (BV, WC) — exact: u8 channel values in bf16
                    color_ref[0, s, ch, :] = row_dot(selc, oh_col)[:, 0]

        # skip inactive superblocks entirely (their outputs are masked to
        # zero outside the kernel — cheaper than in-kernel zero stores)
        nactive = 0
        for s in range(nsub):
            nactive += active_ref[0, s, 0]

        @pl.when(nactive != 0)
        def _run():
            jax.lax.fori_loop(0, nsub, sub_body, 0)

    return kernel


def _blocked_to_canonical(x_blocked, sub, sup, nblocks):
    """(nsuper, nsub*BV, *t) blocked layout → (N, *t) flat canonical C-order.

    Pure reshape + transpose — runs at memory bandwidth, no gather.
    """
    gx, gy, gz = nblocks
    spx, spy, spz = sup
    sbx, sby, sbz = sub
    trailing = x_blocked.shape[2:]
    x = x_blocked.reshape((gx, gy, gz, spx, spy, spz, sbx, sby, sbz) + trailing)
    perm = (0, 3, 6, 1, 4, 7, 2, 5, 8)
    inv = [perm.index(k) for k in range(9)] + list(range(9, 9 + len(trailing)))
    n = x_blocked.shape[0] * x_blocked.shape[1]
    return x.transpose(inv).reshape((n,) + trailing)


def _block_activity(masks, views_threshold, allv, ry, rx,
                    compute_full: bool = True):
    """(C, H, W) u8 masks → per-sub-block (active, full) i32 flags.

    Both conservative & exact, both via the factorized bbox→fine-cell
    covering relation (see BlockTables):
      * active = 0 only when fewer than views_threshold cameras have any
        foreground pixel among the fine cells covering the block's
        projected footprint bbox — then no voxel can reach the
        threshold;
      * full = 1 only when EVERY covering fine cell is entirely
        foreground in EVERY camera AND every projection is valid (static
        ``allv``) — then every voxel counts C views, so the kernel can
        emit full occupancy without computing.  Hull interiors dominate
        active blocks at large grids.
    """
    C, H, W = masks.shape
    hf_p, wf_p = ry.shape[2], rx.shape[2]
    fg = (masks > 0).astype(jnp.bfloat16)
    # padding (zeros): border cells are never "full" (conservative) and
    # contribute no foreground to the any-test
    fgf = jnp.pad(fg, ((0, 0), (0, hf_p * FCELL - H), (0, wf_p * FCELL - W)))
    fmax = jax.lax.reduce_window(
        fgf, jnp.bfloat16(0), jax.lax.max,
        (1, FCELL, FCELL), (1, FCELL, FCELL), "VALID",
    )  # (C, hf_p, wf_p)
    fmin = jax.lax.reduce_window(
        fgf, jnp.bfloat16(1), jax.lax.min,
        (1, FCELL, FCELL), (1, FCELL, FCELL), "VALID",
    )

    def bilinear(M):
        # out[c, b] = Σ_i Σ_j ry[c,b,i]·M[c,i,j]·rx[c,b,j]
        h1 = jnp.einsum(
            "cbi,cij->cbj", ry, M, preferred_element_type=jnp.float32
        )
        return jnp.sum(h1 * rx.astype(jnp.float32), axis=-1)  # (C, nblk)

    hits = bilinear(fmax)
    cam_any = (hits > 0).astype(jnp.int32)
    active = (cam_any.sum(axis=0) >= views_threshold).astype(jnp.int32)

    if not compute_full:
        return active, jnp.zeros_like(active)
    holes = bilinear(jnp.bfloat16(1) - fmin)
    cam_full = (holes == 0).astype(jnp.int32)
    full = (cam_full.sum(axis=0) == C).astype(jnp.int32)
    full = full * allv.reshape(-1)
    return active, full


@functools.partial(
    jax.jit,
    static_argnames=("tables_static", "views_threshold", "interpret", "layout"),
)
def _carve_blocked_device(
    masks,
    image,
    pk,
    lcc,
    vorig,
    uorig,
    allv,
    ry,
    rx,
    *,
    tables_static,
    views_threshold: int,
    interpret: bool = False,
    layout: str = "canonical",
):
    (C, nsuper, nsub, WH, WC, n_words, color_camera, sub, sup, nblocks,
     Hp, Wc) = tables_static
    packed_masks = pack_masks(masks, Hp=Hp, n_words=n_words)
    packed_img = pack_image(image, Hp=Hp, Wc=Wc)
    active, full = _block_activity(masks, views_threshold, allv, ry, rx)
    active = active.reshape(nsuper, nsub, 1)
    full = full.reshape(nsuper, nsub, 1)
    kernel = _make_kernel(C, nsub, WH, WC, n_words, color_camera,
                          views_threshold)

    count_b, color_b = pl.pallas_call(
        kernel,
        grid=(nsuper,),
        in_specs=[
            pl.BlockSpec((1, nsub, C, BV), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsub, BV), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsub, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nsub, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nsub, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nsub, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # full flags
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed masks (resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed image (resident)
        ],
        out_specs=[
            pl.BlockSpec((1, nsub, BV), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsub, 3, BV), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsuper, nsub, BV), jnp.int32),
            jax.ShapeDtypeStruct((nsuper, nsub, 3, BV), jnp.float32),
        ],
        interpret=interpret,
    )(pk, lcc, vorig, uorig, active, full, packed_masks, packed_img)

    # inactive sub-blocks were never written: mask their garbage to zero,
    # threshold, and narrow to u8 *before* the blocked→canonical transpose
    # (the transpose runs at memory bandwidth; 8.4 MB of u8 beats 33 MB of
    # i32/f32 by ~4×).
    act_b = active > 0  # (nsuper, nsub, 1)
    occ_b = (act_b & (count_b >= views_threshold)).astype(jnp.uint8)
    color_u8 = jnp.where(
        occ_b[:, :, None, :] > 0, color_b, 0.0
    ).astype(jnp.uint8)
    if layout == "blocked":
        # skip the blocked→canonical transpose entirely (the production
        # compaction path consumes blocked layout + tables.perm directly)
        return occ_b, color_u8
    occ = _blocked_to_canonical(
        occ_b.reshape(nsuper, nsub * BV), sub, sup, nblocks
    )
    # (nsuper, nsub, 3, BV) → (nsuper, nsub*BV, 3) → canonical (N, 3)
    color_v = jnp.transpose(color_u8, (0, 1, 3, 2)).reshape(
        nsuper, nsub * BV, 3
    )
    colors = _blocked_to_canonical(color_v, sub, sup, nblocks)
    return occ.astype(jnp.bool_), colors


def carve_blocked(
    masks: jnp.ndarray,  # (C, H, W) u8
    image: jnp.ndarray,  # (H, W, 3) u8 BGR frame of the color camera
    tables: BlockTables,
    *,
    views_threshold: int = 4,
    interpret: bool = False,
    layout: str = "canonical",
):
    """Full-frame fused carve via the blocked Pallas kernel.

    Returns (occupancy (N,) bool, colors (N, 3) u8 BGR) in canonical voxel
    order (matching GridConfig.voxel_points()).  Colors are gathered only
    for sub-blocks that can contain occupied voxels; elsewhere they are 0
    (the reference only ever reads colors of occupied voxels,
    assignment.py:127-133).
    """
    return _carve_blocked_device(
        masks,
        image,
        tables.pk,
        tables.lcc,
        tables.vorig,
        tables.uorig,
        tables.allv,
        tables.ry,
        tables.rx,
        tables_static=tables_static_tuple(tables),
        views_threshold=views_threshold,
        interpret=interpret,
        layout=layout,
    )


def tables_static_tuple(tables: BlockTables):
    """Hashable static geometry for the jitted device wrappers."""
    return (
        tables.num_cameras, tables.nsuper, tables.nsub, tables.WH,
        tables.WC, tables.n_words, tables.color_camera, tables.sub_shape,
        tables.sup_shape, tables.nblocks, tables.Hp, tables.Wc,
    )


# ---------------------------------------------------------------------------
# Host-side helpers for the blocked output layout
# ---------------------------------------------------------------------------


def canonicalize_host(x_blocked: np.ndarray, tables: BlockTables) -> np.ndarray:
    """Blocked (nsuper, nsub, BV[, t]) → canonical (N[, t]) on host."""
    x = np.asarray(x_blocked)
    flat = x.reshape((tables.nsuper * tables.nsub * BV,) + x.shape[3:])
    out = np.empty_like(flat)
    out[tables.perm.ravel()] = flat
    return out


def compact_voxels_blocked(
    occ_blocked,  # (nsuper, nsub, BV) u8 device or host
    colors_blocked,  # (nsuper, nsub, 3, BV) u8
    tables: BlockTables,
    grid: GridConfig,
    scaling_factor: float = 64.0,
):
    """Compaction into the viewer contract straight from blocked layout.

    Identical semantics to ops.carve.compact_voxels (assignment.py:119-133)
    — positions truncated, (x, -z, y)/scale axis swap, BGR→RGB colors —
    but indexes the static blocked positions table, skipping the device-side
    blocked→canonical transpose of the full grid.  Output row order is
    blocked rather than canonical scan order (order is not part of the
    viewer contract — the reference emits dict order).
    """
    occ = np.asarray(occ_blocked).ravel().astype(bool)
    col = np.asarray(colors_blocked)  # (nsuper, nsub, 3, BV)
    pts = grid.voxel_points()[tables.perm.ravel()]  # blocked order
    kept = np.trunc(pts[occ])
    positions = np.stack(
        [
            kept[:, 0] / scaling_factor,
            -(kept[:, 2] / scaling_factor),
            kept[:, 1] / scaling_factor,
        ],
        axis=-1,
    ).astype(np.float32)
    col_v = np.moveaxis(col, 2, 3).reshape(-1, 3)[occ]
    rgb = col_v[:, ::-1].astype(np.float32) / 255.0
    return positions, rgb


WIRE_K_BLOCKS = 512  # sub-blocks with any occupied voxel (rig: ~263)
WIRE_K_VOXELS = 98304  # occupied-voxel color slots (rig: ~57k)


@functools.partial(jax.jit, static_argnames=("k_blocks", "k_voxels"))
def pack_blocked_outputs(occ_b, col_b, k_blocks: int = WIRE_K_BLOCKS,
                         k_voxels: int = WIRE_K_VOXELS):
    """Wire-format compression of blocked carve outputs for slow links.

    occupancy → per-OCCUPIED-sub-block bitmaps (≤ ``k_blocks`` of them,
    8 voxels/byte little-endian; empty blocks carry no bytes at all —
    the r4 format shipped the full-grid bitmap, 262 KB at 128³);
    colors → compacted to the OCCUPIED voxels only in ascending blocked
    order (≤ ``k_voxels`` rows; the r4 format gathered whole 512-voxel
    blocks, ~58 % of whose slots were empty on the rig).  Per-frame
    payload at 128³: ~1.05 MB (r4) → ~0.32 MB.  Both counts returned;
    overflow of either capacity is flagged so the caller can fall back
    to the uncompressed tensors — lossless either way.

    Returns ``(packed_k (k_blocks, BV/8) u8, ids (k_blocks,) i32,
    n_blocks (), n_vox (), cols (k_voxels, 3) u8 BGR, overflow ())``.
    """
    from vbr_tpu.ops import marching_cubes as _mc

    nsuper, nsub, BVv = occ_b.shape
    occ_u = (occ_b > 0).astype(jnp.uint8)
    bits = occ_u.reshape(nsuper, nsub, BVv // 8, 8).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(8, dtype=jnp.uint32))
    packed = (bits * weights).sum(-1).astype(jnp.uint8)

    flat_any = occ_u.reshape(nsuper * nsub, BVv).max(axis=1) > 0
    cs = jnp.cumsum(flat_any.astype(jnp.int32))
    n_blocks = cs[-1]
    pos = jnp.searchsorted(cs, jnp.arange(1, k_blocks + 1, dtype=jnp.int32))
    ids = jnp.clip(pos, 0, nsuper * nsub - 1).astype(jnp.int32)
    packed_k = jnp.take(
        packed.reshape(nsuper * nsub, BVv // 8), ids, axis=0)

    # occupied-voxel color compaction (ascending blocked voxel order —
    # identical to the bit order of the included blocks, so the decoder
    # needs no per-voxel index): the scatter-free two-level compaction
    # of ops.marching_cubes (jnp.nonzero's bincount scatter costs 18 ms
    # at this size)
    total = nsuper * nsub * BVv
    kv = min(k_voxels, total)
    flat_occ = occ_u.reshape(-1) > 0
    nblk128 = -(-total // _mc._COMPACT_BLOCK)
    vidx, n_vox = _mc._compact_active(flat_occ, kv, min(nblk128, kv))
    blk = vidx // BVv
    within = vidx % BVv
    cf = col_b.reshape(-1)
    base = blk * (3 * BVv) + within
    cols = jnp.stack(
        [jnp.take(cf, base + c * BVv) for c in range(3)], axis=-1
    ).astype(jnp.uint8)  # (kv, 3) BGR
    if kv < k_voxels:
        cols = jnp.pad(cols, ((0, k_voxels - kv), (0, 0)))
    ovf = (n_blocks > k_blocks) | (n_vox > kv)
    return packed_k, ids, n_blocks, n_vox, cols, ovf


def encode_wire(packed_k, ids, n_blocks, n_vox, cols, any_ovf):
    """Concatenate packed outputs into ONE u8 buffer → one device→host
    flush per frame (each separate fetch pays the link's fixed ~30 ms
    round-trip on tunneled setups)."""
    head = jax.lax.bitcast_convert_type(
        jnp.stack([any_ovf.astype(jnp.int32), n_blocks.astype(jnp.int32),
                   n_vox.astype(jnp.int32)]),
        jnp.uint8,
    ).ravel()  # 12 bytes
    ids_b = jax.lax.bitcast_convert_type(ids, jnp.uint8).ravel()
    return jnp.concatenate(
        [head, ids_b, packed_k.ravel(), cols.ravel()]
    )


def decode_wire(wire_host, k_blocks=WIRE_K_BLOCKS,
                k_voxels=WIRE_K_VOXELS, total_voxels=None):
    """Inverse of :func:`encode_wire` (host, zero-copy views).

    ``total_voxels`` (= grid voxel count) clamps ``k_voxels`` the same
    way the encoder does for small grids."""
    if total_voxels is not None:
        k_voxels = min(k_voxels, total_voxels)
    buf = np.asarray(wire_host)
    any_ovf, n_blocks, n_vox = np.frombuffer(buf[:12].tobytes(), np.int32)
    o = 12
    ids = np.frombuffer(buf[o:o + 4 * k_blocks].tobytes(), np.int32)
    o += 4 * k_blocks
    nb = k_blocks * (BV // 8)
    packed_k = buf[o:o + nb].reshape(k_blocks, BV // 8)
    o += nb
    cols = buf[o:o + k_voxels * 3].reshape(k_voxels, 3)
    return int(any_ovf), int(n_blocks), int(n_vox), ids, packed_k, cols


def viewer_arrays_from_packed(
    packed_k, ids, n_blocks, n_vox, cols, tables: BlockTables,
    grid: GridConfig, scaling_factor: float = 64.0,
):
    """Host-side unpack of :func:`pack_blocked_outputs` into the viewer
    contract (same semantics as compact_voxels_blocked)."""
    packed_k = np.asarray(packed_k)
    ids = np.asarray(ids)
    n_blocks = int(np.asarray(n_blocks))
    n_vox = int(np.asarray(n_vox))
    cols = np.asarray(cols)

    bits = np.unpackbits(
        packed_k[:n_blocks].reshape(-1), bitorder="little"
    ).astype(bool)  # included blocks, ascending, bit order within
    vox = (
        ids[:n_blocks, None] * BV
        + np.arange(BV, dtype=np.int64)[None, :]
    ).reshape(-1)[bits]
    assert len(vox) == n_vox, "wire corruption: bitmap/color count skew"

    pts = _blocked_points_cache(tables, grid)  # pre-truncated f32
    kept = pts[vox]
    positions = np.stack(
        [
            kept[:, 0] / scaling_factor,
            -(kept[:, 2] / scaling_factor),
            kept[:, 1] / scaling_factor,
        ],
        axis=-1,
    ).astype(np.float32)
    # colors arrive voxel-compacted in the SAME ascending blocked order
    rgb = cols[:n_vox, ::-1].astype(np.float32) / 255.0
    return positions, rgb


_PTS_CACHE = {}


def _blocked_points_cache(tables: BlockTables, grid: GridConfig):
    # key on the values perm is derived from (id() of a dead array can be
    # reused by a later allocation); world extents must participate — two
    # grids with equal voxel counts but different bounds have different
    # voxel_points
    key = (
        grid.shape,
        grid.x_min, grid.x_max,
        grid.y_min, grid.y_max,
        grid.z_min, grid.z_max,
        tables.sub_shape, tables.sup_shape,
    )
    if key not in _PTS_CACHE:
        # f32 + trunc precomputed: voxel coords are integer mm (reference
        # grid steps are whole mm), exact in f32 — halves host indexing cost
        _PTS_CACHE[key] = np.trunc(
            grid.voxel_points()[tables.perm.ravel()]
        ).astype(np.float32)
    return _PTS_CACHE[key]


# ---------------------------------------------------------------------------
# Multi-frame batched carving (offline video throughput)
# ---------------------------------------------------------------------------
#
# The one-hot matrices depend only on rig geometry, so N frames can share
# them: frames are packed along the lane dimension (lane j of a mask row
# holds word j % n_words of frame j // n_words), the row-select matmul's
# RHS widens from n_words to N*n_words lanes, and a constant block-diagonal
# ones matrix reduces the word-selected values back to per-frame columns.
# One kernel launch carves N frames; fixed dispatch + one-hot costs
# amortize N-fold.  Colors are NOT gathered in-kernel (N color frames do
# not fit VMEM); callers gather them per frame at occupied voxels only —
# a tiny XLA gather (~57k voxels) instead of the 8.4M-element table walk.


def pack_masks_frames(masks: jnp.ndarray, *, Hp: int, n_words: int):
    """(NF, C, H, W) u8 masks → (C, Hp, NF·n_words) bf16, frame-major lanes."""
    packed = jax.vmap(
        functools.partial(pack_masks, Hp=Hp, n_words=n_words)
    )(masks)  # (NF, C, Hp, n_words)
    NF = masks.shape[0]
    C = masks.shape[1]
    return jnp.transpose(packed, (1, 2, 0, 3)).reshape(C, Hp, NF * n_words)


def _make_counts_kernel(C, nsub, WH, NF, n_words, views_threshold):
    NW = NF * n_words

    def kernel(
        pk_ref,  # (1, nsub, C, BV) i32 packed row/word/bit
        vorig_ref,  # (1, nsub, C) i32 SMEM
        active_ref,  # (1, nsub, 1) i32 SMEM
        full_ref,  # (1, nsub, 1) i32 SMEM — full in EVERY frame
        mask_ref,  # (C, Hp, NW) bf16 — VMEM resident
        count_ref,  # (1, nsub, BV, NF) i32
    ):
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (BV, WH), 1)
        iota_nw = jax.lax.broadcasted_iota(jnp.int32, (BV, NW), 1)
        wmod = jax.lax.rem(iota_nw, n_words)
        # block-diagonal per-frame reduction: bd[j, f] = (j // n_words == f)
        row_f = jax.lax.broadcasted_iota(jnp.int32, (NW, NF), 0) // n_words
        col_f = jax.lax.broadcasted_iota(jnp.int32, (NW, NF), 1)
        bd = (row_f == col_f).astype(jnp.float32)

        def sub_body(s, carry):
            @pl.when(full_ref[0, s, 0] != 0)
            def _full():
                count_ref[0, s, :, :] = jnp.full((BV, NF), C, jnp.int32)

            @pl.when((active_ref[0, s, 0] != 0) & (full_ref[0, s, 0] == 0))
            def _compute():
                counts = jnp.zeros((BV, NF), jnp.float32)
                for c in range(C):
                    v0 = vorig_ref[0, s, c]
                    win = mask_ref[c, pl.ds(pl.multiple_of(v0, 8), WH), :]
                    pkv = pk_ref[0, s, c, :][:, None]
                    lr = pkv >> 10
                    b = pkv & 7
                    scale = pltpu.bitcast(
                        ((127 - b) << 23).astype(jnp.int32), jnp.float32
                    ).astype(jnp.bfloat16)
                    oh = (lr == iota_h + v0).astype(jnp.bfloat16) * scale
                    sel = jax.lax.dot_general(
                        oh, win, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (BV, NW) — word·2⁻ᵇ of each frame's word column
                    awv = (pkv >> 3) & 127
                    R = sel * (awv == wmod).astype(jnp.float32)
                    shifted = jnp.floor(jax.lax.dot_general(
                        R, bd, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ))  # (BV, NF) — exact: one nonzero per (voxel, frame)
                    counts = counts + (
                        shifted - 2.0 * jnp.floor(shifted * 0.5)
                    )
                count_ref[0, s, :, :] = counts.astype(jnp.int32)

            return carry

        nactive = 0
        for s in range(nsub):
            nactive += active_ref[0, s, 0]

        @pl.when(nactive != 0)
        def _run():
            jax.lax.fori_loop(0, nsub, sub_body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("tables_static", "views_threshold", "interpret"),
)
def _carve_frames_device(
    masks,  # (NF, C, H, W) u8
    pk, vorig, allv, ry, rx,
    *,
    tables_static,
    views_threshold: int,
    interpret: bool = False,
):
    (C, nsuper, nsub, WH, WC, n_words, color_camera, sub, sup, nblocks,
     Hp, Wc) = tables_static
    NF = masks.shape[0]
    packed = pack_masks_frames(masks, Hp=Hp, n_words=n_words)
    # conservative union activity: a block is active if the per-frame
    # union of foreground could reach the view threshold in its footprint;
    # full only when the per-frame INTERSECTION is fully foreground (then
    # every frame's count is exactly C for every voxel)
    union = jnp.max(masks, axis=0)
    inter = jnp.min(masks, axis=0)
    active, _ = _block_activity(union, views_threshold, allv, ry, rx,
                                compute_full=False)
    _, full = _block_activity(inter, views_threshold, allv, ry, rx)
    active = active.reshape(nsuper, nsub, 1)
    full = full.reshape(nsuper, nsub, 1)
    kernel = _make_counts_kernel(C, nsub, WH, NF, n_words, views_threshold)

    (count_b,) = pl.pallas_call(
        kernel,
        grid=(nsuper,),
        in_specs=[
            pl.BlockSpec((1, nsub, C, BV), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsub, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nsub, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nsub, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # full flags
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed masks
        ],
        out_specs=[
            pl.BlockSpec((1, nsub, BV, NF), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsuper, nsub, BV, NF), jnp.int32),
        ],
        interpret=interpret,
    )(pk, vorig, active, full, packed)

    occ_b = ((active[..., None] > 0)
             & (count_b >= views_threshold)).astype(jnp.uint8)
    occ = _blocked_to_canonical(
        occ_b.reshape(nsuper, nsub * BV, NF), sub, sup, nblocks
    )  # (N, NF)
    return jnp.transpose(occ, (1, 0)).astype(jnp.bool_)  # (NF, N)


def carve_frames_blocked(
    masks: jnp.ndarray,  # (F, C, H, W) u8
    tables: BlockTables,
    *,
    views_threshold: int = 4,
    frames_per_launch: int = 8,
    interpret: bool = False,
):
    """Offline multi-frame carve: Pallas counts, N frames per launch.

    Returns canonical per-frame occupancy (F, N) bool, bit-identical per
    frame to ``carve.carve_from_tables`` (tested).  Colors are not
    computed on device — an offline consumer holds the frames on the host
    and gathers the ~57k occupied-voxel colors there for free
    (:func:`frame_colors_host`); the device stays on the critical path
    for counts only.  Reference analog: the per-frame loop of
    assignment.py:94-133 over a whole video.
    """
    F = masks.shape[0]
    NF = frames_per_launch
    static = tables_static_tuple(tables)
    pad = (-F) % NF
    if pad:
        masks = jnp.concatenate(
            [masks, jnp.zeros((pad,) + masks.shape[1:], masks.dtype)]
        )
    occ_chunks = []
    for start in range(0, F + pad, NF):
        occ_chunks.append(_carve_frames_device(
            masks[start : start + NF],
            tables.pk, tables.vorig, tables.allv,
            tables.ry, tables.rx,
            tables_static=static,
            views_threshold=views_threshold,
            interpret=interpret,
        ))
    return jnp.concatenate(occ_chunks)[:F]  # (F, N)


def frame_colors_host(
    occ: np.ndarray,  # (N,) bool canonical, one frame
    image: np.ndarray,  # (H, W, 3) u8 — the color camera's frame
    lin_idx: np.ndarray,  # (C, N) i32 from carve.build_projection_tables
    color_camera: int = 1,
):
    """Host color gather at occupied voxels (reference assignment.py:127-133
    reads colors only for visible voxels).  Returns (idx (M,), col (M, 3))."""
    occ = np.asarray(occ)
    idx = np.flatnonzero(occ)
    li = np.asarray(lin_idx[color_camera])[idx]
    return idx, np.asarray(image).reshape(-1, 3)[li]
