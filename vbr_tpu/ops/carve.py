"""Voxel carving (visual hull) — projection + mask gather + view reduction.

TPU-native replacement for the reference's precomputed Python lookup table
(``voxel_reconstruction.create_lookup_table``, voxel_reconstruction.py:62-86)
and its ~8.4M-iteration per-frame dict loop
(``update_visible_voxels_and_extract_colors``, voxel_reconstruction.py:89-124).

Two execution paths, both jitted:

  * **table path** — the rig is static, so each voxel's projected integer
    pixel index per camera is precomputed ONCE in float64 (bit-exact versus
    the OpenCV/reference semantics: float bounds check, trunc-to-int
    indexing).  Per frame the carve is then C gathers + an AND/count
    reduction: ``occ = sum_c(valid_c & mask_c[idx_c]) >= threshold``.
  * **fused path** — projection recomputed on the fly in float32 inside the
    kernel (matmul on MXU + distortion polynomial on VPU + gather).  No
    table memory, scales to 512³ grids where an index table would be GBs.

Reference semantics preserved exactly (SURVEY.md §7 "hard parts"):
  * bounds check uses the *float* coordinates: ``0 <= y < H and 0 <= x < W``
    (voxel_reconstruction.py:110),
  * pixel indexing truncates toward zero: ``mask[int(y), int(x)]``
    (voxel_reconstruction.py:112),
  * voxel world coordinates are reported truncated to int
    (``tuple(map(int, voxel))``, voxel_reconstruction.py:84),
  * a voxel is kept iff visible in >= views_threshold cameras
    (assignment.py:119-121), colors taken from one designated camera
    (camera 2, assignment.py:133).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.utils.config import CameraParams, GridConfig


class ProjectionTables(NamedTuple):
    """Static per-rig carving tables.

    valid:    (C, N) bool   — projection inside the image (float-coord test)
    lin_idx:  (C, N) int32  — truncated y*W + x (0 where invalid)
    """

    valid: jnp.ndarray
    lin_idx: jnp.ndarray
    image_hw: Tuple[int, int]


def build_projection_tables(
    cameras: Sequence[CameraParams],
    grid: GridConfig,
    image_hw: Tuple[int, int],
    accelerate: bool = True,
) -> ProjectionTables:
    """Precompute per-camera projected pixel indices for every voxel.

    Result is bit-identical to the reference's float64
    ``cv2.projectPoints`` + ``int()`` truncation chain.  With
    ``accelerate`` (default) the bulk projection runs in float32 on the
    accelerator and only *suspicious* voxels are re-projected in float64
    on the host — ~30× faster table builds at 256³+ on single-core hosts
    while preserving exactness.  Suspicious = within ``eps`` of a
    pixel/bounds boundary (where f32 rounding could flip the truncated
    index) OR within ``z_eps`` of the camera's principal plane (where
    the 1/Xz division is catastrophically ill-conditioned in f32 and the
    per-pixel eps test alone is insufficient — ADVICE r1).
    """
    H, W = image_hw
    if not accelerate:
        return _build_tables_f64(cameras, grid, image_hw)

    eps = 2e-3  # ≫ observed f32 projection error (~1e-4 px at 644-px scale)
    z_eps = 8.0  # mm of camera-frame depth below which f32 1/Xz blows up
    xs, ys, zs = grid.axis_ranges()
    pts64 = None  # lazily built only if needed

    @functools.partial(jax.jit, static_argnames=("hw",))
    def _device_tables(jx, jy, jz, rvec, tvec, K, dist, hw):
        """f32 projection + trunc tables + boundary-suspicion flags,
        entirely on device (only the suspicious set leaves the chip)."""
        h, w = hw
        gx, gy, gz = jnp.meshgrid(jx, jy, jz, indexing="ij")
        pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        uv = cam_ops.project_points(pts, rvec, tvec, K, dist, xp=jnp)
        x, y = uv[:, 0], uv[:, 1]
        fx = x - jnp.floor(x)
        fy = y - jnp.floor(y)
        R = cam_ops.rodrigues(rvec, xp=jnp)
        depth = pts @ R[2, :] + tvec[2]  # camera-frame Xz
        suspicious = (
            (fx < eps) | (fx > 1 - eps) | (fy < eps) | (fy > 1 - eps)
            | (jnp.abs(x) < eps) | (jnp.abs(x - w) < eps)
            | (jnp.abs(y) < eps) | (jnp.abs(y - h) < eps)
            | (jnp.abs(depth) < z_eps)
        )
        valid = (y >= 0) & (y < h) & (x >= 0) & (x < w)
        lin = jnp.where(
            valid,
            jnp.trunc(y).astype(jnp.int32) * w + jnp.trunc(x).astype(jnp.int32),
            0,
        )
        return valid, lin, suspicious

    jx = jnp.asarray(xs.astype(np.float32))
    jy = jnp.asarray(ys.astype(np.float32))
    jz = jnp.asarray(zs.astype(np.float32))

    valids, idxs = [], []
    for cp in cameras:
        valid, lin, suspicious = _device_tables(
            jx, jy, jz,
            jnp.asarray(cp.rvec, jnp.float32),
            jnp.asarray(cp.tvec, jnp.float32),
            jnp.asarray(cp.K, jnp.float32),
            jnp.asarray(cp.dist, jnp.float32),
            (H, W),
        )
        sus_idx = np.flatnonzero(np.asarray(suspicious))
        if len(sus_idx):
            if pts64 is None:
                pts64 = grid.voxel_points()
            uv_exact = cam_ops.project_points(
                pts64[sus_idx], cp.rvec, cp.tvec, cp.K, cp.dist, xp=np
            )
            x_e, y_e = uv_exact[:, 0], uv_exact[:, 1]
            valid_e = (y_e >= 0) & (y_e < H) & (x_e >= 0) & (x_e < W)
            lin_e = np.where(
                valid_e,
                np.trunc(y_e).astype(np.int64) * W
                + np.trunc(x_e).astype(np.int64),
                0,
            ).astype(np.int32)
            sus_d = jnp.asarray(sus_idx)
            valid = valid.at[sus_d].set(jnp.asarray(valid_e))
            lin = lin.at[sus_d].set(jnp.asarray(lin_e))
        valids.append(valid)
        idxs.append(lin)
    return ProjectionTables(
        valid=jnp.stack(valids),
        lin_idx=jnp.stack(idxs),
        image_hw=(H, W),
    )


def _build_tables_f64(cameras, grid, image_hw) -> ProjectionTables:
    """Pure-host float64 reference implementation (the exactness oracle)."""
    H, W = image_hw
    pts = grid.voxel_points()  # (N, 3) float64
    valids, idxs = [], []
    for cp in cameras:
        uv = cam_ops.project_points(pts, cp.rvec, cp.tvec, cp.K, cp.dist, xp=np)
        x, y = uv[:, 0], uv[:, 1]
        valid = (y >= 0) & (y < H) & (x >= 0) & (x < W)
        ix = np.trunc(x).astype(np.int64)
        iy = np.trunc(y).astype(np.int64)
        lin = np.where(valid, iy * W + ix, 0).astype(np.int32)
        valids.append(valid)
        idxs.append(lin)
    return ProjectionTables(
        valid=jnp.asarray(np.stack(valids)),
        lin_idx=jnp.asarray(np.stack(idxs)),
        image_hw=(H, W),
    )


def exact_truncated_projections(
    cp: CameraParams,
    grid: GridConfig,
    image_hw: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-voxel (iy, ix, valid) with the reference's f64 + int() trunc
    semantics, computed via the accelerated f32-on-device + f64-recheck
    scheme of :func:`build_projection_tables` (bit-identical; same eps /
    principal-plane suspicion rules).  Host numpy outputs — used by table
    builders that need row/col indices rather than linear ones (e.g. the
    blocked Pallas tables, whose pure-f64 build is ~17 min at 512³)."""
    H, W = image_hw
    eps = 2e-3
    z_eps = 8.0
    xs, ys, zs = grid.axis_ranges()

    @functools.partial(jax.jit, static_argnames=("hw",))
    def _dev(jx, jy, jz, rvec, tvec, K, dist, hw):
        h, w = hw
        gx, gy, gz = jnp.meshgrid(jx, jy, jz, indexing="ij")
        pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        uv = cam_ops.project_points(pts, rvec, tvec, K, dist, xp=jnp)
        x, y = uv[:, 0], uv[:, 1]
        fx = x - jnp.floor(x)
        fy = y - jnp.floor(y)
        R = cam_ops.rodrigues(rvec, xp=jnp)
        depth = pts @ R[2, :] + tvec[2]
        suspicious = (
            (fx < eps) | (fx > 1 - eps) | (fy < eps) | (fy > 1 - eps)
            | (jnp.abs(x) < eps) | (jnp.abs(x - w) < eps)
            | (jnp.abs(y) < eps) | (jnp.abs(y - h) < eps)
            | (jnp.abs(depth) < z_eps)
        )
        valid = (y >= 0) & (y < h) & (x >= 0) & (x < w)
        iy = jnp.where(valid, jnp.trunc(y), 0).astype(jnp.int32)
        ix = jnp.where(valid, jnp.trunc(x), 0).astype(jnp.int32)
        return valid, iy, ix, suspicious

    valid, iy, ix, suspicious = _dev(
        jnp.asarray(xs.astype(np.float32)),
        jnp.asarray(ys.astype(np.float32)),
        jnp.asarray(zs.astype(np.float32)),
        jnp.asarray(cp.rvec, jnp.float32),
        jnp.asarray(cp.tvec, jnp.float32),
        jnp.asarray(cp.K, jnp.float32),
        jnp.asarray(cp.dist, jnp.float32),
        (H, W),
    )
    valid = np.array(valid)  # writable host copies
    iy = np.asarray(iy).astype(np.int64)
    ix = np.asarray(ix).astype(np.int64)
    sus_idx = np.flatnonzero(np.asarray(suspicious))
    if len(sus_idx):
        pts64 = grid.voxel_points()
        uv_e = cam_ops.project_points(
            pts64[sus_idx], cp.rvec, cp.tvec, cp.K, cp.dist, xp=np
        )
        x_e, y_e = uv_e[:, 0], uv_e[:, 1]
        valid_e = (y_e >= 0) & (y_e < H) & (x_e >= 0) & (x_e < W)
        valid[sus_idx] = valid_e
        iy[sus_idx] = np.where(valid_e, np.trunc(y_e), 0).astype(np.int64)
        ix[sus_idx] = np.where(valid_e, np.trunc(x_e), 0).astype(np.int64)
    return iy, ix, valid


@functools.partial(
    jax.jit,
    static_argnames=("views_threshold", "color_camera", "packed_colors"),
)
def carve_from_tables(
    masks: jnp.ndarray,  # (C, H, W) uint8 foreground masks
    images: jnp.ndarray,  # (C, H, W, 3) uint8 BGR frames
    valid: jnp.ndarray,  # (C, N) bool
    lin_idx: jnp.ndarray,  # (C, N) int32
    *,
    views_threshold: int = 4,
    color_camera: int = 1,
    packed_colors: bool = False,
):
    """Per-frame carve: C mask gathers + view-count reduction + color gather.

    Returns (occupancy (N,) bool, colors): colors is (N, 3) u8 BGR, or with
    ``packed_colors`` a (N,) uint32 of b·2¹⁶+g·2⁸+r — the packed form
    avoids a trailing-dim-3 tiled layout that XLA pads 42× at 512³ grids
    (use :func:`unpack_colors_u32` to expand kept voxels).
    """
    C = masks.shape[0]
    masks_flat = masks.reshape(C, -1)

    # Sequential accumulation over cameras (C is a static small number):
    # keeps only one camera's gather temporaries live at a time, which is
    # what fits the 512³ × 8-cam stretch config in 16 GB HBM (a vmapped
    # formulation materializes (C, N) intermediates several times over).
    count = jnp.zeros(valid.shape[1], jnp.int8)
    for c in range(C):
        vis_c = valid[c] & (jnp.take(masks_flat[c], lin_idx[c], axis=0) > 0)
        count = count + vis_c.astype(jnp.int8)
    occupancy = count >= views_threshold
    img = images[color_camera].astype(jnp.uint32)
    packed_img = (
        (img[..., 0] << 16) | (img[..., 1] << 8) | img[..., 2]
    ).reshape(-1)
    packed = jnp.take(packed_img, lin_idx[color_camera], axis=0)  # (N,) u32
    if packed_colors:
        return occupancy, packed
    colors = jnp.stack(
        [
            (packed >> 16).astype(jnp.uint8),
            ((packed >> 8) & 0xFF).astype(jnp.uint8),
            (packed & 0xFF).astype(jnp.uint8),
        ],
        axis=-1,
    )
    return occupancy, colors


def unpack_colors_u32(packed: np.ndarray) -> np.ndarray:
    """(M,) uint32 packed → (M, 3) uint8 BGR (host-side)."""
    packed = np.asarray(packed)
    return np.stack(
        [(packed >> 16) & 0xFF, (packed >> 8) & 0xFF, packed & 0xFF], axis=-1
    ).astype(np.uint8)


def _pose_arrays(cameras: Sequence[CameraParams]):
    """Stack camera parameters into dense arrays for the fused path.

    Returns (R (C,3,3), t (C,3), K4 (C,4)=[fx,fy,cx,cy], dist (C,5)) float32.
    """
    Rs, ts, K4s, dists = [], [], [], []
    for cp in cameras:
        Rs.append(cam_ops.rodrigues(cp.rvec, xp=np))
        ts.append(cp.tvec)
        K4s.append([cp.fx, cp.fy, cp.cx, cp.cy])
        dists.append(cp.dist)
    return (
        jnp.asarray(np.stack(Rs), dtype=jnp.float32),
        jnp.asarray(np.stack(ts), dtype=jnp.float32),
        jnp.asarray(np.asarray(K4s), dtype=jnp.float32),
        jnp.asarray(np.stack(dists), dtype=jnp.float32),
    )


@functools.partial(
    jax.jit, static_argnames=("image_hw", "views_threshold", "color_camera")
)
def carve_fused(
    masks: jnp.ndarray,  # (C, H, W) uint8
    images: jnp.ndarray,  # (C, H, W, 3) uint8
    points: jnp.ndarray,  # (N, 3) float32 voxel centers
    R: jnp.ndarray,  # (C, 3, 3)
    t: jnp.ndarray,  # (C, 3)
    K4: jnp.ndarray,  # (C, 4) fx fy cx cy
    dist: jnp.ndarray,  # (C, 5)
    *,
    image_hw: Tuple[int, int],
    views_threshold: int = 4,
    color_camera: int = 1,
):
    """Fused on-the-fly carve: project → distort → gather → count, no table.

    float32 throughout; the projection matmul maps onto the MXU and the
    distortion polynomial fuses into it on the VPU.  Occupancy matches the
    float64 table path except for voxels projecting within float32 rounding
    of a pixel boundary (validated ≥ 99.99% identical in tests).
    """
    H, W = image_hw
    C = masks.shape[0]
    masks_flat = masks.reshape(C, -1)

    def per_cam(mask_flat, Rc, tc, K4c, dc):
        # elementwise rotation (a matmul would run in bfloat16 on the MXU
        # and cost ~0.5 px here — see ops/camera.project_points_rt)
        px, py, pz = points[:, 0], points[:, 1], points[:, 2]
        Xx = Rc[0, 0] * px + Rc[0, 1] * py + Rc[0, 2] * pz + tc[0]
        Xy = Rc[1, 0] * px + Rc[1, 1] * py + Rc[1, 2] * pz + tc[1]
        Xz = Rc[2, 0] * px + Rc[2, 1] * py + Rc[2, 2] * pz + tc[2]
        inv_z = 1.0 / Xz
        xn = Xx * inv_z
        yn = Xy * inv_z
        xd, yd = cam_ops.distort_normalized(xn, yn, dc, xp=jnp)
        u = K4c[0] * xd + K4c[2]
        v = K4c[1] * yd + K4c[3]
        valid = (v >= 0) & (v < H) & (u >= 0) & (u < W)
        iu = jnp.trunc(u).astype(jnp.int32)
        iv = jnp.trunc(v).astype(jnp.int32)
        lin = jnp.where(valid, iv * W + iu, 0)
        vis = valid & (jnp.take(mask_flat, lin, axis=0) > 0)
        return vis, lin

    vis, lin = jax.vmap(per_cam)(masks_flat, R, t, K4, dist)
    count = jnp.sum(vis.astype(jnp.int32), axis=0)
    occupancy = count >= views_threshold
    img_flat = images[color_camera].reshape(-1, 3)
    colors = jnp.take(img_flat, lin[color_camera], axis=0)
    return occupancy, colors


def compact_voxels(
    occupancy: np.ndarray,
    colors: np.ndarray,
    grid: GridConfig,
    scaling_factor: float = 64.0,
):
    """Host-side compaction into the viewer contract of assignment.py:119-133.

    Positions: world coords truncated to int (``tuple(map(int, voxel))``),
    then the OpenCV→OpenGL axis conversion ``(x, -z, y) / scaling_factor``.
    Colors: BGR→RGB, scaled to [0, 1].

    Returns (positions (M, 3) float32, colors (M, 3) float32).
    """
    occupancy = np.asarray(occupancy)
    colors = np.asarray(colors)
    pts = grid.voxel_points()  # same row order as the carve outputs
    kept = pts[occupancy]
    kept = np.trunc(kept)  # int() truncation of assignment voxel tuples
    positions = np.stack(
        [
            kept[:, 0] / scaling_factor,
            -(kept[:, 2] / scaling_factor),
            kept[:, 1] / scaling_factor,
        ],
        axis=-1,
    ).astype(np.float32)
    rgb = colors[occupancy][:, ::-1].astype(np.float32) / 255.0
    return positions, rgb


@functools.partial(
    jax.jit,
    static_argnames=("views_threshold", "color_camera", "packed_colors"),
)
def carve_frames_batched(
    masks: jnp.ndarray,  # (F, C, H, W) uint8
    images: jnp.ndarray,  # (F, C, H, W, 3) uint8
    valid: jnp.ndarray,  # (C, N) bool
    lin_idx: jnp.ndarray,  # (C, N) int32
    *,
    views_threshold: int = 4,
    color_camera: int = 1,
    packed_colors: bool = False,
):
    """Carve a batch of F frames in one dispatch (offline video throughput).

    Identical per-frame semantics to :func:`carve_from_tables`; batching
    amortizes the fixed per-dispatch/sync cost (~30 ms on tunneled hosts)
    across the batch.
    """

    def one(args):
        m, im = args
        return carve_from_tables(
            m, im, valid, lin_idx,
            views_threshold=views_threshold,
            color_camera=color_camera,
            packed_colors=packed_colors,
        )

    return jax.lax.map(one, (masks, images))
