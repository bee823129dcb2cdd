"""VisualHull — the flagship end-to-end model.

Bundles the full per-frame production pipeline of the reference's viewer
path (assignment.set_voxel_positions, assignment.py:54-149) behind one
object: calibrated rig + trained per-camera background models + carve
tables, with a single ``process_frame`` step:

    frames (C,H,W,3) u8 → HSV → frozen GMM masks → morphology/CCL cleanup
    → fused carve → occupancy + colors (+ optional viewer compaction,
    mesh extraction)

State (GMM + tables) is checkpointable to npz (utils.artifacts), mirroring
the reference's calibration-XML + lookup-pickle artifact model.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from vbr_tpu.ops import carve as carve_ops
from vbr_tpu.ops import marching_cubes as mc
from vbr_tpu.pipelines import background, reconstruction
from vbr_tpu.utils import artifacts
from vbr_tpu.utils.config import (
    DEFAULT_MASK_PARAMS,
    CameraParams,
    GridConfig,
    MaskParams,
    MOGParams,
    RigConfig,
)


class VisualHull:
    """Multi-camera visual-hull reconstruction model."""

    def __init__(
        self,
        cameras: Sequence[CameraParams],
        grid: GridConfig = GridConfig(),
        rig: RigConfig = RigConfig(),
        mask_params: Sequence[MaskParams] = DEFAULT_MASK_PARAMS,
        cache_dir: Optional[str] = None,
    ):
        self.cameras = list(cameras)
        self.grid = grid
        self.rig = rig
        self.mask_params = list(mask_params)
        image_hw = (rig.image_height, rig.image_width)
        if cache_dir:
            self.tables = artifacts.cached_projection_tables(
                self.cameras, grid, image_hw, cache_dir
            )
        else:
            self.tables = carve_ops.build_projection_tables(
                self.cameras, grid, image_hw
            )
        self.bg_states: List = []
        self.mog_params: List[MOGParams] = []

    # -- setup ------------------------------------------------------------

    @classmethod
    def from_data_dir(cls, data_dir: str, grid: GridConfig = GridConfig(),
                      train_background: bool = True, **kw) -> "VisualHull":
        cams = reconstruction.load_rig(data_dir)
        model = cls(cams, grid, **kw)
        if train_background:
            model.train_background(data_dir)
        return model

    def train_background(self, data_dir: str):
        """Train per-camera MOG models on data/cam*/background.avi
        (assignment.py:68-91 lazy-init equivalent)."""
        from vbr_tpu.utils import video as vio

        self.bg_states = []
        self.mog_params = []
        for cam in range(1, self.rig.num_cameras + 1):
            frames = vio.read_video(
                os.path.join(data_dir, f"cam{cam}", "background.avi")
            )
            p = MOGParams(history=frames.shape[0])
            self.bg_states.append(background.train_background_model(frames, p))
            self.mog_params.append(p)

    # -- per-frame step ---------------------------------------------------

    def masks(self, frames: np.ndarray, ccl_backend: str = "device") -> np.ndarray:
        """Per-camera cleaned foreground masks.

        ``ccl_backend="device"`` (default) runs GMM apply + morphology +
        the contour-hierarchy cleanup for all cameras in one batched
        device program (Pallas CCL, ops.ccl.clean_masks_batched), falling
        back to the host path only on component-table overflow (exactness
        preserved; does not occur on the production rig).
        """
        if ccl_backend == "device":
            self._ensure_fast_state()
            raw = background.raw_masks_batched_fz(
                self._stacked_fz, jnp.asarray(frames),
                self._mask_params_t, self.mog_params[0].use_hsv,
            )
            cleaned, ovf = background.ccl.clean_masks_batched(
                raw, self._fig_thresholds, self._inner_thresholds
            )
            masks = background.finalize_masks_batched(
                cleaned, self._mask_params_t
            )
            masks = np.asarray(masks)
            ovf = np.asarray(ovf)
            if ovf.any():  # exact fallback for overflowed cameras
                masks = masks.copy()  # numpy views of jax arrays are RO
                raw_h = np.asarray(raw)
                for c in np.flatnonzero(ovf):
                    cleaned_c = background.ccl.clean_mask_host(
                        raw_h[c],
                        self.mask_params[c].figure_threshold,
                        self.mask_params[c].inner_threshold,
                    )
                    masks[c] = np.asarray(
                        background.finalize_masks_batched(
                            jnp.asarray(cleaned_c)[None],
                            (self._mask_params_t[c],),
                        )[0]
                    )
            return masks
        out = []
        for c in range(frames.shape[0]):
            out.append(
                np.asarray(
                    background.extract_foreground_mask(
                        self.bg_states[c], frames[c],
                        self.mask_params[c], self.mog_params[c],
                        ccl_backend=ccl_backend,
                    )
                )
            )
        return np.stack(out)

    def process_frame(self, frames: np.ndarray, masks: Optional[np.ndarray] = None):
        """Full step → (occupancy (N,) bool, colors (N, 3) u8 BGR)."""
        if masks is None:
            masks = self.masks(frames)
        return carve_ops.carve_from_tables(
            jnp.asarray(masks),
            jnp.asarray(frames),
            self.tables.valid,
            self.tables.lin_idx,
            views_threshold=self.rig.views_threshold,
            color_camera=self.rig.color_camera,
        )

    def _ensure_fast_state(self):
        if getattr(self, "_stacked_fz", None) is None:
            self._mask_params_t = tuple(self.mask_params)
            self._fig_thresholds = tuple(
                float(p.figure_threshold) for p in self.mask_params
            )
            self._inner_thresholds = tuple(
                float(p.inner_threshold) for p in self.mask_params
            )
            # per-camera MOG params must agree on apply-time fields for
            # the batched path (ADVICE r1): assert rather than diverge
            p0 = self.mog_params[0]
            for p in self.mog_params[1:]:
                fields = ("bg_ratio", "use_hsv", "match_sigma")
                if any(getattr(p, f) != getattr(p0, f) for f in fields):
                    raise ValueError(
                        "raw_masks_batched requires uniform MOG apply "
                        "params (bg_ratio, use_hsv, match_sigma) across "
                        "cameras; got "
                        f"{[(q.bg_ratio, q.use_hsv, q.match_sigma) for q in self.mog_params]}"
                    )
            self._stacked_fz = background.stack_frozen(self.bg_states, p0)

    def _ensure_btab(self):
        """Lazily build the Pallas carve tables (only the carve paths
        consume them — masks() must not pay the host-side f64 table
        build, which is minutes at large grids)."""
        if not hasattr(self, "_btab"):
            from vbr_tpu.ops import carve_pallas

            sub = (8, 8, 8)
            sup = tuple(
                max(1, min(p, n // s))
                for n, s, p in zip(self.grid.shape, sub, (2, 2, 4))
            )
            try:
                self._btab = carve_pallas.build_block_tables(
                    self.cameras, self.grid,
                    (self.rig.image_height, self.rig.image_width),
                    sub=sub, sup=sup,
                    color_camera=self.rig.color_camera,
                )
            except ValueError:  # grid not 8-divisible: no Pallas carve
                self._btab = None

    def process_frame_fast(self, frames: np.ndarray, layout: str = "canonical",
                           carve_kernel: str = "auto"):
        """Latency-optimized full step: ONE device dispatch per frame.

        GMM apply + pre-morphology + contour-hierarchy cleanup (Pallas
        CCL) + post-morphology + fused Pallas carve run as a single
        device program — no host round-trips inside the step.  Identical
        results to :meth:`process_frame` (golden-verified); on the rare
        component-table overflow the frame is redone via the host CCL
        path to preserve exactness.

        ``layout="blocked"`` skips the blocked→canonical transpose and
        pairs with ops.carve_pallas.compact_voxels_blocked.
        ``carve_kernel="tables"`` keeps the XLA carve (used where Mosaic
        is unavailable).
        """
        self._ensure_fast_state()
        self._ensure_btab()
        if carve_kernel == "auto":
            carve_kernel = "tables" if (
                jax.default_backend() == "cpu" or self._btab is None
            ) else "pallas"
        frames_d = jnp.asarray(frames)
        if carve_kernel == "pallas":
            occ, col, ovf = _full_step_pallas(
                self._stacked_fz, frames_d,
                self._btab.pk,
                self._btab.lcc, self._btab.vorig, self._btab.uorig,
                self._btab.allv,
                self._btab.ry, self._btab.rx,
                btab_static=_btab_static(self._btab),
                mask_params=self._mask_params_t,
                use_hsv=self.mog_params[0].use_hsv,
                fig_thresholds=self._fig_thresholds,
                inner_thresholds=self._inner_thresholds,
                views_threshold=self.rig.views_threshold,
                layout=layout,
            )
        else:
            occ, col, ovf = _full_step_tables(
                self._stacked_fz, frames_d,
                self.tables.valid, self.tables.lin_idx,
                mask_params=self._mask_params_t,
                use_hsv=self.mog_params[0].use_hsv,
                fig_thresholds=self._fig_thresholds,
                inner_thresholds=self._inner_thresholds,
                views_threshold=self.rig.views_threshold,
                color_camera=self.rig.color_camera,
            )
        if bool(np.asarray(ovf).any()):  # exact fallback (host CCL masks)
            masks = self.masks(frames)
            if carve_kernel == "pallas":
                from vbr_tpu.ops import carve_pallas

                return carve_pallas.carve_blocked(
                    jnp.asarray(masks), frames_d[self.rig.color_camera],
                    self._btab, views_threshold=self.rig.views_threshold,
                    layout=layout,
                )
            return self.process_frame(frames, masks)
        return occ, col

    def sharded_runner(self, mesh, order: str = "strided",
                       costing_frames=None, interpret=None,
                       rebalance_every: int = 0) -> "ShardedRunner":
        """The production fused step over a multi-chip ``jax`` mesh.

        Builds the shard_map program of ``parallel.pallas_sharded`` (the
        same kernels as :meth:`process_frame_fast`, sharded: frames over
        ``data``, mask stages over ``cam``, carve superblocks jointly
        over ``("cam", "grid")``) with balanced superblock→shard
        assignment, and returns a callable :class:`ShardedRunner`:

            ``runner(frames (F, C, H, W, 3) u8) -> (occ_b, col_b)``

        blocked-layout numpy outputs in canonical superblock order with
        a leading frame axis (``F`` must equal ``mesh.shape["data"]``) —
        the multi-frame analog of ``process_frame_fast(layout=
        "blocked")``, bit-identical per frame (test-gated).  Overflowing
        frames are redone exactly via the host-CCL fallback, like every
        other carve path.

        ``order``: ``"strided"`` (default — mask-independent balance) |
        ``"cost"`` (capacity-bounded LPT; needs one (C, H, W, 3)
        ``costing_frames`` sample whose masks estimate per-superblock
        activity) | ``"contiguous"`` (z-major slabs).  Measured at
        512³×8 on one chip per shard: 24.9 / 21.3 / 15.5 ms per frame
        for contiguous / strided / cost (docs/BENCHMARKS.md).

        Cost placements go stale when the subject moves out of the
        costed region; ``runner.rebalance(frame)`` re-costs and
        re-places (a table transfer, never a recompile), and
        ``rebalance_every=N > 0`` does it automatically every N batches
        from the batch's own first frame, keeping placements tracking
        the scene (see :class:`ShardedRunner`).
        """
        return ShardedRunner(
            self, mesh, order=order, costing_frames=costing_frames,
            interpret=interpret, rebalance_every=rebalance_every,
        )

    def stream(self, frames_iter, layout: str = "blocked"):
        """Double-buffered streaming reconstruction.

        Dispatches frame N+1's fused device program before frame N's
        results are consumed, so host-side work (decode, overflow check,
        compaction) overlaps device compute — the pipelining the
        reference's serial loop (assignment.py:94-113) never had.

        Yields (occupancy, colors) per frame in ``layout`` order; the
        component-table overflow check rides on the result sync (exact
        host-CCL redo on overflow, which does not occur on the rig data).
        """
        self._ensure_fast_state()
        self._ensure_btab()
        pending = None  # (occ, col, ovf, frames)

        def dispatch(frames):
            frames_d = jnp.asarray(frames)
            occ, col, ovf = _full_step_pallas(
                self._stacked_fz, frames_d,
                self._btab.pk,
                self._btab.lcc, self._btab.vorig, self._btab.uorig,
                self._btab.allv,
                self._btab.ry, self._btab.rx,
                btab_static=_btab_static(self._btab),
                mask_params=self._mask_params_t,
                use_hsv=self.mog_params[0].use_hsv,
                fig_thresholds=self._fig_thresholds,
                inner_thresholds=self._inner_thresholds,
                views_threshold=self.rig.views_threshold,
                layout=layout,
            )
            return occ, col, ovf, frames

        def resolve(entry):
            occ, col, ovf, frames = entry
            if bool(np.asarray(ovf).any()):  # exact, rare
                from vbr_tpu.ops import carve_pallas

                masks = self.masks(frames)
                return carve_pallas.carve_blocked(
                    jnp.asarray(masks),
                    jnp.asarray(frames)[self.rig.color_camera],
                    self._btab, views_threshold=self.rig.views_threshold,
                    layout=layout,
                )
            return occ, col

        for frames in frames_iter:
            cur = dispatch(frames)
            if pending is not None:
                yield resolve(pending)
            pending = cur
        if pending is not None:
            yield resolve(pending)

    def process_frames_offline(self, frames: np.ndarray,
                               frames_per_launch: int = 8,
                               with_colors: bool = True,
                               interpret: Optional[bool] = None):
        """Throughput-optimized batched reconstruction of a frame sequence.

        Processes ``frames`` (F, C, H, W, 3) u8 in chunks of
        ``frames_per_launch``: each chunk is ONE device program — the
        batched mask stages over every (frame, camera) image followed by
        the frame-packed Pallas counts carve (one-hot matmuls shared
        across the chunk, ops.carve_pallas.carve_frames_blocked's
        kernel).  Per-frame occupancy is bit-identical to
        :meth:`process_frame` (test-gated); a component-table overflow
        redoes the affected frame exactly via the host-CCL path.

        Colors follow the reference's consumption pattern
        (assignment.py:127-133 reads colors only at visible voxels): the
        host gathers them from the color camera's frame at occupied
        voxels, off the device critical path.  Returns ``(occ, colors)``
        where ``occ`` is (F, N) bool canonical occupancy and ``colors``
        is a per-frame list of ``(idx (M_f,) i64, col (M_f, 3) u8 BGR)``
        — or None with ``with_colors=False``.

        This is the offline/whole-video path; for lowest single-frame
        latency use :meth:`process_frame_fast`, and for link-bound
        interactive streaming use :meth:`stream_viewer`.  Measured on
        the rig (scripts/bench_offline_throughput.py, TPU v5e):
        ~4.8 ms/frame at frames_per_launch=8 — compute parity with the
        single-frame fused step (the mask stages dominate and scale
        linearly with frames; the carve's shared one-hot matmuls save
        ~0.5 ms/frame but the counts kernel's union-over-frames block
        activity gives it back on moving subjects).  The batching win
        is dispatch/transfer amortization (one launch and one upload
        per chunk instead of per frame) on slow host↔device links.
        """
        from vbr_tpu.ops import carve_pallas

        self._ensure_fast_state()
        self._ensure_btab()
        if self._btab is None:
            raise ValueError(
                "process_frames_offline needs 8-divisible grid dims "
                f"(got {self.grid.shape}); use process_frame instead"
            )
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        frames = np.asarray(frames)
        F = frames.shape[0]
        NF = int(frames_per_launch)
        pad = (-F) % NF
        # pad by repeating the last frame (cheap masks; outputs dropped)
        frames_p = (
            np.concatenate([frames, np.repeat(frames[-1:], pad, axis=0)])
            if pad else frames
        )
        occ_chunks, ovf_chunks = [], []
        for s in range(0, F + pad, NF):
            occ_c, ovf_c = _full_step_frames(
                self._stacked_fz, jnp.asarray(frames_p[s:s + NF]),
                self._btab.pk, self._btab.vorig, self._btab.allv,
                self._btab.ry, self._btab.rx,
                btab_static=_btab_static(self._btab),
                mask_params=self._mask_params_t,
                use_hsv=self.mog_params[0].use_hsv,
                fig_thresholds=self._fig_thresholds,
                inner_thresholds=self._inner_thresholds,
                views_threshold=self.rig.views_threshold,
                interpret=interpret,
            )
            occ_chunks.append(np.asarray(occ_c))
            ovf_chunks.append(np.asarray(ovf_c))
        occ = np.concatenate(occ_chunks)[:F]
        ovf = np.concatenate(ovf_chunks)[:F]
        for f in np.flatnonzero(ovf.any(axis=1)):  # exact redo, rare
            occ_f, _ = self.process_frame(frames[f])
            occ[f] = np.asarray(occ_f)
        if not with_colors:
            return occ, None
        lin_idx = np.asarray(self.tables.lin_idx)
        colors = [
            carve_pallas.frame_colors_host(
                occ[f], frames[f][self.rig.color_camera], lin_idx,
                color_camera=self.rig.color_camera,
            )
            for f in range(F)
        ]
        return occ, colors

    def _roi_tracker(self, roi_hw):
        """Build the foreground ROI tracker running the frozen
        classifier itself on a strided grid (utils.roi)."""
        from vbr_tpu.utils.roi import MotionROITracker

        fz = self._stacked_fz
        return MotionROITracker(
            np.asarray(fz.mean), np.asarray(fz.thr),
            np.asarray(fz.bcount), roi_hw,
            use_hsv=self.mog_params[0].use_hsv,
            figure_threshold=min(
                p.figure_threshold for p in self.mask_params),
        )

    def _ingest_prepare(self, ingest, tracker, frames):
        """Shared upload prep for the streaming entry points:
        → (mode, upload array, roi_offsets or None).  ``mode`` degrades
        ``yuv420_roi`` → ``yuv420`` on frames where the tracker cannot
        guarantee containment."""
        from vbr_tpu.ops import color as color_ops

        mode = ingest
        roi_off = None
        if ingest == "yuv420_roi":
            offsets, full_needed = tracker.update(np.asarray(frames))
            if full_needed:
                mode = "yuv420"
            else:
                roi_off = jnp.asarray(offsets)
        if mode == "yuv420_roi":
            upload = color_ops.bgr_to_yuv420_host(
                tracker.crop(np.asarray(frames)))
        elif mode == "yuv420":
            upload = color_ops.bgr_to_yuv420_host(np.asarray(frames))
        else:
            upload = frames
        return mode, upload, roi_off

    def _ingest_reconstruct(self, mode, upload, roi_off):
        """Host-side reconstruction of the effective BGR frames a
        reduced upload produces (the CPU/tables branches run on these,
        so CI streams are bit-identical to the device ingest path)."""
        from vbr_tpu.ops import color as color_ops

        if mode == "bgr":
            return upload
        recon = color_ops.yuv420_to_bgr_u8(jnp.asarray(upload))
        if mode == "yuv420":
            return np.asarray(recon)
        return np.asarray(background.paste_rois(
            recon, roi_off,
            (self.rig.image_height, self.rig.image_width)))

    def stream_viewer(self, frames_iter, depth: int = 3,
                      ingest: str = "bgr", roi_hw=(320, 224)):
        """Streaming viewer-array pipeline tuned for slow host↔device links.

        Per frame ONE fused device program emits wire-compressed outputs
        (bit-packed occupancy + block-compacted colors, ~1 MB instead of
        ~8.4 MB); device→host copies are started asynchronously and
        overlapped with the next frames' compute (``depth`` in-flight).
        Yields (positions, rgb) in the reference viewer contract.

        ``ingest="yuv420"`` (opt-in, r5) halves the per-frame UPLOAD as
        well: frames are packed host-side into the (C, H·3/2, W) u8
        YUV 4:2:0 wire format and reconstructed on device inside the
        same fused program.  ``ingest="yuv420_roi"`` cuts ~4× further:
        a host-side motion tracker (``utils.roi.MotionROITracker``,
        seeded by the frozen background model itself) finds a
        fixed-``roi_hw`` window per camera and only that window is
        uploaded; frames where the tracker cannot guarantee containment
        automatically fall back to the full yuv420 program.  Neither is
        bit-exact — run :meth:`validate_reduced_ingest` on
        representative frames first; the measured guard on the
        production rig is cleaned-mask IoU ≥ 0.998 (docs/BENCHMARKS.md).
        The viewer colors come from the reconstructed (windowed)
        frames.
        """
        import collections

        from vbr_tpu.ops import carve_pallas
        from vbr_tpu.ops import color as color_ops

        if ingest not in ("bgr", "yuv420", "yuv420_roi"):
            raise ValueError(f"unknown ingest format {ingest!r}")
        self._ensure_fast_state()
        self._ensure_btab()
        tracker = self._roi_tracker(roi_hw) if ingest == "yuv420_roi" \
            else None
        q = collections.deque()

        def dispatch(frames):
            # the original BGR frames ride along for the exact overflow
            # fallback; only the device upload uses the packed format
            mode, upload, roi_off = self._ingest_prepare(
                ingest, tracker, frames)
            wire = _full_step_pallas(
                self._stacked_fz, jnp.asarray(upload),
                self._btab.pk,
                self._btab.lcc, self._btab.vorig, self._btab.uorig,
                self._btab.allv,
                self._btab.ry, self._btab.rx,
                btab_static=_btab_static(self._btab),
                mask_params=self._mask_params_t,
                use_hsv=self.mog_params[0].use_hsv,
                fig_thresholds=self._fig_thresholds,
                inner_thresholds=self._inner_thresholds,
                views_threshold=self.rig.views_threshold,
                layout="packed", ingest=mode, roi_offsets=roi_off,
            )
            try:
                wire.copy_to_host_async()
            except AttributeError:
                pass
            return wire, frames

        def resolve(entry):
            wire, frames = entry
            (any_ovf, n_blocks, n_vox, ids, packed_k,
             cols) = carve_pallas.decode_wire(
                wire, total_voxels=self.grid.num_voxels)
            if any_ovf:
                # exact fallback: host-CCL masks + uncompressed carve
                masks = self.masks(frames)
                occ, col = carve_pallas.carve_blocked(
                    jnp.asarray(masks),
                    jnp.asarray(frames)[self.rig.color_camera],
                    self._btab, views_threshold=self.rig.views_threshold,
                    layout="blocked",
                )
                return carve_pallas.compact_voxels_blocked(
                    occ, col, self._btab, self.grid, self.rig.scaling_factor
                )
            return carve_pallas.viewer_arrays_from_packed(
                packed_k, ids, n_blocks, n_vox, cols, self._btab,
                self.grid, self.rig.scaling_factor,
            )

        for frames in frames_iter:
            q.append(dispatch(frames))
            if len(q) > depth:
                yield resolve(q.popleft())
        while q:
            yield resolve(q.popleft())

    def validate_reduced_ingest(self, frames: np.ndarray,
                                ingest: str = "yuv420",
                                roi_hw=(320, 224)):
        """Measure what a reduced-byte ingest mode changes.

        The wire formats (``ops.color.bgr_to_yuv420_host``; the
        fixed-window ROI crop on top for ``"yuv420_roi"``) are
        explicitly lossy; this guard quantifies the loss WHERE IT
        MATTERS — the cleaned masks and the carved hull — on
        representative frames, so enabling reduced ingest is an
        evidence-based decision, not an assumption (VERDICT r4 #6).
        Returns a dict:

          mask_iou        per-camera IoU of cleaned masks (exact vs
                          reduced path)
          mask_iou_min    min over cameras
          occ_diff_voxels occupancy voxels that differ
          occ_exact       exact-path occupied count
          max_channel_err max |reconstructed − original| over pixels
                          (inside the windows, for the ROI mode)
        """
        from vbr_tpu.ops import color as color_ops

        self._ensure_fast_state()
        frames = np.asarray(frames)

        def clean_finalize(raw):
            cleaned, ovf = background.ccl.clean_masks_batched(
                raw, self._fig_thresholds, self._inner_thresholds
            )
            masks = background.finalize_masks_batched(
                cleaned, self._mask_params_t
            )
            return np.asarray(masks), np.asarray(ovf)

        def masks_of(fr):
            raw = background.raw_masks_batched_fz(
                self._stacked_fz, jnp.asarray(fr), self._mask_params_t,
                self.mog_params[0].use_hsv,
            )
            return clean_finalize(raw)

        m_exact, _ = masks_of(frames)
        if ingest == "yuv420_roi":
            tracker = self._roi_tracker(roi_hw)
            # one update places the windows; ``full`` only signals the
            # first-frame convention, which the guard ignores (it is
            # quantifying the ROI path's loss at this placement)
            offsets, _full = tracker.update(frames)
            crops = tracker.crop(frames)
            packed = color_ops.bgr_to_yuv420_host(crops)
            recon_roi = np.asarray(
                color_ops.yuv420_to_bgr_u8(jnp.asarray(packed)))
            raw = background.raw_masks_batched_fz_roi(
                self._stacked_fz, jnp.asarray(recon_roi),
                jnp.asarray(offsets), self._mask_params_t,
                self.mog_params[0].use_hsv,
                image_hw=frames.shape[1:3],
            )
            m_red, _ = clean_finalize(raw)
            recon = np.asarray(background.paste_rois(
                jnp.asarray(recon_roi), jnp.asarray(offsets),
                frames.shape[1:3]))
            err_region = np.zeros(frames.shape[:3], bool)
            for c in range(frames.shape[0]):
                y0, x0 = offsets[c]
                err_region[c, y0:y0 + roi_hw[0], x0:x0 + roi_hw[1]] = True
            chan_err = int(np.abs(
                recon.astype(np.int32) - frames.astype(np.int32)
            ).max(axis=-1)[err_region].max())
        elif ingest == "yuv420":
            packed = color_ops.bgr_to_yuv420_host(frames)
            recon = np.asarray(
                color_ops.yuv420_to_bgr_u8(jnp.asarray(packed)))
            m_red, _ = masks_of(recon)
            chan_err = int(np.abs(
                recon.astype(np.int32) - frames.astype(np.int32)).max())
        else:
            raise ValueError(f"unknown reduced ingest {ingest!r}")
        ious = []
        for c in range(frames.shape[0]):
            a, b = m_exact[c] > 0, m_red[c] > 0
            union = (a | b).sum()
            ious.append(float((a & b).sum() / union) if union else 1.0)
        occ_e, _ = carve_ops.carve_from_tables(
            jnp.asarray(m_exact), jnp.asarray(frames),
            self.tables.valid, self.tables.lin_idx,
            views_threshold=self.rig.views_threshold,
            color_camera=self.rig.color_camera,
        )
        occ_r, _ = carve_ops.carve_from_tables(
            jnp.asarray(m_red), jnp.asarray(recon),
            self.tables.valid, self.tables.lin_idx,
            views_threshold=self.rig.views_threshold,
            color_camera=self.rig.color_camera,
        )
        occ_e = np.asarray(occ_e)
        occ_r = np.asarray(occ_r)
        return {
            "mask_iou": [round(x, 6) for x in ious],
            "mask_iou_min": round(min(ious), 6),
            "occ_diff_voxels": int((occ_e != occ_r).sum()),
            "occ_exact": int(occ_e.sum()),
            "max_channel_err": chan_err,
        }

    def stream_surface(self, frames_iter, depth: int = 2,
                       algorithm: str = "cubes", ambiguity: str = "join",
                       capacity: int = 32768, transfer: str = "full",
                       ingest: str = "bgr", roi_hw=(320, 224)):
        """Streaming surface reconstruction: frames in, meshes out.

        Per frame ONE fused device program (the frame→mesh step of
        :meth:`process_frame_surface`) with ``depth`` dispatches in
        flight, so host work (decode, filtering, world placement)
        overlaps device compute.  Yields ``(tris (T, 3, 3) f32 world
        mm, occ)`` per frame, bit-identical to
        :meth:`process_frame_surface` (test-gated); CCL-overflow and
        over-capacity frames are redone exactly via the host paths.

        ``transfer="wire"`` (r5, for slow host↔device links) downloads
        only the active CELL IDS + CONFIGS and bit-packed occupancy
        (~0.4 MB) instead of the emitted triangle buffer (~5.9 MB at
        the default capacity); the host emits the triangles from the
        same generated table — bit-identical output (test-gated).
        ``ingest`` accepts the reduced-byte UPLOAD formats of
        :meth:`stream_viewer` ("yuv420", "yuv420_roi" — lossy,
        evidence-gated via :meth:`validate_reduced_ingest`); on the
        CPU/tables branch the frames are reconstructed host-side from
        the identical packed data, so CI streams remain bit-identical
        to the device ingest path.

        This is the live analog of the reference's offline
        ``plot_marching_cubes`` (voxel_reconstruction.py:127-163): the
        reference pulled the hull to host and re-ran skimage +
        matplotlib per invocation; here the mesh comes out of the same
        device program that carved the hull.
        """
        import collections

        if transfer not in ("full", "wire"):
            raise ValueError(f"unknown transfer mode {transfer!r}")
        if ingest not in ("bgr", "yuv420", "yuv420_roi"):
            raise ValueError(f"unknown ingest format {ingest!r}")
        common = self._surface_common(algorithm, ambiguity, capacity)
        origin, spacing = self._world_frame()
        tracker = self._roi_tracker(roi_hw) if ingest == "yuv420_roi"             else None
        q = collections.deque()
        if transfer == "wire":
            wire_kw = dict(common)
            for k in ("algorithm", "ambiguity"):
                wire_kw.pop(k)

        def dispatch(frames):
            mode, upload, roi_off = self._ingest_prepare(
                ingest, tracker, frames)
            use_pallas = (jax.default_backend() != "cpu"
                          and self._btab is not None)
            if not use_pallas and mode != "bgr":
                # tables branch: reconstruct from the same packed data
                upload = self._ingest_reconstruct(mode, upload, roi_off)
                mode, roi_off = "bgr", None
            frames_d = jnp.asarray(upload)
            if transfer == "wire":
                if use_pallas:
                    out = _full_step_surface_wire(
                        self._stacked_fz, frames_d,
                        self._btab.pk, self._btab.lcc, self._btab.vorig,
                        self._btab.uorig, self._btab.allv, self._btab.ry,
                        self._btab.rx,
                        btab_static=_btab_static(self._btab),
                        ingest=mode, roi_offsets=roi_off, **wire_kw,
                    )
                else:
                    out = _full_step_surface_wire_tables(
                        self._stacked_fz, frames_d,
                        self.tables.valid, self.tables.lin_idx,
                        color_camera=self.rig.color_camera, **wire_kw,
                    )
            elif use_pallas:
                out = _full_step_surface(
                    self._stacked_fz, frames_d,
                    self._btab.pk, self._btab.lcc, self._btab.vorig,
                    self._btab.uorig, self._btab.allv, self._btab.ry,
                    self._btab.rx, btab_static=_btab_static(self._btab),
                    ingest=mode, roi_offsets=roi_off, **common,
                )
            else:
                out = _full_step_surface_tables(
                    self._stacked_fz, frames_d,
                    self.tables.valid, self.tables.lin_idx,
                    color_camera=self.rig.color_camera, **common,
                )
            for x in (out[:2] if isinstance(out, tuple) else (out,)):
                try:  # start the device→host copies early
                    x.copy_to_host_async()
                except AttributeError:
                    pass
            return out, frames

        def resolve_full(entry):
            (verts, valid, n_active, occ, _col, ovf), frames = entry
            if bool(np.asarray(ovf).any()) or int(n_active) > capacity:
                tris, occ_h, _col_h = self._surface_host_redo(
                    frames, algorithm, ambiguity
                )
                return tris, occ_h
            return mc.world_triangles(verts, valid, origin, spacing), occ

        def resolve_wire(entry):
            wire, frames = entry
            any_ovf, n_active, idx, cfg, occ = _decode_surface_wire(
                wire, capacity, self.grid.num_voxels)
            if any_ovf or n_active > capacity:
                tris, occ_h, _col_h = self._surface_host_redo(
                    frames, algorithm, ambiguity
                )
                return tris, occ_h
            tris = mc.triangles_from_wire(
                idx, cfg, n_active, self.grid.shape, origin, spacing,
                algorithm=algorithm, ambiguity=ambiguity,
            )
            return tris, occ

        resolve = resolve_wire if transfer == "wire" else resolve_full
        for frames in frames_iter:
            q.append(dispatch(frames))
            if len(q) > depth:
                yield resolve(q.popleft())
        while q:
            yield resolve(q.popleft())

    def textured_frame(self, frames: np.ndarray, masks=None):
        """Carve + per-voxel color from the nearest non-occluded camera
        (BASELINE config 3 — upgrades the reference's camera-2-only
        coloring, assignment.py:133).

        Returns (occupancy (N,), colors (N, 3) u8, cam_choice (N,) i8).
        """
        from vbr_tpu.ops import texturing

        if getattr(self, "_tex_tables", None) is None:
            self._tex_tables = texturing.build_texturing_tables(
                self.cameras, self.grid,
                (self.rig.image_height, self.rig.image_width),
            )
        occ, _ = self.process_frame(frames, masks)
        colors, cam_choice = texturing.textured_colors(
            occ, jnp.asarray(frames),
            self._tex_tables.valid, self._tex_tables.lin_idx,
            self._tex_tables.depth,
            image_hw=(self.rig.image_height, self.rig.image_width),
        )
        return occ, colors, cam_choice

    def viewer_arrays(self, frames: np.ndarray, masks=None):
        """(positions, colors) in viewer coordinates (assignment contract)."""
        occ, col = self.process_frame(frames, masks)
        return carve_ops.compact_voxels(occ, col, self.grid,
                                        self.rig.scaling_factor)

    def extract_surface(self, frames: np.ndarray, masks=None,
                        algorithm: str = "cubes",
                        ambiguity: str = "join"):
        """Isosurface mesh of the current hull, in world mm.

        ``algorithm``: classic 256-case ``"cubes"`` (default) or
        ``"tetrahedra"`` (6-tet decomposition, ambiguity-free).  The
        default ``("cubes", "join")`` is the reference-parity
        configuration — what skimage's Lewiner MC33 resolves on a binary
        volume (voxel_reconstruction.py:142) — and is shared by every
        surface entry point (:meth:`process_frame_surface`,
        :meth:`stream_surface`)."""
        occ, _ = self.process_frame(frames, masks)
        volume = np.asarray(occ).reshape(self.grid.shape)
        xs, ys, zs = self.grid.axis_ranges()
        spacing = (xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0])
        return mc.extract_mesh(volume, origin=(xs[0], ys[0], zs[0]),
                               spacing=spacing, algorithm=algorithm,
                               ambiguity=ambiguity)

    def _world_frame(self):
        """(origin, spacing) of the voxel grid in world mm (floats)."""
        xs, ys, zs = self.grid.axis_ranges()
        return (
            (float(xs[0]), float(ys[0]), float(zs[0])),
            (float(xs[1] - xs[0]), float(ys[1] - ys[0]),
             float(zs[1] - zs[0])),
        )

    def _surface_common(self, algorithm, ambiguity, capacity):
        """Shared setup for the fused frame→mesh entry points: fast
        state + block tables + emitter table (built outside any trace),
        returning the static kwargs of the fused surface programs."""
        self._ensure_fast_state()
        self._ensure_btab()
        mc.table_emitter(algorithm, ambiguity, 0.5)  # build outside trace
        return dict(
            mask_params=self._mask_params_t,
            use_hsv=self.mog_params[0].use_hsv,
            fig_thresholds=self._fig_thresholds,
            inner_thresholds=self._inner_thresholds,
            views_threshold=self.rig.views_threshold,
            grid_shape=self.grid.shape,
            algorithm=algorithm, ambiguity=ambiguity, capacity=capacity,
        )

    def _dispatch_surface(self, frames_d, common):
        """Launch the fused frame→mesh program (Pallas on device, XLA
        tables on CPU/CI) → (verts, valid, n_active, occ, col, ovf)."""
        if jax.default_backend() != "cpu" and self._btab is not None:
            return _full_step_surface(
                self._stacked_fz, frames_d,
                self._btab.pk, self._btab.lcc, self._btab.vorig,
                self._btab.uorig, self._btab.allv, self._btab.ry,
                self._btab.rx, btab_static=_btab_static(self._btab),
                **common,
            )
        return _full_step_surface_tables(
            self._stacked_fz, frames_d,
            self.tables.valid, self.tables.lin_idx,
            color_camera=self.rig.color_camera, **common,
        )

    def _surface_host_redo(self, frames, algorithm, ambiguity):
        """Exact host fallback (rare: CCL component-table overflow or
        surface bigger than the triangle budget) → (tris, occ, col)."""
        occ, col = self.process_frame(frames)
        origin, spacing = self._world_frame()
        tris, _ = mc.extract_mesh(
            np.asarray(occ).reshape(self.grid.shape),
            origin=origin, spacing=spacing,
            algorithm=algorithm, ambiguity=ambiguity,
        )
        return tris, occ, col

    def process_frame_surface(self, frames: np.ndarray,
                              algorithm: str = "cubes",
                              ambiguity: str = "join",
                              capacity: int = 32768):
        """Frame → triangle mesh in ONE device program.

        The fused per-frame pipeline of :meth:`process_frame_fast`
        (HSV → frozen GMM apply → morphology → Pallas CCL → fused carve)
        composed with the fully device-resident surface extraction
        (``ops.marching_cubes.surface_program``: dense config grid +
        fixed-capacity compaction + generated-table MXU emission) — no
        host round-trip between carving and meshing.  This is the
        real-time streaming analog of the reference's offline
        ``plot_marching_cubes`` (voxel_reconstruction.py:127-163), which
        re-ran skimage + matplotlib on a host copy of the hull.

        Returns ``(tris (T, 3, 3) f32 world mm, occ, col)`` with ``tris``
        bit-identical to :meth:`extract_surface` on the same frame
        (test-gated).  Exactness fallbacks: CCL component-table overflow
        or more than ``capacity`` active surface cells redo the frame via
        the host paths.
        """
        common = self._surface_common(algorithm, ambiguity, capacity)
        verts, valid, n_active, occ, col, ovf = self._dispatch_surface(
            jnp.asarray(frames), common
        )
        if bool(np.asarray(ovf).any()) or int(n_active) > capacity:
            return self._surface_host_redo(frames, algorithm, ambiguity)
        origin, spacing = self._world_frame()
        tris = mc.world_triangles(verts, valid, origin, spacing)
        return tris, occ, col

    # -- checkpointing ----------------------------------------------------

    def save_background_models(self, out_dir: str):
        for c, st in enumerate(self.bg_states):
            artifacts.save_mog_state(
                os.path.join(out_dir, f"mog_cam{c + 1}.npz"), st
            )

    def load_background_models(self, out_dir: str) -> bool:
        states = []
        for c in range(self.rig.num_cameras):
            st = artifacts.load_mog_state(
                os.path.join(out_dir, f"mog_cam{c + 1}.npz")
            )
            if st is None:
                return False
            states.append(st)
        self.bg_states = states
        self.mog_params = [MOGParams() for _ in states]
        return True


class ShardedRunner:
    """Callable multi-chip production step with re-balanceable placement.

    Built by :meth:`VisualHull.sharded_runner`.  Calling the runner on a
    ``(F, C, H, W, 3)`` u8 frame batch runs the sharded fused step and
    returns blocked-layout numpy ``(occ_b, col_b)`` in canonical
    superblock order.

    Cost-LPT placements are built from ONE costing frame's masks, so
    they go stale when the subject leaves the costed region (the r4
    known-limit).  Because superblock order is exactness-free (every
    per-superblock table and the canonical-index map permute together)
    and the shard_map program's shapes don't depend on it, re-placing is
    a table transfer, never a recompile:

      * :meth:`rebalance` — re-cost from a given frame and re-place if
        the predicted critical-path cost improves by ``min_gain``;
      * ``rebalance_every=N`` — do that automatically every N batches,
        costing from the batch's own first frame;
      * :meth:`shard_costs` / :meth:`imbalance` — inspect the predicted
        per-shard load of the current placement under given costs.
    """

    def __init__(self, model: "VisualHull", mesh, order: str = "strided",
                 costing_frames=None, interpret=None,
                 rebalance_every: int = 0):
        from vbr_tpu.parallel import pallas_sharded

        self._ps = pallas_sharded
        self.model = model
        self.mesh = mesh
        self.mode = order
        self.rebalance_every = int(rebalance_every)
        self._runs = 0
        self._nshards = mesh.shape["cam"] * mesh.shape["grid"]
        model._ensure_fast_state()
        model._ensure_btab()
        if model._btab is None:
            raise ValueError(
                "sharded_runner needs the Pallas block tables; the grid "
                f"{model.grid.shape} is not 8-divisible"
            )
        costs = None
        if order == "cost":
            if costing_frames is None:
                raise ValueError(
                    "order='cost' needs a (C, H, W, 3) costing_frames "
                    "sample (its masks estimate per-superblock activity)"
                )
            costs = self._costs_from(costing_frames)
        self.costs = costs
        self.order = pallas_sharded.superblock_order(
            model._btab.nsuper, self._nshards, order, costs=costs
        )
        self._st = pallas_sharded.shard_block_tables(
            mesh, model._btab, order=self.order
        )
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self._interpret = interpret
        self._step = pallas_sharded.sharded_production_step(
            mesh, self._st.local_static,
            use_hsv=model.mog_params[0].use_hsv,
            views_threshold=model.rig.views_threshold,
            interpret=interpret,
        )
        self._flags = pallas_sharded.mask_flags_array(model._mask_params_t)
        # the frozen GMM state + thresholds never change between batches;
        # place them on the mesh ONCE (tens of MB — not hot-path traffic)
        self._static_in = pallas_sharded.place_static_inputs(
            mesh, model._stacked_fz,
            model._fig_thresholds, model._inner_thresholds, self._flags,
        )

    # -- placement inspection / maintenance -------------------------------

    def _costs_from(self, frame) -> np.ndarray:
        """Per-superblock carve costs from one (C, H, W, 3) frame."""
        return self._ps.superblock_costs(
            self.model._btab, self.model.masks(np.asarray(frame)),
            self.model.rig.views_threshold,
        )

    def shard_costs(self, costs=None) -> np.ndarray:
        """(nshards,) predicted per-shard cost of the CURRENT placement
        under ``costs`` (default: the placement's own costing frame)."""
        costs = self.costs if costs is None else np.asarray(costs)
        if costs is None:
            raise ValueError(
                "no costs available (placement is not cost-based); pass "
                "costs or use rebalance(frame)"
            )
        c = np.zeros(len(self.order), np.float64)
        c[: self.model._btab.nsuper] = costs
        nloc = len(self.order) // self._nshards
        return c[self.order].reshape(self._nshards, nloc).sum(axis=1)

    def imbalance(self, costs=None) -> float:
        """Critical-path / mean predicted shard cost (1.0 = perfect)."""
        sc = self.shard_costs(costs)
        mean = sc.mean()
        return float(sc.max() / mean) if mean > 0 else 1.0

    def rebalance(self, frame, min_gain: float = 0.05) -> bool:
        """Re-cost from ``frame`` ((C, H, W, 3) u8) and re-place the
        tables if the predicted critical-path cost improves by at least
        ``min_gain`` (fraction).  Returns True if re-placed.  Safe at
        any time: results are bit-identical under any placement; only
        the load balance changes."""
        costs = self._costs_from(frame)
        new_order = self._ps.superblock_order(
            self.model._btab.nsuper, self._nshards, "cost", costs=costs
        )
        cur_crit = self.shard_costs(costs).max()
        c = np.zeros(len(new_order), np.float64)
        c[: self.model._btab.nsuper] = costs
        nloc = len(new_order) // self._nshards
        new_crit = c[new_order].reshape(self._nshards, nloc).sum(axis=1).max()
        if new_crit > (1.0 - min_gain) * cur_crit:
            self.costs = costs  # keep the fresher costs for inspection
            return False
        self.mode = "cost"
        self.costs = costs
        self.order = new_order
        self._st = self._ps.shard_block_tables(
            self.mesh, self.model._btab, order=new_order
        )
        return True

    # -- the step ----------------------------------------------------------

    def _dispatch(self, frames):
        """Launch the sharded program for one (F, C, H, W, 3) batch;
        returns device handles (canonical-blocked, copies started)."""
        frames = np.asarray(frames)
        if frames.shape[0] != self.mesh.shape["data"]:
            raise ValueError(
                f"frame batch {frames.shape[0]} != data-axis size "
                f"{self.mesh.shape['data']}"
            )
        if (self.rebalance_every and self._runs
                and self._runs % self.rebalance_every == 0):
            self.rebalance(frames[0])
        self._runs += 1
        st = self._st
        frames_d = self._ps.place_frames(self.mesh, frames)
        occ_b, col_b, ovf = self._step(
            frames_d, *self._static_in, st.pk, st.lcc, st.vorig, st.uorig,
            st.allv, st.ry, st.rx,
        )
        occ_b, col_b = self._ps.unshuffle_blocked(
            occ_b, col_b, self.model._btab, st.order
        )
        for x in (occ_b, col_b, ovf):
            try:
                x.copy_to_host_async()
            except AttributeError:
                pass
        return occ_b, col_b, ovf, frames

    def _resolve(self, entry):
        """Sync one dispatched batch; exact host-CCL redo on overflow."""
        occ_b, col_b, ovf, frames = entry
        model = self.model
        occ_b, col_b = np.asarray(occ_b), np.asarray(col_b)
        ovf = np.asarray(ovf)
        if ovf.any():  # exact, rare: redo those frames host-CCL
            from vbr_tpu.ops import carve_pallas

            # numpy views of jax arrays are read-only; the in-place
            # per-frame redo needs owned buffers
            occ_b, col_b = occ_b.copy(), col_b.copy()
            for f in np.flatnonzero(ovf.any(axis=1)):
                masks = model.masks(frames[f])  # host fallback inside
                o, c = carve_pallas.carve_blocked(
                    jnp.asarray(masks),
                    jnp.asarray(frames[f, model.rig.color_camera]),
                    model._btab,
                    views_threshold=model.rig.views_threshold,
                    interpret=self._interpret, layout="blocked",
                )
                occ_b[f], col_b[f] = np.asarray(o), np.asarray(c)
        return occ_b, col_b

    def __call__(self, frames):
        return self._resolve(self._dispatch(frames))

    def stream(self, batches_iter, depth: int = 2):
        """Multi-frame sharded streaming (VERDICT r4 #7): the data×grid
        sharded production step composed with the async dispatch
        pipeline of :meth:`VisualHull.stream`.

        ``batches_iter`` yields (F, C, H, W, 3) u8 batches (F = the
        mesh's ``data`` axis); up to ``depth`` sharded programs are in
        flight while earlier batches' host work (sync, overflow redo)
        completes.  Yields ``(occ_b, col_b)`` per batch, bit-identical
        to calling the runner on each batch (test-gated on the 8-device
        CPU mesh).  The reference analog is the serial per-frame loop of
        assignment.py:94-121, here DP×SP-sharded AND pipelined.
        """
        import collections

        q = collections.deque()
        for frames in batches_iter:
            q.append(self._dispatch(frames))
            if len(q) > depth:
                yield self._resolve(q.popleft())
        while q:
            yield self._resolve(q.popleft())


import functools

import jax


@functools.partial(
    jax.jit,
    static_argnames=("mask_params", "views_threshold", "color_camera"),
)
def _finalize_and_carve(
    cleaned, frames, valid, lin_idx, *, mask_params, views_threshold,
    color_camera,
):
    """Fused post-morphology + carve (one device program)."""
    masks = background.finalize_masks_batched.__wrapped__(cleaned, mask_params)
    return carve_ops.carve_from_tables.__wrapped__(
        masks, frames, valid, lin_idx,
        views_threshold=views_threshold, color_camera=color_camera,
    )


def _btab_static(t):
    from vbr_tpu.ops import carve_pallas

    return carve_pallas.tables_static_tuple(t)


@functools.partial(
    jax.jit,
    static_argnames=(
        "btab_static", "mask_params", "use_hsv", "fig_thresholds",
        "inner_thresholds", "views_threshold", "layout", "interpret",
        "ingest",
    ),
)
def _full_step_pallas(
    stacked_fz, frames, pk, lcc, vorig, uorig, allv, ry, rx, *,
    btab_static, mask_params, use_hsv, fig_thresholds, inner_thresholds,
    views_threshold, layout, interpret=False, ingest="bgr",
    roi_offsets=None,
):
    """The whole per-frame pipeline as ONE device program:
    HSV → compressed frozen GMM apply → pre-morphology → Pallas CCL
    cleanup → post-morphology → fused Pallas carve.  Returns
    (occ, colors, overflow).  ``interpret`` runs the Pallas kernels in
    interpret mode (CPU CI gates of the production composition).

    Reduced-byte wire formats (both explicitly NOT bit-exact — gate
    with :meth:`VisualHull.validate_reduced_ingest`):

    * ``ingest="yuv420"`` — ``frames`` is the packed YUV 4:2:0 plane
      (``ops.color.bgr_to_yuv420_host``: (C, H·3/2, W) u8, half the
      upload bytes); BGR is reconstructed on device first.
    * ``ingest="yuv420_roi"`` — ``frames`` is the packed plane of a
      fixed-size per-camera ROI window ((C, RH·3/2, RW) u8, ~4× fewer
      bytes again) with ``roi_offsets`` (C, 2) i32 window origins from
      ``utils.roi.MotionROITracker``; the frozen-GMM state is sliced
      at the offsets and the raw masks pasted onto a zero canvas
      (background.raw_masks_batched_fz_roi), so everything downstream
      is the full-frame program.
    """
    from vbr_tpu.ops import carve_pallas
    from vbr_tpu.ops import color as color_ops

    image_hw = stacked_fz.bcount.shape[1:3]
    if ingest == "yuv420_roi":
        rois = color_ops.yuv420_to_bgr_u8.__wrapped__(frames)
        raw = background.raw_masks_batched_fz_roi.__wrapped__(
            stacked_fz, rois, roi_offsets, mask_params, use_hsv,
            image_hw=image_hw,
        )
        frames = background.paste_rois(rois, roi_offsets, image_hw)
    else:
        if ingest == "yuv420":
            frames = color_ops.yuv420_to_bgr_u8.__wrapped__(frames)
        elif ingest != "bgr":
            raise ValueError(f"unknown ingest format {ingest!r}")
        raw = background.raw_masks_batched_fz.__wrapped__(
            stacked_fz, frames, mask_params, use_hsv
        )
    cleaned, ovf = background.ccl.clean_masks_batched.__wrapped__(
        raw, fig_thresholds, inner_thresholds, interpret=interpret
    )
    masks = background.finalize_masks_batched.__wrapped__(
        cleaned, mask_params
    )
    color_camera = btab_static[6]
    occ, col = carve_pallas._carve_blocked_device.__wrapped__(
        masks, frames[color_camera], pk, lcc, vorig, uorig,
        allv, ry, rx, tables_static=btab_static,
        views_threshold=views_threshold,
        layout="blocked" if layout == "packed" else layout,
        interpret=interpret,
    )
    if layout == "packed":  # wire-compressed outputs for slow links
        packed_k, ids, n_blocks, n_vox, cols, bovf = (
            carve_pallas.pack_blocked_outputs(occ, col)
        )
        any_ovf = (jnp.any(ovf) | bovf).astype(jnp.int32)
        return carve_pallas.encode_wire(
            packed_k, ids, n_blocks, n_vox, cols, any_ovf)
    return occ, col, ovf


@functools.partial(
    jax.jit,
    static_argnames=(
        "btab_static", "mask_params", "use_hsv", "fig_thresholds",
        "inner_thresholds", "views_threshold", "interpret",
    ),
)
def _full_step_frames(
    stacked_fz, frames, pk, vorig, allv, ry, rx, *,
    btab_static, mask_params, use_hsv, fig_thresholds, inner_thresholds,
    views_threshold, interpret=False,
):
    """Multi-frame fused pipeline: NF frames in ONE device program.

    The mask stages (HSV → compressed frozen GMM apply → pre-morphology →
    Pallas CCL cleanup → post-morphology) batch over every
    (frame, camera) image; the carve runs the frame-packed counts kernel
    (ops.carve_pallas._carve_frames_device) whose one-hot row matmuls are
    shared across the chunk's frames.  Returns (occ (NF, N) bool canonical,
    overflow (NF, C) bool).  Reference analog: the whole-video per-frame
    loop of assignment.py:94-121, NF frames per launch.
    """
    from vbr_tpu.ops import carve_pallas

    NF, C = frames.shape[:2]
    H, W = frames.shape[2:4]
    raw = jax.vmap(
        lambda fr: background.raw_masks_batched_fz.__wrapped__(
            stacked_fz, fr, mask_params, use_hsv
        )
    )(frames)  # (NF, C, H, W) u8
    cleaned, ovf = background.ccl.clean_masks_batched.__wrapped__(
        raw.reshape(NF * C, H, W),
        fig_thresholds * NF, inner_thresholds * NF,
        interpret=interpret,
    )
    masks = jax.vmap(
        lambda m: background.finalize_masks_batched.__wrapped__(
            m, mask_params
        )
    )(cleaned.reshape(NF, C, H, W))
    occ = carve_pallas._carve_frames_device.__wrapped__(
        masks, pk, vorig, allv, ry, rx,
        tables_static=btab_static, views_threshold=views_threshold,
        interpret=interpret,
    )  # (NF, N) bool
    return occ, ovf.reshape(NF, C)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mask_params", "use_hsv", "fig_thresholds", "inner_thresholds",
        "views_threshold", "color_camera",
    ),
)
def _full_step_tables(
    stacked_fz, frames, valid, lin_idx, *, mask_params, use_hsv,
    fig_thresholds, inner_thresholds, views_threshold, color_camera,
):
    """Single-program full step on the XLA table-carve path."""
    raw = background.raw_masks_batched_fz.__wrapped__(
        stacked_fz, frames, mask_params, use_hsv
    )
    cleaned, ovf = background.ccl.clean_masks_batched.__wrapped__(
        raw, fig_thresholds, inner_thresholds
    )
    masks = background.finalize_masks_batched.__wrapped__(
        cleaned, mask_params
    )
    occ, col = carve_ops.carve_from_tables.__wrapped__(
        masks, frames, valid, lin_idx,
        views_threshold=views_threshold, color_camera=color_camera,
    )
    return occ, col, ovf


@functools.partial(
    jax.jit,
    static_argnames=(
        "btab_static", "mask_params", "use_hsv", "fig_thresholds",
        "inner_thresholds", "views_threshold", "grid_shape", "algorithm",
        "ambiguity", "capacity", "interpret", "ingest",
    ),
)
def _full_step_surface(
    stacked_fz, frames, pk, lcc, vorig, uorig, allv, ry, rx, *,
    btab_static, mask_params, use_hsv, fig_thresholds, inner_thresholds,
    views_threshold, grid_shape, algorithm, ambiguity, capacity,
    interpret=False, ingest="bgr", roi_offsets=None,
):
    """Frame → triangle mesh as ONE device program: the fused per-frame
    pipeline (_full_step_pallas, canonical layout) + the device-resident
    surface extraction (ops.marching_cubes.surface_program).  ``ingest``
    accepts the reduced-byte wire formats of _full_step_pallas."""
    occ, col, ovf = _full_step_pallas(
        stacked_fz, frames, pk, lcc, vorig, uorig, allv, ry, rx,
        btab_static=btab_static, mask_params=mask_params, use_hsv=use_hsv,
        fig_thresholds=fig_thresholds, inner_thresholds=inner_thresholds,
        views_threshold=views_threshold, layout="canonical",
        interpret=interpret, ingest=ingest, roi_offsets=roi_offsets,
    )
    verts, valid, n_active = mc.surface_program(
        occ.reshape(grid_shape), algorithm=algorithm, ambiguity=ambiguity,
        capacity=capacity,
    )
    return verts, valid, n_active, occ, col, ovf


@functools.partial(
    jax.jit,
    static_argnames=(
        "btab_static", "mask_params", "use_hsv", "fig_thresholds",
        "inner_thresholds", "views_threshold", "grid_shape", "capacity",
        "interpret", "ingest",
    ),
)
def _full_step_surface_wire(
    stacked_fz, frames, pk, lcc, vorig, uorig, allv, ry, rx, *,
    btab_static, mask_params, use_hsv, fig_thresholds, inner_thresholds,
    views_threshold, grid_shape, capacity, interpret=False,
    ingest="bgr", roi_offsets=None,
):
    """Frame → surface WIRE as one device program (r5): the fused
    pipeline + cell-id/config extraction (ops.marching_cubes.
    surface_wire_program) + bit-packed occupancy — ~0.4 MB out instead
    of the ~5.9 MB emitted-triangle buffer; the host emits triangles
    from the generated table, bit-identically (triangles_from_wire)."""
    occ, col, ovf = _full_step_pallas(
        stacked_fz, frames, pk, lcc, vorig, uorig, allv, ry, rx,
        btab_static=btab_static, mask_params=mask_params, use_hsv=use_hsv,
        fig_thresholds=fig_thresholds, inner_thresholds=inner_thresholds,
        views_threshold=views_threshold, layout="canonical",
        interpret=interpret, ingest=ingest, roi_offsets=roi_offsets,
    )
    return _encode_surface_wire(occ, ovf, grid_shape, capacity)


def _encode_surface_wire(occ, ovf, grid_shape, capacity):
    """One u8 buffer = [any_ovf i32][n_active i32][idx i32·cap][cfg u8·cap]
    [occ bits] — a single device→host fetch (every separate fetch pays
    the tunnel's fixed ~30 ms round trip; five of them capped the wire
    surface stream at ~9 fps)."""
    import jax

    idx, cfg, n_active = mc.surface_wire_program(
        occ.reshape(grid_shape), capacity=capacity,
    )
    occ_packed = jnp.packbits(occ.astype(jnp.uint8), bitorder="little")
    head = jax.lax.bitcast_convert_type(
        jnp.stack([jnp.any(ovf).astype(jnp.int32),
                   n_active.astype(jnp.int32)]), jnp.uint8,
    ).ravel()
    idx_b = jax.lax.bitcast_convert_type(
        idx.astype(jnp.int32), jnp.uint8).ravel()
    return jnp.concatenate([head, idx_b, cfg.ravel(), occ_packed])


def _decode_surface_wire(wire_host, capacity, num_voxels):
    """Host inverse of :func:`_encode_surface_wire` (zero-copy views)."""
    buf = np.asarray(wire_host)
    any_ovf, n_active = np.frombuffer(buf[:8].tobytes(), np.int32)
    o = 8
    idx = np.frombuffer(buf[o:o + 4 * capacity].tobytes(), np.int32)
    o += 4 * capacity
    cfg = buf[o:o + capacity]
    o += capacity
    occ = np.unpackbits(buf[o:], bitorder="little",
                        count=num_voxels).astype(bool)
    return int(any_ovf), int(n_active), idx, cfg, occ


@functools.partial(
    jax.jit,
    static_argnames=(
        "mask_params", "use_hsv", "fig_thresholds", "inner_thresholds",
        "views_threshold", "color_camera", "grid_shape", "capacity",
    ),
)
def _full_step_surface_wire_tables(
    stacked_fz, frames, valid_t, lin_idx, *, mask_params, use_hsv,
    fig_thresholds, inner_thresholds, views_threshold, color_camera,
    grid_shape, capacity,
):
    """XLA table-carve variant of :func:`_full_step_surface_wire`."""
    occ, col, ovf = _full_step_tables(
        stacked_fz, frames, valid_t, lin_idx, mask_params=mask_params,
        use_hsv=use_hsv, fig_thresholds=fig_thresholds,
        inner_thresholds=inner_thresholds,
        views_threshold=views_threshold, color_camera=color_camera,
    )
    return _encode_surface_wire(occ, ovf, grid_shape, capacity)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mask_params", "use_hsv", "fig_thresholds", "inner_thresholds",
        "views_threshold", "color_camera", "grid_shape", "algorithm",
        "ambiguity", "capacity",
    ),
)
def _full_step_surface_tables(
    stacked_fz, frames, valid_t, lin_idx, *, mask_params, use_hsv,
    fig_thresholds, inner_thresholds, views_threshold, color_camera,
    grid_shape, algorithm, ambiguity, capacity,
):
    """XLA table-carve variant of :func:`_full_step_surface` (CPU/CI and
    non-8-divisible grids)."""
    occ, col, ovf = _full_step_tables(
        stacked_fz, frames, valid_t, lin_idx, mask_params=mask_params,
        use_hsv=use_hsv, fig_thresholds=fig_thresholds,
        inner_thresholds=inner_thresholds,
        views_threshold=views_threshold, color_camera=color_camera,
    )
    verts, valid, n_active = mc.surface_program(
        occ.reshape(grid_shape), algorithm=algorithm, ambiguity=ambiguity,
        capacity=capacity,
    )
    return verts, valid, n_active, occ, col, ovf
