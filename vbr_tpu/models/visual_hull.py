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

    def masks(self, frames: np.ndarray, ccl_backend: str = "host") -> np.ndarray:
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

    def process_frame_fast(self, frames: np.ndarray):
        """Latency-optimized full step: 2 device dispatches per frame.

        Dispatch 1 runs HSV + frozen GMM apply + pre-morphology for ALL
        cameras in one program; the contour cleanup runs on host (native
        CCL, identical output); dispatch 2 fuses post-morphology with the
        carve.  Identical results to :meth:`process_frame`; ~4× fewer
        host↔device round trips (each costs ~30 ms on tunneled setups).
        """
        if getattr(self, "_stacked_bg", None) is None:
            self._stacked_bg = background.stack_states(self.bg_states)
            self._mask_params_t = tuple(self.mask_params)
        frames_d = jnp.asarray(frames)
        raw = background.raw_masks_batched(
            self._stacked_bg, frames_d, self._mask_params_t, self.mog_params[0]
        )
        raw_h = np.asarray(raw)
        cleaned = np.stack(
            [
                background.ccl.clean_mask_host(
                    raw_h[c],
                    self.mask_params[c].figure_threshold,
                    self.mask_params[c].inner_threshold,
                )
                for c in range(raw_h.shape[0])
            ]
        )
        return _finalize_and_carve(
            jnp.asarray(cleaned),
            frames_d,
            self.tables.valid,
            self.tables.lin_idx,
            mask_params=self._mask_params_t,
            views_threshold=self.rig.views_threshold,
            color_camera=self.rig.color_camera,
        )

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

    def extract_surface(self, frames: np.ndarray, masks=None):
        """Marching-tetrahedra mesh of the current hull, in world mm."""
        occ, _ = self.process_frame(frames, masks)
        volume = np.asarray(occ).reshape(self.grid.shape)
        xs, ys, zs = self.grid.axis_ranges()
        spacing = (xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0])
        return mc.extract_mesh(volume, origin=(xs[0], ys[0], zs[0]),
                               spacing=spacing)

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
