"""Typed configuration for the reconstruction framework.

Replaces the reference's three config tiers (``config.json`` module global at
``engine/config.py:1-4``, per-camera OpenCV-XML files, and hardcoded kwarg
tables like ``assignment.py:28-33``) with frozen dataclasses that are
hashable, so they can be closed over by ``jax.jit`` as static arguments.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Voxel-grid geometry.

    Mirrors the sampling of reference ``voxel_reconstruction.py:35-59``:
    ``linspace`` over each axis (inclusive endpoints), meshgrid transposed to
    x-major ordering ``(x, y, z)`` flattened as ``.T.reshape(-1, 3)`` — i.e.
    index = ((ix * ny) + iy) * nz + iz after the transpose.  The viewer calls
    it with ``(width, height*2, depth)`` (``assignment.py:85``).
    """

    nx: int = 128
    ny: int = 128
    nz: int = 128
    x_min: float = -512.0
    x_max: float = 1024.0
    y_min: float = -1024.0
    y_max: float = 1024.0
    z_min: float = -2048.0
    z_max: float = 512.0

    @property
    def num_voxels(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.nx, self.ny, self.nz)

    def axis_ranges(self):
        """Per-axis sample coordinates (numpy, float64 like the reference)."""
        xs = np.linspace(self.x_min, self.x_max, self.nx)
        ys = np.linspace(self.y_min, self.y_max, self.ny)
        zs = np.linspace(self.z_min, self.z_max, self.nz)
        return xs, ys, zs

    def voxel_points(self) -> np.ndarray:
        """(N, 3) world-mm voxel centers, canonical (ix, iy, iz) C-order.

        The *set* of points equals the reference's
        ``np.array(np.meshgrid(x, y, z)).T.reshape(-1, 3)``
        (``voxel_reconstruction.py:57``) but the row ordering differs: the
        reference enumerates (iz, ix, iy) with y fastest; we use the
        canonical ij order so ``occupancy.reshape(grid.shape)`` is directly a
        ``(nx, ny, nz)`` volume for marching cubes and sharding.  Parity
        tests compare occupancy keyed by world coordinate, not row index.
        """
        xs, ys, zs = self.axis_ranges()
        gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
        return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


@dataclasses.dataclass(frozen=True)
class CameraParams:
    """Calibrated pinhole camera: intrinsics K, 5 distortion coeffs, pose.

    The on-disk artifact is the reference's per-camera ``config.xml``
    (CameraMatrix / DistortionCoeffs / RotationVector / TranslationVector,
    written at ``camera_calibration.py:972-974``).
    Stored as tuples so the dataclass stays hashable; use ``.K``, ``.dist``,
    ``.rvec``, ``.tvec`` for numpy views.
    """

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    rvec_xyz: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    tvec_xyz: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float64,
        )

    @property
    def dist(self) -> np.ndarray:
        return np.array([self.k1, self.k2, self.p1, self.p2, self.k3], dtype=np.float64)

    @property
    def rvec(self) -> np.ndarray:
        return np.array(self.rvec_xyz, dtype=np.float64)

    @property
    def tvec(self) -> np.ndarray:
        return np.array(self.tvec_xyz, dtype=np.float64)

    @staticmethod
    def from_arrays(K, dist, rvec, tvec) -> "CameraParams":
        K = np.asarray(K, dtype=np.float64).reshape(3, 3)
        dist = np.asarray(dist, dtype=np.float64).reshape(-1)
        d = np.zeros(5)
        d[: dist.shape[0]] = dist[:5]
        rvec = np.asarray(rvec, dtype=np.float64).reshape(-1)
        tvec = np.asarray(tvec, dtype=np.float64).reshape(-1)
        return CameraParams(
            fx=float(K[0, 0]),
            fy=float(K[1, 1]),
            cx=float(K[0, 2]),
            cy=float(K[1, 2]),
            k1=float(d[0]),
            k2=float(d[1]),
            p1=float(d[2]),
            p2=float(d[3]),
            k3=float(d[4]),
            rvec_xyz=tuple(float(v) for v in rvec[:3]),
            tvec_xyz=tuple(float(v) for v in tvec[:3]),
        )


@dataclasses.dataclass(frozen=True)
class MaskParams:
    """Foreground-mask post-processing knobs.

    One row of the per-camera table at ``assignment.py:28-33`` /
    ``background_subtraction.py:356-360``.
    """

    figure_threshold: float = 5000.0
    inner_threshold: float = 115.0
    opening_pre: bool = False
    closing_pre: bool = False
    opening_post: bool = False
    closing_post: bool = False


# Per-camera production values (assignment.py:28-33).
DEFAULT_MASK_PARAMS: Tuple[MaskParams, ...] = (
    MaskParams(5000, 115, False, False, True, True),
    MaskParams(5000, 115, False, False, True, True),
    MaskParams(5000, 175, False, True, True, True),
    MaskParams(5000, 115, False, False, False, True),
)


@dataclasses.dataclass(frozen=True)
class MOGParams:
    """Grimson mixture-of-Gaussians background model hyperparameters.

    Production values from ``assignment.py:79-82`` (50 mixtures, ratio 0.9,
    noise_sigma 0 → OpenCV substitutes its default 30, history = background
    video length, HSV color space).
    """

    n_mixtures: int = 50
    bg_ratio: float = 0.9
    # OpenCV bgsegm defaultNoiseSigma = 30·0.5 = 15; the reference passes
    # noiseSigma=0 (assignment.py:82) which selects that default.
    noise_sigma: float = 15.0
    history: int = 134
    use_hsv: bool = True
    var_init: float = 225.0  # noiseSigma² at mixture birth
    var_min: float = 0.0
    match_sigma: float = 2.5  # Mahalanobis match threshold in sigmas


@dataclasses.dataclass(frozen=True)
class RigConfig:
    """A multi-camera capture rig + reconstruction settings."""

    num_cameras: int = 4
    image_height: int = 486
    image_width: int = 644
    views_threshold: int = 4  # voxel kept iff visible in >= this many views
    color_camera: int = 1  # 0-based index of camera used for voxel colors
    scaling_factor: float = 64.0  # world mm → viewer units (assignment.py:118)
    chessboard_rows: int = 6  # inner corners (data/checkerboard.xml)
    chessboard_cols: int = 8
    chessboard_square_mm: float = 115.0


@dataclasses.dataclass(frozen=True)
class AppConfig:
    """Viewer/application settings (reference ``config.json:1-13``)."""

    window_width: int = 1280
    window_height: int = 720
    world_width: int = 128
    world_height: int = 64
    world_depth: int = 128
    sampling_level: int = 4
    near: float = 0.1
    far: float = 500.0
    debug_mode: bool = False

    @staticmethod
    def load(path: str) -> "AppConfig":
        with open(path) as f:
            raw = json.load(f)
        return AppConfig(
            window_width=raw.get("window_width", 1280),
            window_height=raw.get("window_height", 720),
            world_width=raw.get("world_width", 128),
            world_height=raw.get("world_height", 64),
            world_depth=raw.get("world_depth", 128),
            sampling_level=raw.get("sampling_level", 4),
            near=raw.get("near", 0.1),
            far=raw.get("far", 500.0),
            debug_mode=raw.get("debug_mode", False),
        )


def reference_data_dir() -> str:
    """Locate the reference dataset (4-camera videos + calibration XML)."""
    for cand in (
        os.environ.get("VBR_DATA_DIR", ""),
        os.path.join(os.path.dirname(__file__), "..", "..", "data"),
        "/root/reference/data",
    ):
        if cand and os.path.isdir(cand):
            return os.path.abspath(cand)
    raise FileNotFoundError("no data directory found; set VBR_DATA_DIR")
