"""End-to-end visual-hull reconstruction pipeline.

The TPU-native counterpart of ``assignment.set_voxel_positions``
(assignment.py:54-149): load a calibrated rig, build (once) the static
projection tables, then per frame: foreground masks → fused carve →
compacted viewer arrays.  Exposes the reference's exact 4-function viewer
contract (``executable.py:9``):

    generate_grid, set_voxel_positions, get_cam_positions,
    get_cam_rotation_matrices

so a viewer written against the reference API runs unchanged on top of this
framework.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from vbr_tpu.ops import camera as cam_ops
from vbr_tpu.ops import carve as carve_ops
from vbr_tpu.utils.config import (
    DEFAULT_MASK_PARAMS,
    CameraParams,
    GridConfig,
    MaskParams,
    RigConfig,
)
from vbr_tpu.utils import xmlio

BLOCK_SIZE = 1.0


def load_rig(data_dir: str, num_cameras: int = 4) -> List[CameraParams]:
    """Load per-camera calibration artifacts (data/cam*/config.xml)."""
    cams = []
    for i in range(1, num_cameras + 1):
        K, dist, rvec, tvec = xmlio.load_camera_config(
            os.path.join(data_dir, f"cam{i}")
        )
        cams.append(CameraParams.from_arrays(K, dist, rvec, tvec))
    return cams


class Reconstructor:
    """Stateful per-rig reconstruction session.

    Holds the static projection tables on device; each :meth:`carve_frame`
    call is a single jitted dispatch.  ``use_tables=False`` switches to the
    fused on-the-fly projection path (needed for very large grids).
    """

    def __init__(
        self,
        cameras: Sequence[CameraParams],
        grid: GridConfig,
        rig: RigConfig = RigConfig(),
        use_tables: bool = True,
    ):
        self.cameras = list(cameras)
        self.grid = grid
        self.rig = rig
        self.use_tables = use_tables
        image_hw = (rig.image_height, rig.image_width)
        if use_tables:
            self.tables = carve_ops.build_projection_tables(
                self.cameras, grid, image_hw
            )
        else:
            self.tables = None
            self._pose = carve_ops._pose_arrays(self.cameras)
            self._points = jnp.asarray(grid.voxel_points(), dtype=jnp.float32)

    def carve_frame(self, masks: np.ndarray, images: np.ndarray):
        """masks (C,H,W) uint8, images (C,H,W,3) uint8 BGR →
        (occupancy (N,), colors (N,3)) on device."""
        masks = jnp.asarray(masks)
        images = jnp.asarray(images)
        if self.use_tables:
            return carve_ops.carve_from_tables(
                masks,
                images,
                self.tables.valid,
                self.tables.lin_idx,
                views_threshold=self.rig.views_threshold,
                color_camera=self.rig.color_camera,
            )
        R, t, K4, dist = self._pose
        return carve_ops.carve_fused(
            masks,
            images,
            self._points,
            R,
            t,
            K4,
            dist,
            image_hw=(self.rig.image_height, self.rig.image_width),
            views_threshold=self.rig.views_threshold,
            color_camera=self.rig.color_camera,
        )

    def carve_frame_compact(self, masks: np.ndarray, images: np.ndarray):
        """Carve + host compaction into viewer positions/colors."""
        occ, colors = self.carve_frame(masks, images)
        return carve_ops.compact_voxels(
            occ, colors, self.grid, self.rig.scaling_factor
        )

    def occupancy_volume(self, masks: np.ndarray, images: np.ndarray) -> np.ndarray:
        """Carve and reshape occupancy into a (nx, ny, nz) bool volume."""
        occ, _ = self.carve_frame(masks, images)
        return np.asarray(occ).reshape(self.grid.shape)


# ---------------------------------------------------------------------------
# Reference 4-function viewer contract (assignment.py / executable.py seam)
# ---------------------------------------------------------------------------


def generate_grid(width: int, depth: int):
    """Checkerboard floor tile positions/colors (assignment.py:43-51)."""
    data, colors = [], []
    for x in range(width):
        for z in range(depth):
            data.append(
                [x * BLOCK_SIZE - width / 2, -BLOCK_SIZE, z * BLOCK_SIZE - depth / 2]
            )
            colors.append([1.0, 1.0, 1.0] if (x + z) % 2 == 0 else [0, 0, 0])
    return data, colors


def get_cam_positions(
    cameras: Sequence[CameraParams], square_size_mm: float = 115.0
):
    """Camera centers in viewer coordinates (assignment.py:152-177).

    C = -Rᵀ t scaled by 1/square_size, then OpenCV→OpenGL axis swap
    (x, -z, y).
    """
    positions = []
    for cp in cameras:
        R = cam_ops.rodrigues(cp.rvec, xp=np)
        C = (-R.T @ cp.tvec) / square_size_mm
        positions.append([C[0], -C[2], C[1]])
    palette = [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [1.0, 1.0, 0]]
    return positions, [palette[i % 4] for i in range(len(cameras))]


def get_cam_rotation_matrices(cameras: Sequence[CameraParams]) -> List[np.ndarray]:
    """Camera rotations as 4×4 column-major OpenGL matrices
    (assignment.py:180-214): transpose to column-major with the Y/Z columns
    swapped, then rotate 90° about Y and flip Y.
    """
    # R_y(pi/2): [[0,0,1],[0,1,0],[-1,0,0]] (standard math convention, the
    # matrix glm.rotate(pi/2, (0,1,0)) represents)
    rot90y = np.array(
        [[0, 0, 1, 0], [0, 1, 0, 0], [-1, 0, 0, 0], [0, 0, 0, 1]], dtype=np.float64
    )
    flip_y = np.diag([1.0, -1.0, 1.0, 1.0])
    axes_conversion = rot90y @ flip_y
    out = []
    for cp in cameras:
        R = cam_ops.rodrigues(cp.rvec, xp=np)
        # glm.mat4(rmtx[0][0], rmtx[1][0], rmtx[2][0], 0, rmtx[0][2], ...)
        # fills column-major: the math matrix has columns
        # (R col 0, R col 2, R col 1) — Y/Z columns swapped.
        M = np.eye(4)
        M[:3, 0] = R[:, 0]
        M[:3, 1] = R[:, 2]
        M[:3, 2] = R[:, 1]
        out.append(axes_conversion @ M)
    return out


# ---------------------------------------------------------------------------
# Artifact output
# ---------------------------------------------------------------------------


def write_ply(
    path: str, positions: np.ndarray, colors: Optional[np.ndarray] = None
) -> None:
    """Write a point cloud as binary-less ASCII PLY (viewer-independent dump)."""
    positions = np.asarray(positions, dtype=np.float32)
    n = positions.shape[0]
    has_color = colors is not None
    if has_color:
        rgb255 = np.clip(np.asarray(colors, dtype=np.float64) * 255.0, 0, 255).astype(
            np.uint8
        )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_color:
            f.write(
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            )
        f.write("end_header\n")
        for i in range(n):
            line = f"{positions[i,0]:.4f} {positions[i,1]:.4f} {positions[i,2]:.4f}"
            if has_color:
                line += f" {rgb255[i,0]} {rgb255[i,1]} {rgb255[i,2]}"
            f.write(line + "\n")
