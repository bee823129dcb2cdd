"""Drop-in replacement for the reference's ``assignment`` module API.

A viewer written against the reference's 4-function seam
(``executable.py:9``: generate_grid / set_voxel_positions /
get_cam_positions / get_cam_rotation_matrices, with the exact stateful
semantics of assignment.py) runs unchanged on top of this module:

    from vbr_tpu.apps import assignment_api as assignment
    positions, colors = assignment.set_voxel_positions(128, 64, 128)

State (videos, trained background models, carve tables) initializes
lazily on the first ``set_voxel_positions`` call and each call advances
every camera's video by one frame — matching assignment.py:54-149.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from vbr_tpu.utils.config import GridConfig, RigConfig

block_size = 1.0

# module state (assignment.py:18-40 equivalent)
_data_dir = os.environ.get("VBR_DATA_DIR", "data")
_model = None
_source = None


def configure(data_dir: str) -> None:
    """Point the module at a dataset (defaults to $VBR_DATA_DIR or ./data)."""
    global _data_dir, _model, _source
    _data_dir = data_dir
    _model = None
    _source = None


def generate_grid(width: int, depth: int):
    """Checkerboard floor tiles (assignment.py:43-51 semantics)."""
    from vbr_tpu.pipelines import reconstruction

    return reconstruction.generate_grid(width, depth)


def set_voxel_positions(width: int, height: int, depth: int):
    """Advance all videos one frame, carve, return (positions, colors).

    ``height`` is HALF the Y voxel count, like the reference
    (assignment.py:85 uses height*2).  Returns ([], []) at end of stream
    (assignment.py:95-96).
    """
    global _model, _source
    if _model is None:
        from vbr_tpu.models import VisualHull
        from vbr_tpu.utils import video as vio

        grid = GridConfig(nx=width, ny=height * 2, nz=depth)
        _model = VisualHull.from_data_dir(_data_dir, grid)
        _source = vio.MultiCameraSource(_data_dir)

    frames = _source.next_frames()
    if frames is None:
        return [], []
    occ, col = _model.process_frame_fast(frames)
    from vbr_tpu.ops import carve as carve_ops

    positions, colors = carve_ops.compact_voxels(
        occ, col, _model.grid, _model.rig.scaling_factor
    )
    return positions.tolist(), colors.tolist()


def get_cam_positions():
    """Camera centers in viewer coordinates + per-camera colors
    (assignment.py:152-177)."""
    from vbr_tpu.pipelines import reconstruction
    from vbr_tpu.utils import xmlio

    cams = reconstruction.load_rig(_data_dir)
    (_, square) = xmlio.load_chessboard_info(
        os.path.join(_data_dir, "checkerboard.xml")
    )
    return reconstruction.get_cam_positions(cams, square)


def get_cam_rotation_matrices():
    """4×4 viewer-space camera rotations (assignment.py:180-214)."""
    from vbr_tpu.pipelines import reconstruction

    cams = reconstruction.load_rig(_data_dir)
    return reconstruction.get_cam_rotation_matrices(cams)
