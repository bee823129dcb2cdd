"""vbr_tpu — TPU-native voxel-based 3D reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
4-camera visual-hull pipeline (ChristosP1/Voxel-Based-3D-Reconstruction):

  * checkerboard camera calibration (Zhang intrinsics + PnP extrinsics),
    implemented as batched least-squares in JAX (reference:
    camera_calibration.py),
  * per-camera background subtraction via per-pixel Gaussian-mixture models
    trained with ``lax.scan`` and applied on-device (reference:
    background_subtraction.py),
  * voxel carving fused into a single projection + mask-gather + AND-reduce
    kernel (reference: voxel_reconstruction.py + assignment.py), and
  * marching-cubes surface extraction as a JAX op (reference:
    voxel_reconstruction.py:127-163 via skimage).

Layers (see SURVEY.md §7):
  ops/        pure array ops: camera math, color, morphology, GMM, CCL,
              carving, marching cubes  (jax.numpy / Pallas)
  pipelines/  calibration, background subtraction, reconstruction programs
  parallel/   device-mesh sharding of the carve/mesh path (shard_map)
  models/     high-level model objects (VisualHull, rig)
  utils/      config, XML/npz artifact I/O, video ingest
  viewer/     OpenGL presentation layer + headless renderer
  native/     C++ host runtime (video decode / prefetch ring)
"""

__version__ = "0.1.0"

from vbr_tpu.utils.config import (  # noqa: F401
    CameraParams,
    GridConfig,
    MaskParams,
    MOGParams,
    RigConfig,
)
