"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the platform flags before jax is imported anywhere (standard JAX
practice for testing collectives without TPU hardware — SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers a remote TPU backend and
# overwrites jax_platforms; undo that so tests run on the local 8-device CPU
# mesh (fast, deterministic, no tunnel round-trips).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def data_dir():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference dataset not available")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def rig_cameras(data_dir):
    """The four shipped calibrated cameras (data/cam*/config.xml)."""
    from vbr_tpu.utils.config import CameraParams
    from vbr_tpu.utils.xmlio import load_camera_config

    cams = []
    for i in range(1, 5):
        K, dist, rvec, tvec = load_camera_config(os.path.join(data_dir, f"cam{i}"))
        cams.append(CameraParams.from_arrays(K, dist, rvec, tvec))
    return cams


@pytest.fixture(scope="session")
def golden_masks(data_dir):
    """Shipped golden MOG masks (data/cam*/mask_MOG.jpg), thresholded binary."""
    import cv2

    masks = []
    for i in range(1, 5):
        m = cv2.imread(os.path.join(data_dir, f"cam{i}", "mask_MOG.jpg"), 0)
        if m is None:
            pytest.skip("golden masks unavailable")
        masks.append((m > 127).astype(np.uint8) * 255)
    return np.stack(masks)


@pytest.fixture(scope="session")
def first_frames(data_dir):
    """First frame of each camera's video.avi (BGR uint8)."""
    import cv2

    frames = []
    for i in range(1, 5):
        cap = cv2.VideoCapture(os.path.join(data_dir, f"cam{i}", "video.avi"))
        ok, frame = cap.read()
        cap.release()
        if not ok:
            pytest.skip("videos unavailable")
        frames.append(frame)
    return np.stack(frames)
