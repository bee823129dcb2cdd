"""OpenCV FileStorage XML I/O: parse shipped artifacts + round-trip with cv2."""

import os

import cv2
import numpy as np

from vbr_tpu.utils import xmlio


def test_load_shipped_config(data_dir):
    K, dist, rvec, tvec = xmlio.load_camera_config(os.path.join(data_dir, "cam1"))
    assert K.shape == (3, 3)
    assert dist.shape == (1, 5)
    assert rvec.shape == (3, 1)
    assert tvec.shape == (3, 1)
    # Values cross-checked against cv2.FileStorage
    fs = cv2.FileStorage(
        os.path.join(data_dir, "cam1", "config.xml"), cv2.FILE_STORAGE_READ
    )
    np.testing.assert_allclose(K, fs.getNode("CameraMatrix").mat(), atol=0)
    np.testing.assert_allclose(dist, fs.getNode("DistortionCoeffs").mat(), atol=0)
    fs.release()


def test_load_chessboard(data_dir):
    (w, h), square = xmlio.load_chessboard_info(
        os.path.join(data_dir, "checkerboard.xml")
    )
    assert (w, h) == (8, 6)
    assert square == 115.0


def test_roundtrip_readable_by_opencv(tmp_path):
    K = np.array([[488.85, 0, 334.2], [0, 490.5, 228.62], [0, 0, 1.0]])
    dist = np.array([-0.368, 0.194, -2e-4, 2.07e-4, -0.0613])
    rvec = np.array([-1.334, 0.552, 0.633])
    tvec = np.array([239.85, 731.16, 4745.83])
    cam_dir = str(tmp_path / "camX")
    xmlio.save_camera_config(cam_dir, K, dist, rvec, tvec)

    # Read back with our parser
    K2, dist2, rvec2, tvec2 = xmlio.load_camera_config(cam_dir)
    np.testing.assert_allclose(K2, K, rtol=1e-15)
    np.testing.assert_allclose(dist2.ravel(), dist, rtol=1e-15)

    # And with OpenCV's C++ FileStorage
    fs = cv2.FileStorage(os.path.join(cam_dir, "config.xml"), cv2.FILE_STORAGE_READ)
    np.testing.assert_allclose(fs.getNode("CameraMatrix").mat(), K, rtol=1e-15)
    np.testing.assert_allclose(
        fs.getNode("TranslationVector").mat().ravel(), tvec, rtol=1e-15
    )
    fs.release()


def test_scalar_nodes(tmp_path):
    path = str(tmp_path / "board.xml")
    xmlio.save_storage(
        path,
        {"CheckerBoardWidth": 8, "CheckerBoardHeight": 6, "CheckerBoardSquareSize": 115},
    )
    (w, h), sq = xmlio.load_chessboard_info(path)
    assert (w, h, sq) == (8, 6, 115.0)
