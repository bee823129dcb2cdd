"""Parity tests for color conversion and morphology vs OpenCV."""

import cv2
import numpy as np

from vbr_tpu.ops import color, morphology

RNG = np.random.default_rng(1)


class TestColor:
    def test_bgr_to_hsv_random(self):
        img = RNG.integers(0, 256, size=(64, 96, 3), dtype=np.uint8)
        ours = np.asarray(color.bgr_to_hsv_u8(img))
        ref = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        # V exact, S/H may differ by ±1 on a tiny fraction from fixed-point
        assert (ours[..., 2] == ref[..., 2]).all()
        mismatch = (ours != ref).any(axis=-1).mean()
        assert mismatch < 0.02, f"HSV mismatch fraction {mismatch}"
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_bgr_to_hsv_real_frame(self, first_frames):
        img = first_frames[0]
        ours = np.asarray(color.bgr_to_hsv_u8(img))
        ref = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        mismatch = (ours != ref).any(axis=-1).mean()
        assert mismatch < 0.02

    def test_bgr_to_gray(self):
        img = RNG.integers(0, 256, size=(64, 96, 3), dtype=np.uint8)
        ours = np.asarray(color.bgr_to_gray_u8(img))
        ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
        assert (ours == ref).mean() > 0.97

    def test_equalize_hist(self):
        img = RNG.integers(30, 200, size=(64, 96), dtype=np.uint8)
        ours = np.asarray(color.equalize_hist_u8(img))
        ref = cv2.equalizeHist(img)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
        assert (ours == ref).mean() > 0.95

    def test_threshold(self):
        img = RNG.integers(0, 256, size=(32, 32), dtype=np.uint8)
        ours = np.asarray(color.threshold_binary(img, 127))
        _, ref = cv2.threshold(img, 127, 255, cv2.THRESH_BINARY)
        np.testing.assert_array_equal(ours, ref)
        ours_i = np.asarray(color.threshold_binary_inv(img, 100))
        _, ref_i = cv2.threshold(img, 100, 255, cv2.THRESH_BINARY_INV)
        np.testing.assert_array_equal(ours_i, ref_i)


class TestMorphology:
    def _binary(self):
        return (RNG.uniform(size=(48, 80)) < 0.4).astype(np.uint8) * 255

    def test_erode_3x3(self):
        img = self._binary()
        k = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
        np.testing.assert_array_equal(
            np.asarray(morphology.erode(img, (3, 3))), cv2.erode(img, k)
        )

    def test_dilate_3x3(self):
        img = self._binary()
        k = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
        np.testing.assert_array_equal(
            np.asarray(morphology.dilate(img, (3, 3))), cv2.dilate(img, k)
        )

    def test_open_close_3x3(self):
        img = self._binary()
        k = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
        np.testing.assert_array_equal(
            np.asarray(morphology.opening(img, (3, 3))),
            cv2.morphologyEx(img, cv2.MORPH_OPEN, k),
        )
        np.testing.assert_array_equal(
            np.asarray(morphology.closing(img, (3, 3))),
            cv2.morphologyEx(img, cv2.MORPH_CLOSE, k),
        )

    def test_open_close_2x2(self):
        img = self._binary()
        k = cv2.getStructuringElement(cv2.MORPH_RECT, (2, 2))
        np.testing.assert_array_equal(
            np.asarray(morphology.opening(img, (2, 2))),
            cv2.morphologyEx(img, cv2.MORPH_OPEN, k),
        )
        np.testing.assert_array_equal(
            np.asarray(morphology.closing(img, (2, 2))),
            cv2.morphologyEx(img, cv2.MORPH_CLOSE, k),
        )

    def test_grayscale_morphology(self):
        img = RNG.integers(0, 256, size=(40, 60), dtype=np.uint8)
        k = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
        np.testing.assert_array_equal(
            np.asarray(morphology.erode(img, (3, 3))), cv2.erode(img, k)
        )
        np.testing.assert_array_equal(
            np.asarray(morphology.dilate(img, (3, 3))), cv2.dilate(img, k)
        )
