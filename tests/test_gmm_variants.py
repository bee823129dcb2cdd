"""MOG2 / KNN behavioral tests vs the in-process cv2 oracles."""

import cv2
import numpy as np
import pytest

from vbr_tpu.ops import gmm

RNG = np.random.default_rng(5)


def sequence_with_intruder(t_bg=60, hw=(24, 24)):
    frames = np.clip(
        np.full((t_bg, *hw, 3), 90.0) + RNG.normal(0, 3, (t_bg, *hw, 3)),
        0, 255,
    ).astype(np.uint8)
    test_bg = frames[0]
    test_fg = frames[0].copy()
    test_fg[8:16, 8:16] = 230
    return frames, test_bg, test_fg


def iou(a, b):
    a = a > 0
    b = b > 0
    return (a & b).sum() / max((a | b).sum(), 1)


class TestMOG2:
    def test_behavior_matches_opencv(self):
        frames, test_bg, test_fg = sequence_with_intruder()
        p = gmm.MOG2Params(use_hsv=False, history=60)
        state = gmm.train_mog2(frames, p)
        ours_bg = np.asarray(gmm.extract_mask_mog2(state, test_bg, p))
        ours_fg = np.asarray(gmm.extract_mask_mog2(state, test_fg, p))

        cv = cv2.createBackgroundSubtractorMOG2(
            history=60, varThreshold=16, detectShadows=False
        )
        for fr in frames:
            cv.apply(fr, None, -1)
        cv_bg = cv.apply(test_bg, None, 0)
        cv_fg = cv.apply(test_fg, None, 0)

        assert ours_bg.mean() == cv_bg.mean() == 0
        assert iou(ours_fg, cv_fg) > 0.9

    def test_high_var_threshold(self):
        # the reference trains with varThreshold=650 → very permissive
        frames, test_bg, test_fg = sequence_with_intruder()
        p = gmm.MOG2Params(use_hsv=False, history=60, var_threshold=650)
        state = gmm.train_mog2(frames, p)
        shifted = np.clip(test_bg.astype(int) + 40, 0, 255).astype(np.uint8)
        assert np.asarray(gmm.extract_mask_mog2(state, shifted, p)).mean() == 0


class TestKNN:
    def test_behavior_matches_opencv(self):
        frames, test_bg, test_fg = sequence_with_intruder()
        p = gmm.KNNParams(use_hsv=False, history=60, dist2_threshold=400)
        state = gmm.train_knn(frames, p)
        ours_bg = np.asarray(gmm.extract_mask_knn(state, test_bg, p))
        ours_fg = np.asarray(gmm.extract_mask_knn(state, test_fg, p))

        cv = cv2.createBackgroundSubtractorKNN(
            history=60, dist2Threshold=400, detectShadows=False
        )
        for fr in frames:
            cv.apply(fr, None, -1)
        cv_bg = cv.apply(test_bg, None, 0)
        cv_fg = cv.apply(test_fg, None, 0)

        assert ours_bg.mean() == cv_bg.mean() == 0
        assert iou(ours_fg, cv_fg) > 0.9

    def test_dist_threshold_semantics(self):
        frames, test_bg, _ = sequence_with_intruder()
        tight = gmm.KNNParams(use_hsv=False, dist2_threshold=10.0, history=60)
        state = gmm.train_knn(frames, tight)
        shifted = np.clip(test_bg.astype(int) + 15, 0, 255).astype(np.uint8)
        # 15² × 3 channels >> 10 → everything foreground under tight threshold
        assert np.asarray(gmm.extract_mask_knn(state, shifted, tight)).min() == 255
