"""Fast oracle-parity gates for the background models (default CI).

Subsampled versions of the slow-marked gates in test_background_golden.py
/ test_bgsegm_oracles.py: 16 training frames at 1/4 resolution so a
MOG/MOG2/KNN parity regression fails in seconds rather than shipping
silently (the full-data gates stay slow-marked).

Reference: background_subtraction.py:9-127 (training), :129-208 (apply).
"""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_seq(data_dir):
    """16 quarter-res training frames + 1 test frame from cam1."""
    from vbr_tpu.utils import video as vio

    bg = vio.read_video(
        os.path.join(data_dir, "cam1", "background.avi"), max_frames=16
    )
    test = vio.read_video(
        os.path.join(data_dir, "cam1", "video.avi"), max_frames=1
    )[0]
    bg = bg[:, ::2, ::2]  # pure subsampling: both sides see identical input
    test = test[::2, ::2]
    return bg, test


def _iou(a, b):
    return (a & b).sum() / max((a | b).sum(), 1)


def test_mog_parity_fast(small_seq):
    import cv2

    from vbr_tpu.native import MOGOracle
    from vbr_tpu.ops import gmm
    from vbr_tpu.utils.config import MOGParams

    bg, test = small_seq
    params = MOGParams(history=bg.shape[0])
    oracle = MOGOracle(history=bg.shape[0], nmixtures=50,
                       background_ratio=0.9, noise_sigma=0)
    for fr in bg:
        oracle.apply(cv2.cvtColor(fr, cv2.COLOR_BGR2HSV), -1)
    mask_cv = oracle.apply(cv2.cvtColor(test, cv2.COLOR_BGR2HSV), 0)

    state = gmm.train_mog(bg, params)
    mask_jax = np.asarray(gmm.extract_mask(state, test, params))
    # bit-perfect on the production-regime rig data, like the slow-marked
    # full-data golden gate (r3: tightened from IoU >= 0.985 so a
    # single-bit regression fails default CI)
    np.testing.assert_array_equal(mask_jax > 0, mask_cv > 0)


def test_mog2_parity_fast(small_seq):
    import cv2

    from vbr_tpu.ops import gmm

    bg, test = small_seq
    params = gmm.MOG2Params(history=bg.shape[0], var_threshold=650,
                            use_hsv=True)
    sub = cv2.createBackgroundSubtractorMOG2(
        history=bg.shape[0], varThreshold=650, detectShadows=False
    )
    for fr in bg:
        sub.apply(cv2.cvtColor(fr, cv2.COLOR_BGR2HSV), None, -1)
    mask_cv = sub.apply(cv2.cvtColor(test, cv2.COLOR_BGR2HSV), None, 0)

    state = gmm.train_mog2(bg, params)
    mask_jax = np.asarray(gmm.extract_mask_mog2(state, test, params))
    # r2 exact Zivkovic reimplementation: pixel-perfect vs cv2
    np.testing.assert_array_equal(mask_jax > 0, mask_cv > 0)


def test_knn_parity_at_cv2_self_consistency_ceiling(small_seq):
    """cv2's KNN carries hidden process-global RNG state (bgfg_KNN): two
    runs on IDENTICAL data disagree with each other (~0.998 IoU on the
    real rig).  Bit-exactness is therefore ill-defined; the gate asserts
    our masks agree with cv2 at least as well as cv2 agrees with itself
    minus a small margin."""
    import cv2

    from vbr_tpu.ops import gmm

    bg, test = small_seq

    def run_cv():
        sub = cv2.createBackgroundSubtractorKNN(
            history=bg.shape[0], dist2Threshold=3500, detectShadows=False
        )
        for fr in bg:
            sub.apply(cv2.cvtColor(fr, cv2.COLOR_BGR2HSV), None, -1)
        return sub.apply(cv2.cvtColor(test, cv2.COLOR_BGR2HSV), None, 0) > 0

    a, b = run_cv(), run_cv()
    self_iou = _iou(a, b)

    params = gmm.KNNParams(history=bg.shape[0], dist2_threshold=3500,
                           use_hsv=True)
    state = gmm.train_knn(bg, params)
    ours = np.asarray(gmm.extract_mask_knn(state, test, params)) > 0
    our_iou = _iou(ours, a)
    assert our_iou >= self_iou - 0.02, (our_iou, self_iou)


def test_knn_parity_fast(small_seq):
    import cv2

    from vbr_tpu.ops import gmm

    bg, test = small_seq
    params = gmm.KNNParams(history=bg.shape[0], dist2_threshold=3500,
                           use_hsv=True)
    sub = cv2.createBackgroundSubtractorKNN(
        history=bg.shape[0], dist2Threshold=3500, detectShadows=False
    )
    for fr in bg:
        sub.apply(cv2.cvtColor(fr, cv2.COLOR_BGR2HSV), None, -1)
    mask_cv = sub.apply(cv2.cvtColor(test, cv2.COLOR_BGR2HSV), None, 0)

    state = gmm.train_knn(bg, params)
    mask_jax = np.asarray(gmm.extract_mask_knn(state, test, params))
    iou = _iou(mask_cv > 0, mask_jax > 0)
    assert iou >= 0.95, f"raw KNN IoU vs cv2: {iou}"


def test_cleaned_mask_pixel_identity_fast(small_seq):
    """End-to-end mask pipeline vs a fully independent oracle chain,
    pixel-identical (r3, VERDICT item 4): C++ bgsegm MOG + cv2
    connectedComponents cleanup + cv2 morphology on one side; our
    train_mog + frozen apply + batched device CCL + device morphology on
    the other.  A single-bit regression anywhere in the mask pipeline
    fails default CI."""
    import cv2

    from vbr_tpu.native import MOGOracle
    from vbr_tpu.ops import ccl, gmm
    from vbr_tpu.pipelines import background
    from vbr_tpu.utils.config import MaskParams, MOGParams

    bg, test = small_seq
    # quarter-res: scale the area thresholds accordingly (both sides see
    # the same values, so pixel-identity is still a bitwise gate)
    mp = MaskParams(1250, 30, False, False, True, True)
    params = MOGParams(history=bg.shape[0])

    oracle = MOGOracle(history=bg.shape[0], nmixtures=50,
                       background_ratio=0.9, noise_sigma=0)
    for fr in bg:
        oracle.apply(cv2.cvtColor(fr, cv2.COLOR_BGR2HSV), -1)
    mask_cv = oracle.apply(cv2.cvtColor(test, cv2.COLOR_BGR2HSV), 0)
    cleaned_cv = ccl.clean_mask_host(
        mask_cv, mp.figure_threshold, mp.inner_threshold
    )
    k2 = np.ones((2, 2), np.uint8)
    cleaned_cv = cv2.morphologyEx(cleaned_cv, cv2.MORPH_OPEN, k2)
    cleaned_cv = cv2.morphologyEx(cleaned_cv, cv2.MORPH_CLOSE, k2)

    state = gmm.train_mog(bg, params)
    ours = np.asarray(
        background.extract_foreground_mask(
            state, test, mp, params, ccl_backend="device"
        )
    )
    np.testing.assert_array_equal(ours > 0, cleaned_cv > 0)
