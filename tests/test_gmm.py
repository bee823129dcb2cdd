"""Behavioral tests for the per-pixel MOG background model.

No cv2.bgsegm oracle exists in this environment (contrib module absent),
so the MOG model is validated behaviorally on synthetic sequences; the
end-to-end gate is mask IoU vs the shipped golden masks (scripts/ +
tests/test_background_golden.py, slow-marked).
"""

import numpy as np
import pytest

from vbr_tpu.ops import gmm
from vbr_tpu.utils.config import MOGParams

RNG = np.random.default_rng(3)

PARAMS = MOGParams(n_mixtures=5, bg_ratio=0.7, noise_sigma=15.0,
                   history=200, use_hsv=False)


def constant_frames(value, t, hw=(8, 8), jitter=0.0):
    base = np.full((t, *hw, 3), value, dtype=np.float64)
    if jitter:
        base = base + RNG.normal(0, jitter, base.shape)
    return np.clip(base, 0, 255).astype(np.uint8)


class TestMOG:
    def test_background_is_zero(self):
        frames = constant_frames(100, 50, jitter=2.0)
        state = gmm.train_mog(frames, PARAMS)
        mask = np.asarray(gmm.extract_mask(state, frames[0], PARAMS))
        assert mask.mean() == 0.0

    def test_foreign_color_is_foreground(self):
        frames = constant_frames(100, 50, jitter=2.0)
        state = gmm.train_mog(frames, PARAMS)
        fg_frame = constant_frames(240, 1)[0]
        mask = np.asarray(gmm.extract_mask(state, fg_frame, PARAMS))
        assert mask.min() == 255

    def test_bimodal_background(self):
        # flickering background (e.g. screen): both modes learned
        a = constant_frames(60, 40, jitter=1.5)
        b = constant_frames(180, 40, jitter=1.5)
        frames = np.concatenate([a, b, a[:20], b[:20]])
        state = gmm.train_mog(frames, PARAMS)
        m_a = np.asarray(gmm.extract_mask(state, a[0], PARAMS))
        m_b = np.asarray(gmm.extract_mask(state, b[0], PARAMS))
        m_fg = np.asarray(gmm.extract_mask(state, constant_frames(255, 1)[0], PARAMS))
        assert m_a.mean() == 0
        assert m_b.mean() == 0
        assert m_fg.min() == 255

    def test_transient_object_stays_foreground(self):
        # 95 frames background + 5 frames of an intruder: intruder weight
        # stays below the background ratio → still foreground
        bg = constant_frames(100, 95, jitter=2.0)
        fg = constant_frames(220, 5)
        frames = np.concatenate([bg, fg])
        state = gmm.train_mog(frames, PARAMS)
        mask = np.asarray(gmm.extract_mask(state, fg[0], PARAMS))
        assert mask.min() == 255

    def test_mixture_weights_normalized(self):
        frames = constant_frames(100, 30, jitter=10.0)
        state = gmm.train_mog(frames, PARAMS)
        w = np.asarray(state.weight)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
        # sorted descending by sort key
        key = w / np.sqrt(3 * np.asarray(state.var))
        assert (np.diff(key, axis=-1) <= 1e-6).all()

    def test_spatial_independence(self):
        # left half bg A, right half bg B; swapped at inference → fg
        frames = constant_frames(80, 50, hw=(8, 8), jitter=1.0)
        frames[:, :, 4:, :] = 200
        state = gmm.train_mog(frames, PARAMS)
        swapped = frames[0].copy()
        swapped[:, :4] = 200
        swapped[:, 4:] = 80
        mask = np.asarray(gmm.extract_mask(state, swapped, PARAMS))
        assert mask.min() == 255

    def test_hsv_pipeline(self):
        p = MOGParams(n_mixtures=5, history=100, use_hsv=True, noise_sigma=15.0)
        frames = constant_frames(100, 30, jitter=2.0)
        state = gmm.train_mog(frames, p)
        mask = np.asarray(gmm.extract_mask(state, frames[0], p))
        assert mask.mean() == 0
