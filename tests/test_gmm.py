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
        # OpenCV invariant: empty slots (w < FLT_EPSILON) form a suffix
        # (the array is only ever locally bubbled, never globally sorted,
        # so no global key ordering is guaranteed)
        valid = w >= float(gmm.FLT_EPSILON)
        first_invalid = np.argmax(~valid, axis=-1)
        first_invalid[valid.all(axis=-1)] = w.shape[-1]
        k_idx = np.arange(w.shape[-1])
        assert (valid == (k_idx < first_invalid[..., None])).all()

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


class TestOracleProbes:
    """Randomized black-box probes vs the C++ bgsegm oracle.

    The training dynamics (stored sortKey = w_new/√Σvar_old, exact weight
    renormalization, pre-bubble kHit, single upward bubble, replacement at
    the first empty slot with var0 = 4·(default σ)²) were pinned down by
    these probes; residual disagreement is confined to rare bubble-edge
    events, so thresholds are set at the empirically stable level.
    """

    @pytest.fixture(autouse=True)
    def _need_oracle(self):
        try:
            from vbr_tpu.native import MOGOracle  # noqa: F401
        except Exception:
            pytest.skip("native bgsegm oracle unavailable")

    def _run(self, K, T, seed, noise_sigma):
        from vbr_tpu.native import MOGOracle

        rng = np.random.default_rng(seed)
        H, W = 10, 12
        cur = rng.integers(0, 256, (H, W, 3)).astype(np.float64)
        frames = []
        for _ in range(T):
            jump = rng.random((H, W, 1)) < 0.10
            cur = np.where(jump, rng.integers(0, 256, (H, W, 3)), cur)
            frames.append(
                np.clip(cur + rng.normal(0, 5, (H, W, 3)), 0, 255).astype(np.uint8)
            )
        frames = np.stack(frames)

        orc = MOGOracle(history=T, nmixtures=K, background_ratio=0.9,
                        noise_sigma=noise_sigma)
        orc_masks = np.stack([orc.apply(f, -1.0) for f in frames])

        ns = noise_sigma if noise_sigma > 0 else 15.0
        p = MOGParams(n_mixtures=K, bg_ratio=0.9, noise_sigma=ns,
                      history=T, use_hsv=False)
        st, train_masks = gmm.train_mog(frames, p, return_masks=True)
        frozen_ours = np.asarray(gmm.extract_mask(st, frames[-1], p))
        frozen_orc = orc.apply(frames[-1], 0.0)
        return (train_masks == orc_masks).mean(), (frozen_ours == frozen_orc).mean()

    @pytest.mark.parametrize("K,seed,ns", [(3, 0, 0.0), (5, 1, 10.0), (50, 2, 0.0)])
    def test_training_and_frozen_agreement(self, K, seed, ns):
        train_agree, frozen_agree = self._run(K, 40, seed, ns)
        assert train_agree >= 0.985, train_agree
        assert frozen_agree >= 0.98, frozen_agree

    def test_stable_background_exact(self):
        # stable (low-churn) sequences — the production regime — agree
        # exactly with the C++ oracle
        from vbr_tpu.native import MOGOracle

        rng = np.random.default_rng(11)
        frames = np.clip(
            np.array([100, 140, 90]) + rng.normal(0, 3, (40, 10, 12, 3)),
            0, 255,
        ).astype(np.uint8)
        orc = MOGOracle(history=40, nmixtures=50, background_ratio=0.9,
                        noise_sigma=0)
        orc_masks = np.stack([orc.apply(f, -1.0) for f in frames])
        p = MOGParams(n_mixtures=50, bg_ratio=0.9, noise_sigma=15.0,
                      history=40, use_hsv=False)
        st, train_masks = gmm.train_mog(frames, p, return_masks=True)
        assert (train_masks == orc_masks).all()
        probe = np.clip(frames[-1].astype(np.int32) + 60, 0, 255).astype(np.uint8)
        assert (
            np.asarray(gmm.extract_mask(st, probe, p)) == orc.apply(probe, 0.0)
        ).all()


class TestPallasTrainingKernel:
    """Fused Pallas training kernel == XLA scan, bitwise (interpret)."""

    def test_bitwise_equal_to_xla_scan(self):
        import jax.numpy as jnp

        from vbr_tpu.utils.config import MOGParams

        rng = np.random.default_rng(7)
        H, W, T = 16, 48, 11
        frames = rng.integers(0, 256, (T, H, W, 3), dtype=np.uint8)
        p = MOGParams(history=T, use_hsv=False, n_mixtures=50)

        st_x = gmm.init_train_state((H, W), p)
        st_x, _ = gmm._train_chunk(st_x, jnp.asarray(frames), p, False)
        st_p = gmm.init_train_state((H, W), p)
        st_p = gmm._train_chunk_pallas(
            st_p, jnp.asarray(frames), p, interpret=True
        )
        for name in ("weight", "sort_key", "mean", "var"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st_x, name)),
                np.asarray(getattr(st_p, name)),
                err_msg=name,
            )
        assert int(st_p.nframes) == T

    def test_chunked_pallas_path_matches(self):
        """train_mog(backend='pallas') across chunk boundaries == xla."""
        from vbr_tpu.utils.config import MOGParams

        rng = np.random.default_rng(8)
        frames = rng.integers(0, 256, (21, 8, 32, 3), dtype=np.uint8)
        p = MOGParams(history=21, use_hsv=False, n_mixtures=10)
        import unittest.mock as mock

        # interpret-mode pallas on CPU
        orig = gmm._train_chunk_pallas

        def interp(state, part, params):
            return orig(state, part, params, interpret=True)

        with mock.patch.object(gmm, "_train_chunk_pallas", interp):
            st_p = gmm.train_mog(frames, p, chunk=8, backend="pallas")
        st_x = gmm.train_mog(frames, p, chunk=8, backend="xla")
        for name in ("weight", "mean", "var"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st_x, name)),
                np.asarray(getattr(st_p, name)),
                err_msg=name,
            )


class TestCompressedFrozenApply:
    """FrozenMOGState prefix compression must be decision-exact: the
    frozen classification only depends on slots j < min(n_lead, k_fg)."""

    def _random_state(self, rng, hw=(13, 17), K=12):
        H, W = hw
        # adversarial weights: random magnitudes, interior near-zeros
        # (terminating the OpenCV slot scan early), some all-zero pixels
        w = rng.uniform(0, 0.4, (H, W, K)).astype(np.float32)
        kill = rng.uniform(size=(H, W, K)) < 0.3
        w = np.where(kill, 0.0, w).astype(np.float32)
        w[0, 0] = 0.0  # fully-empty pixel → everything foreground
        mean = rng.uniform(0, 255, (H, W, K, 3)).astype(np.float32)
        var = rng.uniform(1.0, 900.0, (H, W, K)).astype(np.float32)
        import jax.numpy as jnp

        return gmm.MOGState(
            weight=jnp.asarray(w), mean=jnp.asarray(mean),
            var=jnp.asarray(var), nframes=jnp.asarray(50, jnp.int32),
        )

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_bitwise_equal_to_full_apply(self, seed):
        rng = np.random.default_rng(seed)
        params = MOGParams(n_mixtures=12, bg_ratio=0.8, use_hsv=False)
        state = self._random_state(rng)
        fz, ke = gmm.compress_frozen(state, params)
        assert 1 <= ke <= 12
        for _ in range(3):
            frame = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
            full = np.asarray(gmm.apply_frozen(state, frame, params))
            comp = np.asarray(gmm.apply_frozen_compressed(fz, frame))
            np.testing.assert_array_equal(full, comp)

    def test_trained_state_roundtrip(self):
        frames = constant_frames(100, 60, jitter=2.0)
        state = gmm.train_mog(frames, PARAMS)
        fz, ke = gmm.compress_frozen(state, PARAMS)
        assert ke < PARAMS.n_mixtures  # compression actually happens
        probe = constant_frames(130, 1, jitter=40.0)[0]
        full = np.asarray(gmm.apply_frozen(state, probe, PARAMS))
        comp = np.asarray(gmm.apply_frozen_compressed(fz, probe))
        np.testing.assert_array_equal(full, comp)

    def test_stacked_batched_fz_matches_unbatched(self):
        from vbr_tpu.pipelines import background

        rng = np.random.default_rng(7)
        params = MOGParams(n_mixtures=8, bg_ratio=0.75, use_hsv=False)
        states = [self._random_state(rng, K=8) for _ in range(3)]
        fz = background.stack_frozen(states, params)
        frames = rng.integers(0, 256, (3, 13, 17, 3), dtype=np.uint8)
        import jax.numpy as jnp
        from vbr_tpu.utils.config import MaskParams

        mp = tuple(MaskParams(opening_pre=False, closing_pre=False)
                   for _ in range(3))
        batched = np.asarray(background.raw_masks_batched_fz(
            fz, jnp.asarray(frames), mp, False
        ))
        for c in range(3):
            ref = np.asarray(gmm.apply_frozen(states[c], frames[c], params))
            np.testing.assert_array_equal(batched[c], ref)
