"""Per-pixel Gaussian-mixture background models (MOG / MOG2 / KNN).

TPU-native replacement for OpenCV's stateful C++ background subtractors
(``cv2.bgsegm.createBackgroundSubtractorMOG`` et al., reference
background_subtraction.py:29-30,70-71,110-111): training is a ``lax.scan``
over the frame sequence of a ``vmap``-style vectorized per-pixel update
(training order matters — lr = 1/min(n, history) decays per frame), and
the frozen apply (lr = 0) is a single fused elementwise pass.

The MOG model follows the Grimson/KaewTraKulPong algorithm as implemented
by OpenCV bgsegm:
  * K mixtures per pixel, each with weight w, mean μ (3ch), scalar
    per-channel-summed variance test: match iff ‖x−μ‖² < 6.25·Σvar.
  * Matched (first in sort order): w += α(1−w); μ += α·diff;
    var += α·(diff²−var), floored at the noise variance.
  * Unmatched: w *= (1−α).  No match at all: weakest mixture replaced by
    (x, initial weight 0.05, noise variance).
  * Mixtures kept sorted by w/√Σvar; background = first B mixtures whose
    cumulative (normalized) weight exceeds backgroundRatio.

Exact equality with OpenCV's C++ is not attainable (internal fixed-point
and iteration-order details); parity is asserted behaviorally (IoU vs the
shipped mask_MOG.jpg goldens and black-box single-pixel probes) per
SURVEY.md §4.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vbr_tpu.ops import color as color_ops
from vbr_tpu.utils.config import MOGParams


class MOGState(NamedTuple):
    """Vectorized mixture state: leading dims = pixel grid (H, W)."""

    weight: jnp.ndarray  # (..., K)
    mean: jnp.ndarray  # (..., K, 3)
    var: jnp.ndarray  # (..., K) — per-mixture isotropic variance (per ch)
    nframes: jnp.ndarray  # () int32


VAR_THRESHOLD = 6.25  # 2.5² Mahalanobis-like gate (OpenCV defaultVarThreshold)
INITIAL_WEIGHT = 0.05  # OpenCV defaultInitialWeight
MIN_VAR_FACTOR = 1.0


def init_state(shape_hw, params: MOGParams) -> MOGState:
    H, W = shape_hw
    K = params.n_mixtures
    return MOGState(
        weight=jnp.zeros((H, W, K), jnp.float32),
        mean=jnp.zeros((H, W, K, 3), jnp.float32),
        var=jnp.full((H, W, K), params.noise_sigma**2, jnp.float32),
        nframes=jnp.zeros((), jnp.int32),
    )


def _sort_state(weight, mean, var):
    """Sort mixtures by sortKey = w/√(3·var) descending (OpenCV order)."""
    sort_key = weight / jnp.sqrt(jnp.maximum(3.0 * var, 1e-12))
    order = jnp.argsort(-sort_key, axis=-1)
    weight = jnp.take_along_axis(weight, order, axis=-1)
    var = jnp.take_along_axis(var, order, axis=-1)
    mean = jnp.take_along_axis(mean, order[..., None], axis=-2)
    return weight, mean, var


@functools.partial(jax.jit, static_argnames=("params",), donate_argnums=(0,))
def update(state: MOGState, frame: jnp.ndarray, params: MOGParams) -> MOGState:
    """One training step on a (H, W, 3) uint8 frame (lr = auto)."""
    nframes = state.nframes + 1
    alpha = 1.0 / jnp.minimum(nframes, params.history).astype(jnp.float32)

    x = frame.astype(jnp.float32)  # (H, W, 3)
    w, mu, var = state.weight, state.mean, state.var
    K = w.shape[-1]

    diff = x[..., None, :] - mu  # (H, W, K, 3)
    d2 = jnp.sum(diff * diff, axis=-1)  # (H, W, K)
    matched = (d2 < VAR_THRESHOLD * 3.0 * var) & (w > 1e-7)
    # first match in sorted order
    any_match = matched.any(axis=-1)
    first = jnp.argmax(matched, axis=-1)  # (H, W)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, w.shape, w.ndim - 1)
    is_hit = (k_idx == first[..., None]) & any_match[..., None]

    # matched update
    w_new = jnp.where(is_hit, w + alpha * (1.0 - w), w * (1.0 - alpha))
    mu_new = jnp.where(is_hit[..., None], mu + alpha * diff, mu)
    var_cand = var + alpha * (d2 / 3.0 - var)
    var_floor = params.noise_sigma**2 * MIN_VAR_FACTOR
    var_new = jnp.where(is_hit, jnp.maximum(var_cand, var_floor), var)

    # no-match replacement: weakest slot (K-1 after sort) gets a new mode
    replace = (~any_match)[..., None] & (k_idx == K - 1)
    w_new = jnp.where(replace, INITIAL_WEIGHT, w_new)
    mu_new = jnp.where(replace[..., None], x[..., None, :], mu_new)
    var_new = jnp.where(replace, params.var_init, var_new)

    # normalize weights
    w_new = w_new / jnp.maximum(jnp.sum(w_new, axis=-1, keepdims=True), 1e-12)

    w_s, mu_s, var_s = _sort_state(w_new, mu_new, var_new)
    return MOGState(weight=w_s, mean=mu_s, var=var_s, nframes=nframes)


@functools.partial(jax.jit, static_argnames=("params",))
def apply_frozen(state: MOGState, frame: jnp.ndarray, params: MOGParams):
    """Frozen inference (lr = 0): (H, W, 3) u8 → (H, W) u8 mask {0, 255}.

    A pixel is background iff its first matching mixture lies within the
    leading set whose cumulative weight ≤ backgroundRatio (OpenCV rule:
    foreground when the matched index reaches the first k with
    Σ_{i≤k} w_i > backgroundRatio).
    """
    x = frame.astype(jnp.float32)
    w, mu, var = state.weight, state.mean, state.var

    diff = x[..., None, :] - mu
    d2 = jnp.sum(diff * diff, axis=-1)
    matched = (d2 < VAR_THRESHOLD * 3.0 * var) & (w > 1e-7)
    any_match = matched.any(axis=-1)
    first = jnp.argmax(matched, axis=-1)

    cumw = jnp.cumsum(w, axis=-1)
    # kForeground: first index with cumw > ratio (after it, mixtures are fg)
    over = cumw > params.bg_ratio
    k_fg = jnp.argmax(over, axis=-1) + 1  # mixtures [0, k_fg) are background
    k_fg = jnp.where(over.any(axis=-1), k_fg, w.shape[-1])

    is_bg = any_match & (first < k_fg)
    return jnp.where(is_bg, jnp.uint8(0), jnp.uint8(255))


# ---------------------------------------------------------------------------
# Training drivers
# ---------------------------------------------------------------------------


def train_mog(
    frames: np.ndarray,  # (T, H, W, 3) uint8 BGR
    params: MOGParams = MOGParams(),
) -> MOGState:
    """Train a MOG model over a frame sequence with ``lax.scan``.

    Mirrors ``train_MOG_background_model`` (background_subtraction.py:49-87):
    sequential frames, auto learning rate, optional BGR→HSV conversion.
    """
    T, H, W, _ = frames.shape
    frames_d = jnp.asarray(frames)
    if params.use_hsv:
        frames_d = jax.vmap(color_ops.bgr_to_hsv_u8)(frames_d)
    state = init_state((H, W), params)

    def step(st, frame):
        return update(st, frame, params), None

    state, _ = jax.lax.scan(step, state, frames_d)
    return state


def extract_mask(
    state: MOGState, frame: np.ndarray, params: MOGParams = MOGParams()
) -> jnp.ndarray:
    """Frozen-model raw foreground mask for a BGR uint8 frame."""
    frame_d = jnp.asarray(frame)
    if params.use_hsv:
        frame_d = color_ops.bgr_to_hsv_u8(frame_d)
    return apply_frozen(state, frame_d, params)
