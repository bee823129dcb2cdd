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


@functools.partial(jax.jit, static_argnames=("params",), donate_argnums=(0,))
def _train_chunk(state: MOGState, frames_hsv: jnp.ndarray, params: MOGParams):
    def step(st, frame):
        return update(st, frame, params), None

    state, _ = jax.lax.scan(step, state, frames_hsv)
    return state


def train_mog(
    frames: np.ndarray,  # (T, H, W, 3) uint8 BGR
    params: MOGParams = MOGParams(),
    chunk: int = 16,
) -> MOGState:
    """Train a MOG model over a frame sequence with ``lax.scan``.

    Mirrors ``train_MOG_background_model`` (background_subtraction.py:49-87):
    sequential frames, auto learning rate, optional BGR→HSV conversion.

    The scan is dispatched in ``chunk``-frame pieces: keeps each device
    program short (long single programs can trip runtime watchdogs on
    tunneled TPU setups) and overlaps host decode with device compute.
    """
    T, H, W, _ = frames.shape
    state = init_state((H, W), params)
    for start in range(0, T, chunk):
        part = jnp.asarray(frames[start : start + chunk])
        if params.use_hsv:
            part = jax.vmap(color_ops.bgr_to_hsv_u8)(part)
        state = _train_chunk(state, part, params)
    return state


def extract_mask(
    state: MOGState, frame: np.ndarray, params: MOGParams = MOGParams()
) -> jnp.ndarray:
    """Frozen-model raw foreground mask for a BGR uint8 frame."""
    frame_d = jnp.asarray(frame)
    if params.use_hsv:
        frame_d = color_ops.bgr_to_hsv_u8(frame_d)
    return apply_frozen(state, frame_d, params)


# ---------------------------------------------------------------------------
# MOG2 (Zivkovic adaptive GMM) — reference train_MOG2_background_model
# (background_subtraction.py:90-127); cv2.createBackgroundSubtractorMOG2
# is available in-process as the parity oracle.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MOG2Params:
    n_mixtures: int = 5
    history: int = 500
    # Gates are on the TOTAL squared distance: ||x−μ||² < T · var, where
    # var tracks the 3-channel-summed variance (black-box calibrated
    # against cv2: constant training decays var to var_min=4 → fg flips at
    # Δ=5 for Tb=16; noisy training gives var≈3σ² clipped at var_max=75).
    var_threshold: float = 16.0  # Tb: background gate
    var_threshold_gen: float = 9.0  # Tg: ownership gate for updates
    bg_ratio: float = 0.9
    var_init: float = 15.0
    var_min: float = 4.0
    var_max: float = 5.0 * 15.0
    complexity_prune: float = 0.05  # cT
    use_hsv: bool = True


class MOG2State(NamedTuple):
    weight: jnp.ndarray  # (H, W, K)
    mean: jnp.ndarray  # (H, W, K, 3)
    var: jnp.ndarray  # (H, W, K)
    nframes: jnp.ndarray


def init_mog2(shape_hw, params: MOG2Params) -> MOG2State:
    H, W = shape_hw
    K = params.n_mixtures
    return MOG2State(
        weight=jnp.zeros((H, W, K), jnp.float32),
        mean=jnp.zeros((H, W, K, 3), jnp.float32),
        var=jnp.full((H, W, K), params.var_init, jnp.float32),
        nframes=jnp.zeros((), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("params",), donate_argnums=(0,))
def update_mog2(state: MOG2State, frame: jnp.ndarray,
                params: MOG2Params) -> MOG2State:
    """One Zivkovic update step on a (H, W, 3) uint8 frame."""
    nframes = state.nframes + 1
    alpha = 1.0 / jnp.minimum(nframes, params.history).astype(jnp.float32)
    x = frame.astype(jnp.float32)
    w, mu, var = state.weight, state.mean, state.var
    K = w.shape[-1]

    diff = x[..., None, :] - mu
    d2 = jnp.sum(diff * diff, axis=-1)
    # ownership: closest component within Tg·var (total variance)
    maha = d2 / jnp.maximum(var, 1e-6)
    fits = (maha < params.var_threshold_gen) & (w > 0)
    # closest fitting component
    maha_masked = jnp.where(fits, maha, jnp.inf)
    kmin = jnp.argmin(maha_masked, axis=-1)
    any_fit = fits.any(axis=-1)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, w.shape, w.ndim - 1)
    own = (k_idx == kmin[..., None]) & any_fit[..., None]

    w_new = w + alpha * (own.astype(jnp.float32) - w) - alpha * params.complexity_prune
    w_new = jnp.maximum(w_new, 0.0)
    rho = alpha / jnp.maximum(w_new, 1e-6)
    mu_new = jnp.where(own[..., None], mu + rho[..., None] * diff, mu)
    var_cand = var + rho * (d2 - var)
    var_new = jnp.where(
        own, jnp.clip(var_cand, params.var_min, params.var_max), var
    )

    # no fit: replace weakest with a new component
    weakest = jnp.argmin(w_new, axis=-1)
    replace = (~any_fit)[..., None] & (k_idx == weakest[..., None])
    w_new = jnp.where(replace, alpha, w_new)
    mu_new = jnp.where(replace[..., None], x[..., None, :], mu_new)
    var_new = jnp.where(replace, params.var_init, var_new)

    w_new = w_new / jnp.maximum(jnp.sum(w_new, axis=-1, keepdims=True), 1e-12)
    w_s, mu_s, var_s = _sort_state(w_new, mu_new, var_new)
    return MOG2State(weight=w_s, mean=mu_s, var=var_s, nframes=nframes)


@functools.partial(jax.jit, static_argnames=("params",))
def apply_mog2(state: MOG2State, frame: jnp.ndarray, params: MOG2Params):
    """Frozen MOG2 inference → (H, W) u8 mask {0, 255}."""
    x = frame.astype(jnp.float32)
    w, mu, var = state.weight, state.mean, state.var
    diff = x[..., None, :] - mu
    d2 = jnp.sum(diff * diff, axis=-1)
    maha = d2 / jnp.maximum(var, 1e-6)
    cumw = jnp.cumsum(w, axis=-1)
    # background components: leading set with cumulative weight <= ratio
    # (plus the first crossing one)
    over = cumw > params.bg_ratio
    k_fg = jnp.argmax(over, axis=-1) + 1
    k_fg = jnp.where(over.any(axis=-1), k_fg, w.shape[-1])
    k_idx = jax.lax.broadcasted_iota(jnp.int32, w.shape, w.ndim - 1)
    is_bg_component = k_idx < k_fg[..., None]
    matched_bg = (
        (maha < params.var_threshold) & is_bg_component & (w > 1e-7)
    ).any(axis=-1)
    return jnp.where(matched_bg, jnp.uint8(0), jnp.uint8(255))


@functools.partial(jax.jit, static_argnames=("params",), donate_argnums=(0,))
def _train_chunk_mog2(state, frames_hsv, params: MOG2Params):
    def step(st, fr):
        return update_mog2(st, fr, params), None

    state, _ = jax.lax.scan(step, state, frames_hsv)
    return state


def train_mog2(frames: np.ndarray, params: MOG2Params = MOG2Params(),
               chunk: int = 16):
    T, H, W, _ = frames.shape
    state = init_mog2((H, W), params)
    for start in range(0, T, chunk):
        part = jnp.asarray(frames[start : start + chunk])
        if params.use_hsv:
            part = jax.vmap(color_ops.bgr_to_hsv_u8)(part)
        state = _train_chunk_mog2(state, part, params)
    return state


def extract_mask_mog2(state, frame, params: MOG2Params = MOG2Params()):
    frame_d = jnp.asarray(frame)
    if params.use_hsv:
        frame_d = color_ops.bgr_to_hsv_u8(frame_d)
    return apply_mog2(state, frame_d, params)


# ---------------------------------------------------------------------------
# KNN background model — reference train_KNN_background_model
# (background_subtraction.py:9-46); cv2.createBackgroundSubtractorKNN is
# the oracle.  Per-pixel sample history; a pixel is background if at least
# ``k_neighbors`` stored samples lie within dist2_threshold.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class KNNParams:
    n_samples: int = 21
    k_neighbors: int = 2
    dist2_threshold: float = 400.0
    history: int = 500
    use_hsv: bool = True


class KNNState(NamedTuple):
    samples: jnp.ndarray  # (H, W, N, 3) f32
    n_seen: jnp.ndarray  # () int32
    key: jnp.ndarray  # PRNG key for reservoir updates


def init_knn(shape_hw, params: KNNParams, seed: int = 0) -> KNNState:
    H, W = shape_hw
    return KNNState(
        samples=jnp.full((H, W, params.n_samples, 3), -1e6, jnp.float32),
        n_seen=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(seed),
    )


@functools.partial(jax.jit, static_argnames=("params",), donate_argnums=(0,))
def update_knn(state: KNNState, frame: jnp.ndarray, params: KNNParams):
    """Reservoir-style per-pixel sample update (lr auto)."""
    x = frame.astype(jnp.float32)
    n_seen = state.n_seen + 1
    N = params.n_samples
    key, sub = jax.random.split(state.key)
    H, W = x.shape[:2]
    # first N frames fill slots round-robin; afterwards replace a random
    # slot with probability N/min(n_seen, history) per pixel (approximates
    # OpenCV's randomized short/mid/long-term sample replacement)
    fill_slot = (n_seen - 1) % N
    p_replace = N / jnp.minimum(n_seen, params.history).astype(jnp.float32)
    rand_slot = jax.random.randint(sub, (H, W), 0, N)
    key, sub2 = jax.random.split(key)
    do_replace = jax.random.uniform(sub2, (H, W)) < p_replace
    slot = jnp.where(n_seen <= N, fill_slot, rand_slot)
    replace = jnp.where(n_seen <= N, True, do_replace)
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W, N), 2)
    sel = (slot_idx == slot[..., None]) & replace[..., None]
    samples = jnp.where(sel[..., None], x[..., None, :], state.samples)
    return KNNState(samples=samples, n_seen=n_seen, key=key)


@functools.partial(jax.jit, static_argnames=("params",))
def apply_knn(state: KNNState, frame: jnp.ndarray, params: KNNParams):
    x = frame.astype(jnp.float32)
    d2 = jnp.sum((x[..., None, :] - state.samples) ** 2, axis=-1)
    close = (d2 < params.dist2_threshold).sum(axis=-1)
    return jnp.where(close >= params.k_neighbors, jnp.uint8(0), jnp.uint8(255))


@functools.partial(jax.jit, static_argnames=("params",), donate_argnums=(0,))
def _train_chunk_knn(state, frames_hsv, params: KNNParams):
    def step(st, fr):
        return update_knn(st, fr, params), None

    state, _ = jax.lax.scan(step, state, frames_hsv)
    return state


def train_knn(frames: np.ndarray, params: KNNParams = KNNParams(),
              chunk: int = 16):
    T, H, W, _ = frames.shape
    state = init_knn((H, W), params)
    for start in range(0, T, chunk):
        part = jnp.asarray(frames[start : start + chunk])
        if params.use_hsv:
            part = jax.vmap(color_ops.bgr_to_hsv_u8)(part)
        state = _train_chunk_knn(state, part, params)
    return state


def extract_mask_knn(state, frame, params: KNNParams = KNNParams()):
    frame_d = jnp.asarray(frame)
    if params.use_hsv:
        frame_d = color_ops.bgr_to_hsv_u8(frame_d)
    return apply_knn(state, frame_d, params)
