"""Per-pixel Gaussian-mixture background models (MOG / MOG2 / KNN).

TPU-native replacement for OpenCV's stateful C++ background subtractors
(``cv2.bgsegm.createBackgroundSubtractorMOG`` et al., reference
background_subtraction.py:29-30,70-71,110-111): training is a ``lax.scan``
over the frame sequence of a ``vmap``-style vectorized per-pixel update
(training order matters — lr = 1/min(n, history) decays per frame), and
the frozen apply (lr = 0) is a single fused elementwise pass.

The MOG model follows the Grimson/KaewTraKulPong algorithm as implemented
by OpenCV bgsegm (process8uC3 in bgfg_gaussmix), reproduced operation-for-
operation in f32.  Masks agree with the C++ oracle bit-for-bit on
stable-background / production-regime sequences (the full-data golden
gates assert exact equality); on adversarial randomized-churn sequences
residual bubble-edge sort ties leave ≥98.5% agreement (see
tests/test_gmm.py oracle probes):

  * K mixtures per pixel: weight w, mean μ (3ch), per-channel variance v,
    and a *stored* sortKey (OpenCV keeps the key from the last time the
    slot was touched, rescaled each frame — it is NOT recomputed from the
    current w/v).
  * Scan slots in storage order, stopping at the first w < FLT_EPSILON;
    match = first slot with ‖x−μ‖² < 6.25·Σv.
  * Matched: w += α(1−w); μ += α·diff; v += α(diff²−v) floored per channel
    at noiseσ²; sortKey := w_old/√Σv_new; then the slot bubbles UP while
    the key above is strictly smaller (single-element insertion — the
    array is only ever locally reordered, never fully sorted).
  * No match: the slot at the break position (first empty, else K−1) is
    replaced by (x, w₀ = 0.05, v₀ = 4·(default σ)² per channel,
    sortKey = w₀/(2·default σ)); no bubbling.
  * Unmatched weights are NOT decayed; instead all weights and sortKeys
    are rescaled by 1/Σw every training frame.
  * Mask: background iff the hit slot index (post-bubble) is below
    kForeground = first index where the cumulative weight exceeds
    backgroundRatio.

The TPU formulation is gather-free: because only ONE slot changes per
step, the insertion is expressed with a K-axis roll + masked selects, and
state is laid out (K, H·W) / (3, K, H·W) so the pixel axis is the minor
(lane) dimension — no argsort, no take_along_axis (the round-1 design's
per-step full argsort + 4 minor-axis gathers made training ~30× slower
than this).  Bit-exactness vs the C++ oracle is asserted by randomized
probe tests (tests/test_gmm.py) per SURVEY.md §4.

MOG2 (Zivkovic) is likewise reproduced operation-for-operation from
bgfg_gaussmix2.cpp — first-fit scan order, in-loop decay + prune with
the mid-loop ``nmodes--`` bound truncation, strict-inequality weight
bubbles, dynamic per-pixel mode counts, and cv2's 1/min(2n, history)
auto learning rate — giving pixel-exact masks vs
cv2.createBackgroundSubtractorMOG2 on the real data (tests).
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
    """Apply-facing mixture state: leading dims = pixel grid (H, W).

    ``var`` holds the per-mixture TOTAL (channel-summed) variance Σv —
    exactly the quantity OpenCV's match gate ``d² < 6.25·Σv`` consumes.
    Slots are in OpenCV storage order (bubble order); empty slots have
    weight 0 and terminate the scan.
    """

    weight: jnp.ndarray  # (..., K)
    mean: jnp.ndarray  # (..., K, 3)
    var: jnp.ndarray  # (..., K) — per-mixture total variance Σ_channels
    nframes: jnp.ndarray  # () int32


VAR_THRESHOLD = 6.25  # 2.5² Mahalanobis-like gate (OpenCV defaultVarThreshold)
INITIAL_WEIGHT = 0.05  # OpenCV defaultInitialWeight
DEFAULT_NOISE_SIGMA = 15.0  # OpenCV bgsegm defaultNoiseSigma = 30·0.5
FLT_EPSILON = np.float32(1.1920929e-07)


def init_state(shape_hw, params: MOGParams) -> MOGState:
    H, W = shape_hw
    K = params.n_mixtures
    return MOGState(
        weight=jnp.zeros((H, W, K), jnp.float32),
        mean=jnp.zeros((H, W, K, 3), jnp.float32),
        var=jnp.zeros((H, W, K), jnp.float32),
        nframes=jnp.zeros((), jnp.int32),
    )


class MOGTrainState(NamedTuple):
    """Training-time state in TPU-friendly layout: pixel axis minor.

    Mirrors OpenCV's MixData fields including the *stored* sortKey (which
    lags the live w/√Σv — OpenCV only refreshes it on a match and rescales
    it with the weights every frame).
    """

    weight: jnp.ndarray  # (K, HW)
    sort_key: jnp.ndarray  # (K, HW)
    mean: jnp.ndarray  # (3, K, HW)
    var: jnp.ndarray  # (3, K, HW) — per-channel variance
    nframes: jnp.ndarray  # () int32


def init_train_state(shape_hw, params: MOGParams) -> MOGTrainState:
    H, W = shape_hw
    K = params.n_mixtures
    hw = H * W
    return MOGTrainState(
        weight=jnp.zeros((K, hw), jnp.float32),
        sort_key=jnp.zeros((K, hw), jnp.float32),
        mean=jnp.zeros((3, K, hw), jnp.float32),
        var=jnp.zeros((3, K, hw), jnp.float32),
        nframes=jnp.zeros((), jnp.int32),
    )


def _shift_down(arr: jnp.ndarray, k_axis: int) -> jnp.ndarray:
    """out[..., j, ...] = arr[..., j-1, ...] along the K axis (j=0 dup)."""
    lead = arr[(slice(None),) * k_axis + (slice(0, 1),)]
    body = arr[(slice(None),) * k_axis + (slice(0, -1),)]
    return jnp.concatenate([lead, body], axis=k_axis)


def _train_step(
    state: MOGTrainState, x: jnp.ndarray, params: MOGParams
):
    """One OpenCV-exact training step.

    ``x``: (3, HW) f32 pixel values (already color-converted).  Returns
    (new_state, fg_mask (HW,) bool) — the mask OpenCV's apply() would
    emit during training.
    """
    nframes = state.nframes + 1
    alpha = (
        1.0 / jnp.minimum(nframes, params.history).astype(jnp.float32)
    ).astype(jnp.float32)
    w4, key4, mu3, var3, fg = _update_arrays(
        state.weight, state.sort_key, state.mean, state.var, x, alpha,
        params,
    )
    new_state = MOGTrainState(
        weight=w4, sort_key=key4, mean=mu3, var=var3, nframes=nframes
    )
    return new_state, fg


def _update_arrays(w, key_s, mu, var, x, alpha, params: MOGParams,
                   compute_fg: bool = True):
    """The OpenCV-exact per-frame mixture update on raw arrays.

    Shapes: w/key_s (K, P), mu/var (3, K, P), x (3, P), alpha scalar f32.
    Shared by the XLA scan step and the fused Pallas training kernel —
    written with sublane-reduction-friendly primitives (min/max-index
    tricks instead of argmax) so the same code traces under Mosaic.
    ``compute_fg=False`` skips the training-mode mask (its cumsum has no
    Mosaic lowering, and the fused kernel doesn't emit masks).
    """
    K = w.shape[0]
    k_idx = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)  # (K, P)

    # --- scan: OpenCV walks slots in order and BREAKS at the first
    # w < FLT_EPSILON, so only the leading valid prefix can match.
    invalid = w < FLT_EPSILON
    # first invalid index, K when none (min-index formulation)
    n_lead_valid = jnp.min(jnp.where(invalid, k_idx, K), axis=0)  # (P,)
    in_prefix = k_idx < n_lead_valid[None, :]

    diff = x[:, None, :] - mu  # (3, K, P)
    d2 = diff[0] * diff[0] + diff[1] * diff[1] + diff[2] * diff[2]
    varsum = (var[0] + var[1]) + var[2]  # (K, P)
    vt = np.float32(params.match_sigma**2)
    matched = in_prefix & (d2 < vt * varsum)
    any_match = matched.any(axis=0)  # (P,)
    # first matching slot (pre-bubble); 0 if none
    c = jnp.min(jnp.where(matched, k_idx, K), axis=0)
    c = jnp.where(any_match, c, 0)
    is_hit = (k_idx == c[None, :]) & any_match[None, :]

    # --- matched slot update (computed dense, selected by is_hit)
    min_var = np.float32(params.noise_sigma**2)
    w_upd = w + alpha * (1.0 - w)
    mu_upd = mu + alpha * diff
    var_upd = jnp.maximum(var + alpha * (diff * diff - var), min_var)
    # NEW weight / sqrt(OLD Σvar): the C++ reuses the scalar Σvar it
    # computed for the match gate (pre-update) in the sortKey denominator
    # (behavior pinned down by black-box probes vs the bgsegm oracle —
    # see tests/test_gmm.py oracle-parity probes).
    key_upd = w_upd / jnp.sqrt(varsum)

    w1 = jnp.where(is_hit, w_upd, w)
    mu1 = jnp.where(is_hit[None], mu_upd, mu)
    var1 = jnp.where(is_hit[None], var_upd, var)
    key1 = jnp.where(is_hit, key_upd, key_s)

    # --- single-element upward bubble (OpenCV: swap while the key above
    # is strictly smaller; stop at the first key >= val).  Final position
    # p = (largest j < c with stored key[j] >= val) + 1, else 0.
    val_w = jnp.sum(jnp.where(is_hit, w_upd, 0.0), axis=0)  # (HW,)
    val_key = jnp.sum(jnp.where(is_hit, key_upd, 0.0), axis=0)
    val_mu = jnp.sum(jnp.where(is_hit[None], mu_upd, 0.0), axis=1)  # (3,HW)
    val_var = jnp.sum(jnp.where(is_hit[None], var_upd, 0.0), axis=1)
    blocker = (k_idx < c[None, :]) & (key_s >= val_key[None, :])
    p = jnp.max(jnp.where(blocker, k_idx + 1, 0), axis=0)  # (HW,)

    def bubble(arr, val, k_axis):
        j = k_idx if k_axis == 0 else k_idx[None]
        pp = p[None, :] if k_axis == 0 else p[None, None, :]
        cc = c[None, :] if k_axis == 0 else c[None, None, :]
        vv = val[None, :] if k_axis == 0 else val[:, None, :]
        moved = jnp.where(
            j == pp, vv, jnp.where((j > pp) & (j <= cc), _shift_down(arr, k_axis), arr)
        )
        am = any_match[None, :] if k_axis == 0 else any_match[None, None, :]
        return jnp.where(am, moved, arr)

    w2 = bubble(w1, val_w, 0)
    key2 = bubble(key1, val_key, 0)
    mu2 = bubble(mu1, val_mu, 1)
    var2 = bubble(var1, val_var, 1)

    # --- no match: replace the slot at the break position (first empty,
    # else the last) with a fresh mode; no bubbling (OpenCV sets sk0 and
    # moves on).  var0/sk0 use the DEFAULT noise sigma, independent of the
    # instance's (bgfg_gaussmix constants).
    w0 = np.float32(INITIAL_WEIGHT)
    var0 = np.float32(4.0 * DEFAULT_NOISE_SIGMA**2)
    sk0 = np.float32(INITIAL_WEIGHT / (2.0 * DEFAULT_NOISE_SIGMA))
    r = jnp.minimum(n_lead_valid, K - 1)  # (HW,)
    repl = (~any_match)[None, :] & (k_idx == r[None, :])
    w3 = jnp.where(repl, w0, w2)
    key3 = jnp.where(repl, sk0, key2)
    mu3 = jnp.where(repl[None], x[:, None, :], mu2)
    var3 = jnp.where(repl[None], var0, var2)

    # --- renormalize weights AND sortKeys by 1/Σw (OpenCV does this every
    # training frame; it is what decays unmatched weights)
    wscale = 1.0 / jnp.sum(w3, axis=0)  # (HW,)
    w4 = w3 * wscale[None, :]
    key4 = key3 * wscale[None, :]

    # --- training-mode mask: PRE-bubble hit index vs kForeground (probe-
    # verified convention; the bubbled element's old position is compared)
    if not compute_fg:
        return w4, key4, mu3, var3, None
    k_hit = jnp.where(any_match, c, r)
    cumw = jnp.cumsum(w4, axis=0)
    over = cumw > np.float32(params.bg_ratio)
    # OpenCV leaves kForeground = -1 when cumw never exceeds the ratio,
    # which classifies everything as foreground — encode as k_fg = 0.
    # (min-index formulation: first index with cumw over the ratio)
    k_fg = jnp.where(
        over.any(axis=0),
        jnp.min(jnp.where(over, k_idx, K), axis=0) + 1,
        0,
    )
    fg = k_hit >= k_fg
    return w4, key4, mu3, var3, fg


def finalize_train_state(
    ts: MOGTrainState, shape_hw, params: MOGParams
) -> MOGState:
    """Convert training layout → apply-facing MOGState (Σvar, (H,W,K))."""
    H, W = shape_hw
    K = ts.weight.shape[0]
    varsum = (ts.var[0] + ts.var[1]) + ts.var[2]  # (K, HW)
    return MOGState(
        weight=jnp.transpose(ts.weight).reshape(H, W, K),
        mean=jnp.transpose(ts.mean, (2, 1, 0)).reshape(H, W, K, 3),
        var=jnp.transpose(varsum).reshape(H, W, K),
        nframes=ts.nframes,
    )


def _sort_state(weight, mean, var):
    """Sort mixtures by sortKey = w/√(3·var) descending (OpenCV order)."""
    sort_key = weight / jnp.sqrt(jnp.maximum(3.0 * var, 1e-12))
    order = jnp.argsort(-sort_key, axis=-1)
    weight = jnp.take_along_axis(weight, order, axis=-1)
    var = jnp.take_along_axis(var, order, axis=-1)
    mean = jnp.take_along_axis(mean, order[..., None], axis=-2)
    return weight, mean, var


@functools.partial(jax.jit, static_argnames=("params",))
def apply_frozen(state: MOGState, frame: jnp.ndarray, params: MOGParams):
    """Frozen inference (lr = 0): (H, W, 3) u8 → (H, W) u8 mask {0, 255}.

    OpenCV's alpha == 0 branch: scan slots in storage order, stop at the
    first weight < FLT_EPSILON; background iff the first matching slot
    index is below kForeground = first index whose cumulative weight
    exceeds backgroundRatio.
    """
    x = frame.astype(jnp.float32)
    w, mu, var = state.weight, state.mean, state.var
    K = w.shape[-1]

    k_idx = jax.lax.broadcasted_iota(jnp.int32, w.shape, w.ndim - 1)
    invalid = w < FLT_EPSILON
    n_lead = jnp.where(invalid.any(axis=-1), jnp.argmax(invalid, axis=-1), K)
    in_prefix = k_idx < n_lead[..., None]

    diff = x[..., None, :] - mu
    d2 = (
        diff[..., 0] * diff[..., 0]
        + diff[..., 1] * diff[..., 1]
        + diff[..., 2] * diff[..., 2]
    )
    vt = np.float32(params.match_sigma**2)
    matched = in_prefix & (d2 < vt * var)
    any_match = matched.any(axis=-1)
    first = jnp.argmax(matched, axis=-1)

    cumw = jnp.cumsum(w, axis=-1)
    over = cumw > np.float32(params.bg_ratio)
    # kForeground: first index with cumw > ratio; OpenCV's "never" case
    # (kForeground = -1) classifies everything as foreground → k_fg = 0.
    k_fg = jnp.where(over.any(axis=-1), jnp.argmax(over, axis=-1) + 1, 0)

    is_bg = any_match & (first < k_fg)
    return jnp.where(is_bg, jnp.uint8(0), jnp.uint8(255))


# ---------------------------------------------------------------------------
# Prefix-compressed frozen apply (exact, ~6× less HBM traffic)
# ---------------------------------------------------------------------------


class FrozenMOGState(NamedTuple):
    """Decision-sufficient compression of a frozen MOG model.

    The frozen (lr = 0) classification of :func:`apply_frozen` is
    ``background ⟺ ∃ slot j < min(n_lead, k_fg): ‖x−μⱼ‖² < 6.25·Σvⱼ``
    (the first matching slot is automatically the minimal matching index,
    so "first match below kForeground" ⟺ "any match below the per-pixel
    bound B = min(n_lead, k_fg)").  Slots at index ≥ B can never affect
    the mask, so we keep only the prefix of Ke = max_pixels(B) slots —
    on the production rig B is small (bg_ratio 0.9 concentrates weight in
    a few mixtures) while K = 50, cutting the per-frame state read from
    ~1 GB to ~150 MB.  Bitwise-identical masks: the kept μ/thr values and
    the d² arithmetic are unchanged (verified in tests/test_gmm.py).
    """

    mean: jnp.ndarray  # (..., Ke, 3) f32 — prefix of storage-order means
    thr: jnp.ndarray  # (..., Ke) f32 — precomputed 6.25·Σv per slot
    bcount: jnp.ndarray  # (...,) i32 — per-pixel decision-slot count B


def compress_frozen(state: MOGState, params: MOGParams,
                    k_eff: int | None = None):
    """MOGState → (FrozenMOGState, Ke).  ``k_eff`` forces the prefix
    length (for cross-camera batching); default = max over pixels."""
    w = state.weight
    K = w.shape[-1]
    invalid = w < FLT_EPSILON
    n_lead = jnp.where(invalid.any(axis=-1), jnp.argmax(invalid, axis=-1), K)
    cumw = jnp.cumsum(w, axis=-1)
    over = cumw > np.float32(params.bg_ratio)
    k_fg = jnp.where(over.any(axis=-1), jnp.argmax(over, axis=-1) + 1, 0)
    bcount = jnp.minimum(n_lead, k_fg).astype(jnp.int32)
    if k_eff is None:
        k_eff = max(int(np.asarray(jnp.max(bcount))), 1)
    vt = np.float32(params.match_sigma**2)
    return (
        FrozenMOGState(
            mean=state.mean[..., :k_eff, :],
            thr=vt * state.var[..., :k_eff],
            bcount=bcount,
        ),
        k_eff,
    )


@functools.partial(jax.jit, static_argnames=())
def apply_frozen_compressed(fz: FrozenMOGState, frame: jnp.ndarray):
    """Frozen inference on the compressed prefix — masks bitwise equal to
    :func:`apply_frozen` on the full state (see FrozenMOGState)."""
    x = frame.astype(jnp.float32)
    diff = x[..., None, :] - fz.mean
    d2 = (
        diff[..., 0] * diff[..., 0]
        + diff[..., 1] * diff[..., 1]
        + diff[..., 2] * diff[..., 2]
    )
    k_idx = jax.lax.broadcasted_iota(jnp.int32, fz.thr.shape, fz.thr.ndim - 1)
    matched = (k_idx < fz.bcount[..., None]) & (d2 < fz.thr)
    is_bg = matched.any(axis=-1)
    return jnp.where(is_bg, jnp.uint8(0), jnp.uint8(255))


# ---------------------------------------------------------------------------
# Training drivers
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("params", "emit_masks"), donate_argnums=(0,)
)
def _train_chunk(
    state: MOGTrainState,
    frames_conv: jnp.ndarray,  # (T, H, W, 3) u8, already color-converted
    params: MOGParams,
    emit_masks: bool = False,
):
    T, H, W, _ = frames_conv.shape
    # (T, 3, HW) f32 — pixel axis minor for TPU lane tiling
    xs = jnp.transpose(
        frames_conv.reshape(T, H * W, 3).astype(jnp.float32), (0, 2, 1)
    )

    def step(st, x):
        st2, fg = _train_step(st, x, params)
        return st2, (fg if emit_masks else None)

    state, fgs = jax.lax.scan(step, state, xs)
    if emit_masks:
        masks = jnp.where(fgs, jnp.uint8(255), jnp.uint8(0)).reshape(T, H, W)
        return state, masks
    return state, None


_TRAIN_TILE = 512  # pixels per kernel tile (lanes; multiple of 128)


def _make_train_kernel(K, T, params: MOGParams):
    """Fused multi-frame MOG training kernel: the mixture state tile stays
    in VMEM across all T frames of the chunk, so HBM sees ONE state
    read + write per chunk instead of one per frame (the XLA scan's
    ~20 full-state passes per frame made training memory-bound)."""
    history = np.int32(params.history)

    def kernel(nf_ref, xs_ref, w_in, key_in, mu_in, var_in,
               w_out, key_out, mu_out, var_out):
        # nf_ref: (1,) SMEM frames-already-seen; xs_ref (T, 3, TILE) f32
        def body(t, carry):
            w, key_s, mu, var = carry
            x = xs_ref[t]
            alpha = 1.0 / jnp.minimum(
                nf_ref[0] + t + 1, history
            ).astype(jnp.float32)
            w2, key2, mu2, var2, _ = _update_arrays(
                w, key_s, mu, var, x, alpha, params, compute_fg=False
            )
            return (w2, key2, mu2, var2)

        w, key_s, mu, var = jax.lax.fori_loop(
            0, T, body, (w_in[...], key_in[...], mu_in[...], var_in[...])
        )
        w_out[...] = w
        key_out[...] = key_s
        mu_out[...] = mu
        var_out[...] = var

    return kernel


@functools.partial(
    jax.jit, static_argnames=("params", "interpret"), donate_argnums=(0,)
)
def _train_chunk_pallas(
    state: MOGTrainState,
    frames_conv: jnp.ndarray,  # (T, H, W, 3) u8, already color-converted
    params: MOGParams,
    interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, H, W, _ = frames_conv.shape
    K = state.weight.shape[0]
    hw = state.weight.shape[1]
    TILE = _TRAIN_TILE
    hw_p = ((hw + TILE - 1) // TILE) * TILE
    pad = hw_p - hw

    xs = jnp.transpose(
        frames_conv.reshape(T, H * W, 3).astype(jnp.float32), (0, 2, 1)
    )
    if pad:
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, pad)))
    w = jnp.pad(state.weight, ((0, 0), (0, pad)))
    key_s = jnp.pad(state.sort_key, ((0, 0), (0, pad)))
    mu = jnp.pad(state.mean, ((0, 0), (0, 0), (0, pad)))
    var = jnp.pad(state.var, ((0, 0), (0, 0), (0, pad)))
    nf = state.nframes.reshape(1)

    kernel = _make_train_kernel(K, T, params)
    grid = (hw_p // TILE,)
    w2, key2, mu2, var2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nframes
            pl.BlockSpec((T, 3, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, hw_p), jnp.float32),
            jax.ShapeDtypeStruct((K, hw_p), jnp.float32),
            jax.ShapeDtypeStruct((3, K, hw_p), jnp.float32),
            jax.ShapeDtypeStruct((3, K, hw_p), jnp.float32),
        ],
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        interpret=interpret,
    )(nf, xs, w, key_s, mu, var)

    if pad:
        w2 = w2[:, :hw]
        key2 = key2[:, :hw]
        mu2 = mu2[:, :, :hw]
        var2 = var2[:, :, :hw]
    return MOGTrainState(
        weight=w2, sort_key=key2, mean=mu2, var=var2,
        nframes=state.nframes + T,
    )


def train_mog(
    frames: np.ndarray,  # (T, H, W, 3) uint8 BGR
    params: MOGParams = MOGParams(),
    chunk: int = 16,
    return_masks: bool = False,
    backend: str = "auto",  # "pallas" | "xla" | "auto"
):
    """Train a MOG model over a frame sequence with ``lax.scan``.

    Mirrors ``train_MOG_background_model`` (background_subtraction.py:49-87):
    sequential frames, auto learning rate, optional BGR→HSV conversion.

    The scan is dispatched in ``chunk``-frame pieces: keeps each device
    program short (long single programs can trip runtime watchdogs on
    tunneled TPU setups) and overlaps host decode with device compute.

    Returns the apply-facing :class:`MOGState`; with ``return_masks`` also
    the per-frame training masks (what OpenCV's apply() emits during
    training) as a (T, H, W) u8 array.
    """
    T, H, W, _ = frames.shape
    state = init_train_state((H, W), params)
    if backend == "auto":
        # The fused Pallas kernel (state tile resident in VMEM across a
        # whole chunk) is 2-3.5× faster than the XLA scan and bitwise
        # equal; its compile is ~2 s and persists in the jax compilation
        # cache.  (r2 measured "~5 min compile, not persisted" — that was
        # a misdiagnosis: the minutes were axon tunnel *session
        # establishment*, paid by any first device op of a process,
        # kernel or not.)  The kernel path does not emit per-frame
        # training masks, so mask requests fall back to the XLA scan,
        # as do non-TPU backends (Mosaic is TPU-only; the XLA scan is
        # the same math and the CPU-mesh test/CI path).
        on_tpu = jax.devices()[0].platform == "tpu"
        backend = "pallas" if (on_tpu and not return_masks) else "xla"
    mask_parts = []
    for start in range(0, T, chunk):
        part = jnp.asarray(frames[start : start + chunk])
        if params.use_hsv:
            part = jax.vmap(color_ops.bgr_to_hsv_u8)(part)
        if backend == "pallas" and not return_masks:
            state = _train_chunk_pallas(state, part, params)
        else:
            state, masks = _train_chunk(state, part, params, return_masks)
            if return_masks:
                mask_parts.append(np.asarray(masks))
    final = finalize_train_state(state, (H, W), params)
    if return_masks:
        return final, np.concatenate(mask_parts, axis=0)
    return final


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
    var: jnp.ndarray  # (H, W, K) — TOTAL (3-channel-summed) variance
    nmodes: jnp.ndarray  # (H, W) i32 — live mode count (Zivkovic dynamic K)
    nframes: jnp.ndarray


def init_mog2(shape_hw, params: MOG2Params) -> MOG2State:
    H, W = shape_hw
    K = params.n_mixtures
    return MOG2State(
        weight=jnp.zeros((H, W, K), jnp.float32),
        mean=jnp.zeros((H, W, K, 3), jnp.float32),
        var=jnp.full((H, W, K), params.var_init, jnp.float32),
        nmodes=jnp.zeros((H, W), jnp.int32),
        nframes=jnp.zeros((), jnp.int32),
    )


def _mog2_pass(w, mu, var, nmodes, x, alphaT, params: MOG2Params):
    """One exact pass of OpenCV's MOG2 per-pixel loop, vectorized.

    Reproduces bgfg_gaussmix2.cpp operation-for-operation (validated
    against cv2.createBackgroundSubtractorMOG2 by single-pixel probes to
    0 mask diffs over randomized sequences, incl. the mid-loop
    ``nmodes--`` truncation quirk and the strict-inequality bubbles):

      * modes visited in storage order; the *first* mode within
        Tg·var owns the sample (not the closest);
      * every visited mode decays ``w' = (1-α)w - α·cT`` (owner gets +α),
        and a visited non-owner with ``w' < α·cT`` is pruned to 0 with
        ``nmodes--`` — which also SHRINKS the loop bound, skipping the
        tail;
      * owner update ``k = α/w'``, ``μ += k·(x-μ)``,
        ``var = clamp(var + k·(dist2-var))`` with dist2 the channel-SUM;
      * owner bubbles up while its new weight is ≥ the (already decayed)
        weight above — strict ``<`` stops it;
      * no owner → new mode (replacing the last slot when full) with
        weight α (1.0 when it is the only mode), bubbled the same way;
      * weights renormalized by the total over visited modes.

    ``alphaT = 0`` reproduces the frozen apply exactly (no state change).
    The training/apply mask: background iff some visited mode k with
    cumulative (pre-normalization) weight below backgroundRatio has
    ``dist2 < Tb·var`` before the first owner.

    Returns (w, mu, var, nmodes, bg_mask bool).
    """
    K = w.shape[-1]
    f32 = jnp.float32
    alphaT = jnp.asarray(alphaT, f32)
    alpha1 = f32(1.0) - alphaT
    prune_neg = -alphaT * f32(params.complexity_prune)  # C++ 'prune' (≤ 0)
    Tb = f32(params.var_threshold)
    Tg = f32(params.var_threshold_gen)
    TB = f32(params.bg_ratio)

    k_idx = jax.lax.broadcasted_iota(jnp.int32, w.shape, w.ndim - 1)
    diff = x[..., None, :] - mu  # (..., K, 3)
    dist2 = (diff[..., 0] * diff[..., 0] + diff[..., 1] * diff[..., 1]
             + diff[..., 2] * diff[..., 2])
    fits_raw = dist2 < Tg * var

    # decayed-unmatched weights and the would-prune flags (owner is never
    # pruned: its weight gains +α ≥ α > α·cT)
    wd = alpha1 * w + prune_neg
    would_prune = wd < -prune_neg

    # pass 1 — processed prefix assuming no owner among earlier modes
    # (true for every mode up to and including the first fit): mode k is
    # processed iff k < nmodes − (#prunes among processed j < k)
    pc = jnp.zeros_like(nmodes)
    proc1 = []
    for j in range(K):
        pj = j < (nmodes - pc)
        proc1.append(pj)
        pc = pc + (would_prune[..., j] & pj).astype(pc.dtype)
    proc1 = jnp.stack(proc1, axis=-1)

    c = jnp.min(jnp.where(fits_raw & proc1, k_idx, K), axis=-1)  # first fit
    any_fit = c < K
    is_hit = (k_idx == c[..., None]) & any_fit[..., None]

    # pass 2 — processed prefix with the owner exempt from pruning
    wp_adj = would_prune & ~is_hit
    pc = jnp.zeros_like(nmodes)
    proc = []
    for j in range(K):
        pj = j < (nmodes - pc)
        proc.append(pj)
        pc = pc + (wp_adj[..., j] & pj).astype(pc.dtype)
    processed = jnp.stack(proc, axis=-1)

    # final per-slot weights (pre-bubble, pre-normalization)
    wfin = jnp.where(is_hit, wd + alphaT, wd)
    pruned = processed & ~is_hit & (wfin < -prune_neg)
    wfin = jnp.where(pruned, f32(0.0), wfin)
    wfin = jnp.where(processed, wfin, w)  # truncated tail keeps stale w
    nmodes1 = nmodes - jnp.sum(pruned, axis=-1)

    # owner content update (old var in both gate and update — C++ reuses
    # the pre-update scalars)
    w_hit_val = jnp.sum(jnp.where(is_hit, wfin, 0.0), axis=-1)
    kk = alphaT / jnp.maximum(w_hit_val, f32(1e-30))
    mu_upd = mu + kk[..., None, None] * diff
    var_upd = jnp.clip(
        var + kk[..., None] * (dist2 - var),
        f32(params.var_min), f32(params.var_max),
    )
    mu1 = jnp.where(is_hit[..., None], mu_upd, mu)
    var1 = jnp.where(is_hit, var_upd, var)

    # background test BEFORE mutating order: visited modes up to the
    # owner, cumulative pre-normalization weight below TB
    cum_excl = jnp.cumsum(jnp.where(processed, wfin, 0.0), axis=-1) \
        - jnp.where(processed, wfin, 0.0)
    visited = processed & (k_idx <= c[..., None])
    bg = jnp.any(
        visited & (cum_excl < TB) & (dist2 < Tb * var), axis=-1
    )

    # owner bubble: strict `<` stop ⇒ blockers are modes above with
    # strictly LARGER (decayed) weight
    blocker = (k_idx < c[..., None]) & (wfin > w_hit_val[..., None])
    pos = jnp.max(jnp.where(blocker, k_idx + 1, 0), axis=-1)

    def bubble_k(arr, val, pos, src, on):
        """K-axis at position `axis`; arr (..., K) or (..., K, 3)."""
        if arr.ndim == w.ndim:  # (..., K)
            j = jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 1)
            pp, cc = pos[..., None], src[..., None]
            vv = val[..., None] * jnp.ones_like(arr)
            onb = on[..., None]
            down = _shift_down(arr, arr.ndim - 1)
        else:  # (..., K, 3)
            j = jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 2)
            pp, cc = pos[..., None, None], src[..., None, None]
            vv = val
            onb = on[..., None, None]
            down = _shift_down(arr, arr.ndim - 2)
        moved = jnp.where(
            j == pp, vv, jnp.where((j > pp) & (j <= cc), down, arr)
        )
        return jnp.where(onb, moved, arr)

    hit_mu = jnp.sum(jnp.where(is_hit[..., None], mu_upd, 0.0), axis=-2,
                     keepdims=True)
    hit_var = jnp.sum(jnp.where(is_hit, var_upd, 0.0), axis=-1)
    w2 = bubble_k(wfin, w_hit_val, pos, c, any_fit)
    mu2 = bubble_k(mu1, hit_mu, pos, c, any_fit)
    var2 = bubble_k(var1, hit_var, pos, c, any_fit)

    total = jnp.sum(jnp.where(processed, wfin, 0.0), axis=-1)

    # no owner → new mode (training only: alphaT > 0)
    no_fit = (~any_fit) & (alphaT > 0)
    r = jnp.minimum(nmodes1, K - 1)
    nmodes2 = jnp.where(no_fit, jnp.minimum(nmodes1 + 1, K), nmodes1)
    is_single = nmodes2 == 1
    new_w = jnp.where(is_single, f32(1.0), alphaT)
    total = jnp.where(
        no_fit, jnp.where(is_single, f32(1.0), total + alphaT), total
    )
    # write the new mode at slot r, then bubble (strict `<` stop again)
    blocker2 = (k_idx < r[..., None]) & (w2 > new_w[..., None])
    pos2 = jnp.max(jnp.where(blocker2, k_idx + 1, 0), axis=-1)
    new_mu = jnp.broadcast_to(x[..., None, :], mu2.shape[:-2] + (1, 3))
    # place new values at slot r first (so the shift carries old content)
    k_last = jax.lax.broadcasted_iota(jnp.int32, w2.shape, w2.ndim - 1)
    at_r = k_last == r[..., None]
    w3 = jnp.where(no_fit[..., None] & at_r, new_w[..., None], w2)
    mu3 = jnp.where((no_fit[..., None] & at_r)[..., None],
                    x[..., None, :], mu2)
    var3 = jnp.where(no_fit[..., None] & at_r, f32(params.var_init), var2)
    w4 = bubble_k(w3, new_w, pos2, r, no_fit)
    mu4 = bubble_k(mu3, new_mu, pos2, r, no_fit)
    var4 = bubble_k(var3, jnp.full_like(new_w, params.var_init), pos2, r,
                    no_fit)

    inv = jnp.where(total > 0, f32(1.0) / total, f32(0.0))
    w5 = w4 * inv[..., None]
    return w5, mu4, var4, nmodes2, bg


@functools.partial(jax.jit, static_argnames=("params",), donate_argnums=(0,))
def update_mog2(state: MOG2State, frame: jnp.ndarray,
                params: MOG2Params) -> MOG2State:
    """One exact Zivkovic/OpenCV update on a (H, W, 3) uint8 frame.

    The auto learning rate mirrors cv2: α = 1/min(2·nframes, history).
    """
    nframes = state.nframes + 1
    alphaT = (
        1.0 / jnp.minimum(2 * nframes, params.history).astype(jnp.float32)
    )
    x = frame.astype(jnp.float32)
    w, mu, var, nmodes, bg = _mog2_pass(
        state.weight, state.mean, state.var, state.nmodes, x, alphaT, params
    )
    return MOG2State(weight=w, mean=mu, var=var, nmodes=nmodes,
                     nframes=nframes)


@functools.partial(jax.jit, static_argnames=("params",))
def apply_mog2(state: MOG2State, frame: jnp.ndarray, params: MOG2Params):
    """Frozen MOG2 inference → (H, W) u8 mask {0, 255} (α = 0 pass)."""
    x = frame.astype(jnp.float32)
    _, _, _, _, bg = _mog2_pass(
        state.weight, state.mean, state.var, state.nmodes, x,
        jnp.float32(0.0), params,
    )
    return jnp.where(bg, jnp.uint8(0), jnp.uint8(255))


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
