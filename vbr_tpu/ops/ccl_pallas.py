"""Pallas TPU connected-component labeling (batched, in-VMEM).

Replaces the XLA ``ops.ccl.label_components`` while-loop (which re-reads
and re-writes the full label image from HBM at every associative-scan
step — ~10 ms/image) with a single kernel that keeps the whole padded
label image in VMEM/vregs and iterates to fixpoint with zero HBM traffic:

  per iteration:
    * 8-neighbour min (8-connectivity, shifted mins on the VPU)
    * segmented min-scans along rows and columns (Hillis-Steele with
      log2(dim) shift steps), which jump labels across entire runs —
      convergence in O(#shape turns), not O(diameter)

Labels are the minimum linear index (row * Wp + col, padded coords) of
each component; background gets 2**30.  Semantics identical to
ops.ccl.label_components (cross-checked in tests/test_ccl_pallas.py).

Reference semantics being served: the cv2.findContours RETR_TREE
hierarchy walk of background_subtraction.py:171-193.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 2**30  # plain int: jnp scalars become captured consts in pallas kernels


def _shift(x, dy, dx, fill):
    """Shift a 2-D i32 image by (dy, dx), filling vacated cells."""
    H, W = x.shape
    if dy:
        x = pltpu.roll(x, dy % H, 0)  # roll requires non-negative shifts
        ih = lax.broadcasted_iota(jnp.int32, (H, W), 0)
        x = jnp.where(ih < dy if dy > 0 else ih >= H + dy, fill, x)
    if dx:
        x = pltpu.roll(x, dx % W, 1)
        iw = lax.broadcasted_iota(jnp.int32, (H, W), 1)
        x = jnp.where(iw < dx if dx > 0 else iw >= W + dx, fill, x)
    return x


def _seg_min_scan(v, reset, axis, reverse):
    """Segmented running-min along ``axis`` (Hillis-Steele, log steps).

    ``reset`` (i32 0/1) starts a new segment; the scan never crosses it.
    """
    size = v.shape[axis]
    r = reset
    d = 1
    while d < size:
        s = -d if reverse else d
        vs = _shift(v, s if axis == 0 else 0, s if axis == 1 else 0, BIG)
        rs = _shift(r, s if axis == 0 else 0, s if axis == 1 else 0, 1)
        v = jnp.where(r > 0, v, jnp.minimum(v, vs))
        r = jnp.maximum(r, rs)
        d *= 2
    return v


def _make_label_kernel(H, W, max_iters):
    dirs = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
            (0, 1), (1, -1), (1, 0), (1, 1)]

    def kernel(fg_ref, out_ref):
        fg = fg_ref[0]  # (H, W) i32 0/1
        ih = lax.broadcasted_iota(jnp.int32, (H, W), 0)
        iw = lax.broadcasted_iota(jnp.int32, (H, W), 1)
        lin = ih * W + iw
        reset = 1 - fg
        labels = jnp.where(fg > 0, lin, BIG)

        def cond(state):
            _, changed, it = state
            return changed & (it < max_iters)

        def body(state):
            labels, _, it = state
            nm = labels
            for dy, dx in dirs:
                nm = jnp.minimum(nm, _shift(labels, dy, dx, BIG))
            l2 = jnp.where(fg > 0, jnp.minimum(labels, nm), BIG)
            l2 = _seg_min_scan(l2, reset, axis=1, reverse=False)
            l2 = _seg_min_scan(l2, reset, axis=1, reverse=True)
            l2 = _seg_min_scan(l2, reset, axis=0, reverse=False)
            l2 = _seg_min_scan(l2, reset, axis=0, reverse=True)
            changed = jnp.any(l2 != labels)
            return l2, changed, it + 1

        labels, _, _ = lax.while_loop(
            cond, body, (labels, jnp.bool_(True), jnp.int32(0))
        )
        out_ref[0] = labels

    return kernel


def _gate_bits(reset, axis, reverse):
    """Precomputed Hillis-Steele carry gates as an i32 bitmask per pixel.

    The segmented scan's accumulated-reset carry evolves independently of
    the values (r_{k+1} = r_k | shift(r_k, 2^k)), so its per-step gates
    can be computed ONCE: bit k of the result is the gate the scan tests
    at step 2^k.  The scan loop then shifts only the values — half its
    data movement — and tests gates with a register shift+and.
    """
    size = reset.shape[axis]
    b = reset  # i32 0/1
    g = jnp.zeros_like(reset)
    d = 1
    k = 0
    while d < size:
        g = g | (b << k)
        s = -d if reverse else d
        bs = _shift(b, s if axis == 0 else 0, s if axis == 1 else 0, 1)
        b = jnp.maximum(b, bs)
        d *= 2
        k += 1
    return g


def _seg_min_scan_gated(v, gbits, axis, reverse):
    """Segmented running-min with precomputed carry gates (see above)."""
    size = v.shape[axis]
    d = 1
    k = 0
    while d < size:
        s = -d if reverse else d
        vs = _shift(v, s if axis == 0 else 0, s if axis == 1 else 0, BIG)
        gate = (gbits >> k) & 1
        v = jnp.where(gate > 0, v, jnp.minimum(v, vs))
        d *= 2
        k += 1
    return v


def _make_combined_kernel(H, W, max_iters):
    """Kernel labeling BOTH phases of a binary image in one fixpoint.

    Foreground and background are complementary, so one label image with
    phase-aware segment resets labels every component of both in a single
    while-loop: the four segmented scans are shared (half the scan work of
    two separate labelings) and each image converges once, at
    max(fg iters, bg iters) instead of their sum.  Orthogonal neighbor
    merges are subsumed by the row/column scans (a same-phase left/right/
    up/down neighbor is by definition in the same scan segment), so the
    neighbor-min only needs the four diagonals.  Scan carry gates are
    precomputed as one i32 bitmask per direction (_gate_bits), so each
    scan step moves only the label values.
    """
    diags = [(-1, -1), (-1, 1), (1, -1), (1, 1)]

    def kernel(ph_ref, out_ref):
        ph = ph_ref[0]  # (H, W) i32 0/1 phase (1 = foreground)
        ih = lax.broadcasted_iota(jnp.int32, (H, W), 0)
        iw = lax.broadcasted_iota(jnp.int32, (H, W), 1)
        labels0 = ih * W + iw

        # loop-invariant: diagonal same-phase neighbor masks and
        # per-direction scan gates (fill -1 differs from both phases, so
        # image edges always reset)
        ph_d = [_shift(ph, dy, dx, -1) for dy, dx in diags]
        g_row_f = _gate_bits(
            (ph != _shift(ph, 0, 1, -1)).astype(jnp.int32), 1, False)
        g_row_r = _gate_bits(
            (ph != _shift(ph, 0, -1, -1)).astype(jnp.int32), 1, True)
        g_col_f = _gate_bits(
            (ph != _shift(ph, 1, 0, -1)).astype(jnp.int32), 0, False)
        g_col_r = _gate_bits(
            (ph != _shift(ph, -1, 0, -1)).astype(jnp.int32), 0, True)

        def cond(state):
            _, changed, it = state
            return changed & (it < max_iters)

        def body(state):
            labels, _, it = state
            nm = labels
            for phs, (dy, dx) in zip(ph_d, diags):
                sh = _shift(labels, dy, dx, BIG)
                nm = jnp.minimum(nm, jnp.where(phs == ph, sh, BIG))
            l2 = _seg_min_scan_gated(nm, g_row_f, axis=1, reverse=False)
            l2 = _seg_min_scan_gated(l2, g_row_r, axis=1, reverse=True)
            l2 = _seg_min_scan_gated(l2, g_col_f, axis=0, reverse=False)
            l2 = _seg_min_scan_gated(l2, g_col_r, axis=0, reverse=True)
            changed = jnp.any(l2 != labels)
            return l2, changed, it + 1

        labels, _, _ = lax.while_loop(
            cond, body, (labels0, jnp.bool_(True), jnp.int32(0))
        )
        out_ref[0] = labels

    return kernel


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def label_components_combined(
    phase: jnp.ndarray,  # (B, Hp, Wp) i32/bool; Hp % 8 == 0, Wp % 128 == 0
    max_iters: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Label fg AND bg components of each image in ONE kernel program.

    Returns (B, Hp, Wp) i32: every pixel carries the min padded linear
    index of its own-phase 8-connected component (no BIG sentinel — every
    pixel belongs to a component; mask by phase to recover the
    label_components_batched convention).  Equivalent to labeling
    ``[phase, ~phase]`` separately at roughly half the cost.
    """
    B, H, W = phase.shape
    if H % 8 or W % 128:
        raise ValueError("padded image dims must be multiples of (8, 128)")
    phase = phase.astype(jnp.int32)
    kernel = _make_combined_kernel(H, W, max_iters)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(phase)


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def label_components_batched(
    fg: jnp.ndarray,  # (B, Hp, Wp) i32 or bool; Hp % 8 == 0, Wp % 128 == 0
    max_iters: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched 8-connected labeling; labels = min padded linear index."""
    B, H, W = fg.shape
    if H % 8 or W % 128:
        raise ValueError("padded image dims must be multiples of (8, 128)")
    fg = fg.astype(jnp.int32)
    kernel = _make_label_kernel(H, W, max_iters)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        interpret=interpret,
        # the fixpoint loop keeps ~a dozen (H, W) i32 temporaries live;
        # the default 16 MB scoped-vmem limit is too tight for 512×768
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(fg)
