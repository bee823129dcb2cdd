"""Binary/grayscale morphology via ``lax.reduce_window``.

Replaces ``cv2.morphologyEx`` / ``cv2.erode`` with rectangular structuring
elements (reference background_subtraction.py:161-168,195-203 uses 3×3 and
2×2 rects; camera_calibration.py:261-263,285 uses erode).

Border semantics match OpenCV's morphology default (BORDER_CONSTANT with
the operation's identity: +∞ for erode, −∞ for dilate), i.e. pixels
outside the image never influence the result.

OpenCV anchors even-sized kernels at (ksize//2): for a 2×2 kernel the
window covering pixel (y, x) is rows [y-1, y] × cols [x-1, x] — replicated
here by asymmetric padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _window_reduce(img, ksize, init, op, anchor_policy="opencv"):
    kh, kw = ksize
    # OpenCV anchor = (k//2, k//2); window spans [i - anchor, i - anchor + k)
    ah, aw = kh // 2, kw // 2
    pad_lo_h, pad_hi_h = ah, kh - 1 - ah
    pad_lo_w, pad_hi_w = aw, kw - 1 - aw
    return lax.reduce_window(
        img,
        init,
        op,
        window_dimensions=(kh, kw),
        window_strides=(1, 1),
        padding=((pad_lo_h, pad_hi_h), (pad_lo_w, pad_hi_w)),
    )


@functools.partial(jax.jit, static_argnames=("ksize",))
def erode(img: jnp.ndarray, ksize=(3, 3)) -> jnp.ndarray:
    """Grayscale/binary erosion with a rect kernel (cv2.erode parity)."""
    f = img.astype(jnp.int32)
    out = _window_reduce(f, ksize, jnp.int32(255), lax.min)
    return out.astype(img.dtype)


@functools.partial(jax.jit, static_argnames=("ksize",))
def dilate(img: jnp.ndarray, ksize=(3, 3)) -> jnp.ndarray:
    """Grayscale/binary dilation with a rect kernel (cv2.dilate parity).

    Empirically (and per OpenCV's kernel-reflection convention) the
    effective window for a rect kernel equals erode's for both odd and
    even sizes: rows [y - k//2, y - k//2 + k).
    """
    f = img.astype(jnp.int32)
    out = _window_reduce(f, ksize, jnp.int32(0), lax.max)
    return out.astype(img.dtype)


@functools.partial(jax.jit, static_argnames=("ksize",))
def opening(img: jnp.ndarray, ksize=(3, 3)) -> jnp.ndarray:
    """Erode then dilate (cv2.MORPH_OPEN)."""
    return dilate(erode(img, ksize), ksize)


@functools.partial(jax.jit, static_argnames=("ksize",))
def closing(img: jnp.ndarray, ksize=(3, 3)) -> jnp.ndarray:
    """Dilate then erode (cv2.MORPH_CLOSE)."""
    return erode(dilate(img, ksize), ksize)
