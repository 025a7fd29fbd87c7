"""Fractional image resize as separable weight-matrix contractions.

The reference framework's central custom op is an *antialiased fractional
resize* (``ResizeByScale`` / ``ResizeToMatch``,
``/root/reference/shared/custom_layers.py:85-132``) built on
``tf.image.resize`` — an op that had no XLA kernel on the reference cluster,
forcing the whole model to run un-jitted
(``Super_resolution/code/train_adaptive_unet.py:43-44``).

The TPU-native design inverts that constraint. Because every (in_size,
out_size, kernel) triple is static under ``jax.jit``, the resize is expressed
as two dense matrix contractions with precomputed sampling-weight matrices:

    out[b, i, j, c] = sum_h sum_w  Wh[i, h] * Ww[j, w] * x[b, h, w, c]

which XLA lowers to plain ``dot_general`` ops on the MXU — no gather, no
dynamic shapes, and exact control over kernel semantics. One primitive covers
every resize flavor the reference uses:

- ``area``        — exact box-overlap integration (cv2.INTER_AREA / TF AREA)
- ``bilinear``    — triangle kernel, antialias-scaled on downsample
                    (tf.image.resize(method="bilinear", antialias=True))
- ``bicubic``     — Keys cubic a=-0.5 (tf.image.resize BICUBIC)
- ``bicubic_cv2`` — Keys cubic a=-0.75 (cv2.INTER_CUBIC, used by the
                    reference's LR degradation, shared/pipeline.py:79-94)
- ``nearest``     — TF-v2 half-pixel nearest (mask resizing)
- ``lanczos3``/``lanczos5`` — for completeness

All methods use half-pixel coordinate mapping (src = (dst+0.5)*in/out - 0.5)
and replicate (clamp) edge handling, matching both cv2 and TF v2.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "resize",
    "resize_by_scale",
    "resize_to_match",
    "scaled_size",
    "resize_matrix",
]


# --------------------------------------------------------------------------- #
# Sampling kernels (numpy, trace-time only)
# --------------------------------------------------------------------------- #

def _triangle(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


def _keys_cubic(x: np.ndarray, a: float) -> np.ndarray:
    """Keys piecewise-cubic kernel. a=-0.5 (TF/Catmull-Rom), a=-0.75 (cv2)."""
    x = np.abs(x)
    out = np.where(
        x <= 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a, 0.0),
    )
    return out


def _lanczos(x: np.ndarray, radius: float) -> np.ndarray:
    y = np.pi * x
    with np.errstate(invalid="ignore", divide="ignore"):
        out = radius * np.sin(y) * np.sin(y / radius) / (y * y)
    out = np.where(np.abs(x) < 1e-9, 1.0, out)
    return np.where(np.abs(x) < radius, out, 0.0)


_KERNELS = {
    "bilinear": (lambda x: _triangle(x), 1.0),
    "bicubic": (lambda x: _keys_cubic(x, -0.5), 2.0),
    "bicubic_cv2": (lambda x: _keys_cubic(x, -0.75), 2.0),
    "lanczos3": (lambda x: _lanczos(x, 3.0), 3.0),
    "lanczos5": (lambda x: _lanczos(x, 5.0), 5.0),
}


# --------------------------------------------------------------------------- #
# Weight matrices
# --------------------------------------------------------------------------- #

@functools.lru_cache(maxsize=None)
def resize_matrix(
    in_size: int,
    out_size: int,
    method: str = "bilinear",
    antialias: bool = True,
) -> np.ndarray:
    """Dense (out_size, in_size) float32 sampling-weight matrix.

    Rows sum to 1. Edge taps are clamped (replicate), matching cv2's
    BORDER_REPLICATE and TF v2's edge handling.
    """
    if in_size <= 0 or out_size <= 0:
        raise ValueError("in_size and out_size must be positive.")
    if in_size == out_size and method != "area":
        return np.eye(out_size, dtype=np.float32)

    s = in_size / out_size
    mat = np.zeros((out_size, in_size), dtype=np.float64)

    if method == "area":
        # Exact box-overlap integration (cv2.INTER_AREA / TF AREA semantics
        # for downscale; for upscale this degrades to bilinear-like overlap,
        # same as TF's AREA implementation).
        for i in range(out_size):
            lo, hi = i * s, (i + 1) * s
            j0, j1 = int(math.floor(lo)), int(math.ceil(hi))
            for j in range(j0, min(j1, in_size)):
                w = min(hi, j + 1) - max(lo, j)
                if w > 0:
                    mat[i, j] += w / s
        row_sums = mat.sum(axis=1, keepdims=True)
        mat /= row_sums
        return mat.astype(np.float32)

    if method == "nearest":
        # TF-v2 half-pixel nearest: src = floor((dst + 0.5) * s)
        for i in range(out_size):
            j = min(int(math.floor((i + 0.5) * s)), in_size - 1)
            mat[i, j] = 1.0
        return mat.astype(np.float32)

    if method not in _KERNELS:
        raise ValueError(f"Unknown resize method '{method}'.")
    kernel, radius = _KERNELS[method]

    # Edge handling differs between the two oracle libraries (verified
    # empirically against both):
    # - TF's scale_and_translate (all tf.image.resize v2 kernels) DROPS
    #   out-of-range taps and renormalizes the remainder.
    # - cv2 CLAMPS tap indices to the border (BORDER_REPLICATE).
    clamp_edges = method == "bicubic_cv2"

    # Antialias: stretch the kernel by the scale factor when downsampling.
    kscale = max(s, 1.0) if antialias else 1.0
    support = radius * kscale
    for i in range(out_size):
        center = (i + 0.5) * s - 0.5
        j0 = int(math.floor(center - support)) + 1
        j1 = int(math.ceil(center + support))
        js = np.arange(j0, j1 + 1)
        w = kernel((js - center) / kscale)
        if clamp_edges:
            jc = np.clip(js, 0, in_size - 1)
        else:
            keep = (js >= 0) & (js < in_size)
            js, w = js[keep], w[keep]
            jc = js
        np.add.at(mat[i], jc, w)
    row_sums = mat.sum(axis=1, keepdims=True)
    mat /= row_sums
    return mat.astype(np.float32)


# --------------------------------------------------------------------------- #
# Application
# --------------------------------------------------------------------------- #

def resize(
    x: jax.Array,
    out_hw: Tuple[int, int] | Sequence[int],
    method: str = "bilinear",
    antialias: bool = True,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Resize the spatial dims of a (..., H, W, C) array.

    Computes in float32 and returns float32 (callers preserve dtype where the
    reference layer does, e.g. ``nn.layers.ResizeByScale``).
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[-3], x.shape[-2]
    y = x.astype(jnp.float32)
    if h != out_h:
        wh = jnp.asarray(resize_matrix(h, out_h, method, antialias))
        y = jnp.einsum("ih,...hwc->...iwc", wh, y, precision=precision)
    if w != out_w:
        ww = jnp.asarray(resize_matrix(w, out_w, method, antialias))
        y = jnp.einsum("jw,...hwc->...hjc", ww, y, precision=precision)
    return y


def scaled_size(size: int, scale: float) -> int:
    """ceil(size * scale), floored at 1 — matches ResizeByScale's sizing
    (/root/reference/shared/custom_layers.py:97-100)."""
    return max(1, int(math.ceil(size * float(scale))))


def resize_by_scale(
    x: jax.Array,
    scale: float,
    method: str = "bilinear",
    antialias: bool = True,
) -> jax.Array:
    """Fractional resize by ``scale`` — TPU-native ResizeByScale.

    Shape math mirrors /root/reference/shared/custom_layers.py:93-103;
    preserves the incoming dtype like the reference layer.
    """
    h, w = x.shape[-3], x.shape[-2]
    y = resize(x, (scaled_size(h, scale), scaled_size(w, scale)), method, antialias)
    return y.astype(x.dtype)


def resize_to_match(
    x: jax.Array,
    ref: jax.Array,
    method: str = "bilinear",
    antialias: bool = True,
) -> jax.Array:
    """Resize ``x`` to ``ref``'s spatial dims — TPU-native ResizeToMatch
    (/root/reference/shared/custom_layers.py:114-132). Preserves x's dtype."""
    y = resize(x, (ref.shape[-3], ref.shape[-2]), method, antialias)
    return y.astype(x.dtype)
