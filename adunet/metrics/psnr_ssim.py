"""PSNR / SSIM / MS-SSIM with tf.image-compatible semantics, in pure jnp.

The reference computes all SR quality numbers with ``tf.image.psnr``,
``tf.image.ssim`` and ``tf.image.ssim_multiscale`` on the BT.601 luma channel
(Super_resolution/code/train_adaptive_unet.py:688-693,
Super_resolution/code/evaluate_model.py:118-121). These implementations are
algorithmic rebuilds of those ops (Gaussian 11x11 sigma 1.5 separable VALID
filtering; Wang et al. MS-SSIM weights with symmetric-pad avg-pool 2x2
downsampling) so the rebuilt evaluator reproduces the checked-in baseline
numbers to float tolerance. Everything is jit-compatible and static-shaped.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["psnr", "mse_per_image", "ssim", "ssim_multiscale"]

# Wang et al. (2003) MS-SSIM power factors — same constants as tf.image.
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def msssim_power_factors_for(min_dim: int, filter_size: int = 11):
    """Truncate the Wang weights to the scales that fit ``min_dim``.

    tf.image.ssim_multiscale requires min_dim >= filter_size * 2^(scales-1);
    the reference always evaluates >= 236px so all 5 scales apply. Smaller
    inputs (tests, thumbnails) get as many scales as fit.
    """
    scales = 1
    while min_dim // (2**scales) >= filter_size and scales < len(_MSSSIM_WEIGHTS):
        scales += 1
    return _MSSSIM_WEIGHTS[:scales]


@jax.jit
def mse_per_image(a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-image MSE over (H, W, C); inputs (N, H, W, C)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return jnp.mean(jnp.square(a - b), axis=(-3, -2, -1))


@functools.partial(jax.jit, static_argnames=("max_val",))
def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Per-image PSNR in dB; identical images yield +inf (the reference's
    scale-0.2 eval aggregates infs deliberately, BASELINE.md)."""
    mse = mse_per_image(a, b)
    return 10.0 * (jnp.log(max_val**2 / mse) / jnp.log(10.0)).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _gaussian_kernel_1d(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-0.5 * (coords / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def _filter2d_valid(x: jax.Array, kernel_1d: np.ndarray) -> jax.Array:
    """Separable VALID 2-D filtering over (N, H, W, C) via two 1-D contractions.

    Expressed as general dot products over unfolded windows would require
    gathers; instead we slide by stacking shifted slices — XLA fuses this into
    a small number of fused multiplies, and shapes stay static.
    """
    k = kernel_1d.shape[0]
    kern = jnp.asarray(kernel_1d)
    # filter along H
    h = x.shape[-3]
    y = sum(x[..., i : h - (k - 1) + i, :, :] * kern[i] for i in range(k))
    # filter along W
    w = x.shape[-2]
    y = sum(y[..., :, i : w - (k - 1) + i, :] * kern[i] for i in range(k))
    return y


def _ssim_per_channel(
    a: jax.Array,
    b: jax.Array,
    max_val: float,
    filter_size: int,
    filter_sigma: float,
    k1: float,
    k2: float,
):
    """Returns (ssim_per_channel, cs_per_channel), each (N, C) —
    mirrors tf.image's _ssim_per_channel."""
    kernel = _gaussian_kernel_1d(filter_size, filter_sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_a = _filter2d_valid(a, kernel)
    mu_b = _filter2d_valid(b, kernel)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b

    # E[x^2] - mu^2 etc., computed exactly as tf.image does (filter then
    # subtract) so rounding matches.
    sigma_aa = _filter2d_valid(a * a, kernel) - mu_aa
    sigma_bb = _filter2d_valid(b * b, kernel) - mu_bb
    sigma_ab = _filter2d_valid(a * b, kernel) - mu_ab

    luminance = (2.0 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    cs = (2.0 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    ssim_map = luminance * cs
    return jnp.mean(ssim_map, axis=(-3, -2)), jnp.mean(cs, axis=(-3, -2))


@functools.partial(
    jax.jit, static_argnames=("max_val", "filter_size", "filter_sigma", "k1", "k2")
)
def ssim(
    a: jax.Array,
    b: jax.Array,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Per-image SSIM, (N,) — tf.image.ssim semantics (mean over channels)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    s, _ = _ssim_per_channel(a, b, max_val, filter_size, filter_sigma, k1, k2)
    return jnp.mean(s, axis=-1)


def _downsample_2x(x: jax.Array) -> jax.Array:
    """Symmetric-pad to even dims, then 2x2 stride-2 average pool —
    tf.image.ssim_multiscale's between-scale downsampling."""
    h, w = x.shape[-3], x.shape[-2]
    pad_h, pad_w = h % 2, w % 2
    if pad_h or pad_w:
        cfg = [(0, 0)] * (x.ndim - 3) + [(0, pad_h), (0, pad_w), (0, 0)]
        x = jnp.pad(x, cfg, mode="symmetric")
        h, w = x.shape[-3], x.shape[-2]
    x = x.reshape(*x.shape[:-3], h // 2, 2, w // 2, 2, x.shape[-1])
    return jnp.mean(x, axis=(-4, -2))


@functools.partial(
    jax.jit,
    static_argnames=("max_val", "power_factors", "filter_size", "filter_sigma", "k1", "k2"),
)
def ssim_multiscale(
    a: jax.Array,
    b: jax.Array,
    max_val: float = 1.0,
    power_factors: Sequence[float] = _MSSSIM_WEIGHTS,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Per-image MS-SSIM, (N,) — tf.image.ssim_multiscale semantics."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    n_scales = len(power_factors)
    mcs = []
    ssim_last = None
    for scale in range(n_scales):
        if scale > 0:
            a = _downsample_2x(a)
            b = _downsample_2x(b)
        s, cs = _ssim_per_channel(a, b, max_val, filter_size, filter_sigma, k1, k2)
        mcs.append(jax.nn.relu(cs))
        ssim_last = s
    # prod(cs_i^w_i, i<last) * ssim_last^w_last, per channel, mean over channels
    powers = jnp.asarray(power_factors, dtype=jnp.float32)
    stacked = jnp.stack(mcs[:-1] + [jax.nn.relu(ssim_last)], axis=0)  # (S, N, C)
    value = jnp.prod(stacked ** powers[:, None, None], axis=0)
    return jnp.mean(value, axis=-1)
