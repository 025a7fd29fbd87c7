"""Fused LayerNorm+ReLU Pallas kernel.

The SR conv block is Conv3x3 → LayerNorm(channels) → ReLU, twice
(/root/reference/Super_resolution/code/train_adaptive_unet.py:200-210). Under
mixed precision the norm must keep float32 statistics, which as separate XLA
ops costs a bf16→f32→bf16 round trip through HBM per activation tensor — the
dominant non-MXU traffic in this model. This kernel fuses normalize + affine
+ ReLU with bf16 in / bf16 out and f32 math in VMEM, halving that traffic.

``layer_norm_relu`` falls back to the pure-jnp reference implementation on
non-TPU backends (and under ``ADUNET_DISABLE_PALLAS=1``), and has a custom
VJP so the backward pass is exact regardless of path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["layer_norm_relu", "layer_norm_relu_reference"]


def layer_norm_relu_reference(
    x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float = 1e-3
) -> jax.Array:
    """Pure-jnp semantics: f32 stats over the channel axis, affine, ReLU,
    cast back to x.dtype (matches ConvBlock's LayerNorm(eps=1e-3)+ReLU)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(x.dtype)


def _kernel(x_ref, gamma_ref, beta_ref, out_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    out_ref[:] = jnp.maximum(y, 0.0).astype(out_ref.dtype)


def _pallas_forward(x2d: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, channels = x2d.shape
    # row-block sized to keep the f32 working set comfortably inside VMEM
    block_rows = 1024
    while rows % block_rows != 0:
        block_rows //= 2
    grid = (rows // block_rows,)

    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, channels), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, channels), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, channels), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, channels), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, channels), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=os.environ.get("ADUNET_PALLAS_INTERPRET") == "1",
    )(x2d, gamma.reshape(1, -1), beta.reshape(1, -1))


def _use_pallas() -> bool:
    if os.environ.get("ADUNET_DISABLE_PALLAS") == "1":
        return False
    if os.environ.get("ADUNET_FORCE_PALLAS") == "1":  # tests: interpret mode on CPU
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_relu(x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float = 1e-3):
    """Fused LayerNorm(channel axis)+ReLU over (..., C)."""
    return _forward(x, gamma, beta, eps)


def _forward(x, gamma, beta, eps):
    if not _use_pallas():
        return layer_norm_relu_reference(x, gamma, beta, eps)
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    try:
        out = _pallas_forward(x2d, gamma, beta, eps)
    except Exception:
        return layer_norm_relu_reference(x, gamma, beta, eps)
    return out.reshape(shape)


def _fwd(x, gamma, beta, eps):
    out = _forward(x, gamma, beta, eps)
    return out, (x, gamma, beta)


def _bwd(eps, residuals, g):
    """Exact VJP recomputed from inputs in f32 (rematerialised — the fused
    forward keeps no normalized intermediate in HBM)."""
    x, gamma, beta = residuals
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    c = x.shape[-1]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    pre_relu = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    mask = (pre_relu > 0).astype(jnp.float32)
    gm = gf * mask

    reduce_axes = tuple(range(x.ndim - 1))
    dgamma = jnp.sum(gm * xhat, axis=reduce_axes).astype(gamma.dtype)
    dbeta = jnp.sum(gm, axis=reduce_axes).astype(beta.dtype)

    gx_hat = gm * gamma.astype(jnp.float32)
    mean_g = jnp.mean(gx_hat, axis=-1, keepdims=True)
    mean_gx = jnp.mean(gx_hat * xhat, axis=-1, keepdims=True)
    dx = inv * (gx_hat - mean_g - xhat * mean_gx)
    del c
    return dx.astype(x.dtype), dgamma, dbeta


layer_norm_relu.defvjp(_fwd, _bwd)
