"""Pallas 3x3 SAME conv tuned for the C=64 levels of the SR U-Net.

Why: the reference architecture's base_channels=64 is half the 128-wide MXU
lane dimension, and XLA's native conv runs the FLOP-dominant 256px 64->64
layers well below the N=64 envelope (PERF.md). This kernel reformulates the
conv as tap-paired implicit GEMMs:

    out[m, co] = sum_{t=0..8} X_t[m, ci] @ W_t[ci, co]

Two taps are stacked along the contraction dim — ``[X_a | X_b] @ [[W_a],[W_b]]``
computes the exact two-tap partial sum with K=128 (full MXU depth) and ZERO
wasted FLOPs, unlike the block-diagonal batch-packing (2x FLOP tax, measured
dead end in round 1). The 9 taps become 4 K=128 GEMMs + 1 K=64 GEMM per
tile, accumulated in f32 VMEM.

Halo handling: Mosaic cannot DMA-slice a 64-lane window out of a 128-tiled
HBM buffer, and BlockSpec blocks cannot overlap — so the 1-row top/bottom
halos are precomputed in XLA as separate (B, n_blocks, W, C) arrays and
delivered through their own aligned BlockSpecs.

Numerics: bf16 operands, f32 accumulation — bit-comparable to XLA's
``lax.conv_general_dilated`` with ``preferred_element_type=f32``.

Usage: ``conv3x3_same(x, w, bias)`` with an XLA fallback for shapes the
kernel doesn't cover (see ``supported``); gradients via ``jax.custom_vjp``
whose backward passes are XLA convs (transposed-kernel correlation for dx,
pixel-contraction for dw).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_same", "conv3x3_same_pallas", "supported"]

# taps in (dy, dx) order, paired for K=128 stacking
_TAPS = [(dy, dx) for dy in range(3) for dx in range(3)]
_PAIRS = [(_TAPS[i], _TAPS[i + 1]) for i in range(0, 8, 2)]
_LAST = _TAPS[8]


def supported(x_shape, w_shape) -> bool:
    """Kernel applicability: 3x3, stride 1, C=Cout=64, H divisible by the
    row-block, W a lane-friendly multiple."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    B, H, W, C = x_shape
    kh, kw, ci, co = w_shape
    return (
        (kh, kw) == (3, 3)
        and C == ci == 64
        and co == 64
        and H % 8 == 0
        and W % 128 == 0
        and H >= 16
        and W >= 128
    )


def _kernel(x_ref, top_ref, bot_ref, w_ref, b_ref, out_ref, xbuf, acc,
            *, block_h: int, width: int):
    """One (batch, row-block) grid cell.

    x_ref:   (1, block_h, width, 64) VMEM — this block's input rows
    top_ref: (1, 1, width, 64) VMEM — the row above the block (zeros at h=0)
    bot_ref: (1, 1, width, 64) VMEM — the row below (zeros at h=H-1)
    w_ref:   (5, 128, 64) VMEM — tap-paired weights (last pair zero-padded)
    b_ref:   (1, 64) VMEM
    out_ref: (1, block_h, width, 64) VMEM
    xbuf:    (block_h + 2, width + 2, 64) VMEM scratch — halo+W-padded stage
    acc:     (block_h * width, 64) f32 VMEM scratch
    """
    # zero side columns so dx shifts become pure static slices
    xbuf[:, 0, :] = jnp.zeros((block_h + 2, 64), xbuf.dtype)
    xbuf[:, width + 1, :] = jnp.zeros((block_h + 2, 64), xbuf.dtype)
    xbuf[0, 1 : width + 1, :] = top_ref[0, 0]
    xbuf[1 : block_h + 1, 1 : width + 1, :] = x_ref[0]
    xbuf[block_h + 1, 1 : width + 1, :] = bot_ref[0, 0]

    def tap_view(dy: int, dx: int):
        v = xbuf[dy : dy + block_h, dx : dx + width, :]
        return v.reshape(block_h * width, 64)

    a0 = jnp.concatenate([tap_view(*_PAIRS[0][0]), tap_view(*_PAIRS[0][1])], axis=1)
    acc[:] = jnp.dot(a0, w_ref[0], preferred_element_type=jnp.float32)
    for idx in range(1, 4):
        (ta, tb) = _PAIRS[idx]
        a = jnp.concatenate([tap_view(*ta), tap_view(*tb)], axis=1)
        acc[:] += jnp.dot(a, w_ref[idx], preferred_element_type=jnp.float32)
    # last tap: K=64 GEMM against the zero-padded fifth pair slot's top half
    a_last = tap_view(*_LAST)
    acc[:] += jnp.dot(a_last, w_ref[4, :64, :], preferred_element_type=jnp.float32)

    out = acc[:] + b_ref[0][None, :].astype(jnp.float32)
    out_ref[0] = out.reshape(block_h, width, 64).astype(out_ref.dtype)


def _pack_weights(w: jax.Array) -> jax.Array:
    """(3,3,64,64) -> (5, 128, 64): four K-stacked tap pairs + padded single."""
    flat = w.reshape(9, 64, 64)
    pairs = [jnp.concatenate([flat[2 * i], flat[2 * i + 1]], axis=0) for i in range(4)]
    last = jnp.concatenate([flat[8], jnp.zeros((64, 64), w.dtype)], axis=0)
    return jnp.stack(pairs + [last], axis=0)


def _halo_rows(x: jax.Array, block_h: int):
    """(top, bot): the row above/below each block, zeros outside the image."""
    B, H, W, C = x.shape
    n_blocks = H // block_h
    top_idx = jnp.arange(n_blocks) * block_h - 1          # -1 -> zero row
    bot_idx = jnp.arange(n_blocks) * block_h + block_h    # H  -> zero row
    zero = jnp.zeros((B, 1, W, C), x.dtype)
    xz = jnp.concatenate([x, zero], axis=1)               # row H == zeros
    top = jnp.take(xz, jnp.where(top_idx < 0, H, top_idx), axis=1)
    bot = jnp.take(xz, jnp.where(bot_idx >= H, H, bot_idx), axis=1)
    return top, bot  # (B, n_blocks, W, C)


def _interpret_mode() -> bool:
    """Pallas TPU kernels run interpreted off-TPU (tests on the CPU mesh)."""
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("block_h",))
def conv3x3_same_pallas(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    block_h: int = 8,
) -> jax.Array:
    """Forward 3x3 SAME conv via the tap-paired Pallas kernel (C=Cout=64)."""
    B, H, W, C = x.shape
    assert supported(x.shape, w.shape), (x.shape, w.shape)
    if H % block_h != 0:
        # grid = H // block_h tiles; a remainder would leave the last rows of
        # the output buffer unwritten (silent VMEM garbage)
        raise ValueError(f"H={H} must be divisible by block_h={block_h}.")
    dt = x.dtype
    if bias is None:
        bias = jnp.zeros((w.shape[-1],), dt)

    top, bot = _halo_rows(x, block_h)
    wp = _pack_weights(w.astype(dt))
    b2 = bias.reshape(1, 64).astype(dt)

    grid = (B, H // block_h)
    out = pl.pallas_call(
        functools.partial(_kernel, block_h=block_h, width=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_h, W, 64), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, 64), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, 64), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 128, 64), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_h, W, 64), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 64), dt),
        scratch_shapes=[
            pltpu.VMEM((block_h + 2, W + 2, 64), dt),
            pltpu.VMEM((block_h * W, 64), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(x, top, bot, wp, b2)
    return out


def _xla_conv(x, w, bias):
    out = lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


@jax.custom_vjp
def conv3x3_same(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    """3x3 SAME conv: Pallas fast path for 64->64, XLA otherwise."""
    if supported(x.shape, w.shape):
        return conv3x3_same_pallas(x, w, bias)
    return _xla_conv(x, w, bias)


def _fwd(x, w, bias):
    return conv3x3_same(x, w, bias), (x, w)


def _bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    # dx: correlate cotangent with the spatially-flipped, io-swapped kernel
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = lax.conv_general_dilated(
        g, w_flip, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # dw: contraction over batch+pixels — express as a conv with batch as the
    # contraction dim (standard conv-backprop-filter formulation); explicit
    # 1-px padding makes the output spatial extent the 3x3 tap grid
    dw = lax.conv_general_dilated(
        jnp.transpose(x, (3, 1, 2, 0)),      # C_in as batch
        jnp.transpose(g, (1, 2, 0, 3)),      # H W B C_out as filter
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    # result: (C_in, 3, 3, C_out) -> (3, 3, C_in, C_out)
    dw = jnp.transpose(dw, (1, 2, 0, 3)).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(w.dtype)
    return dx, dw, db


conv3x3_same.defvjp(_fwd, _bwd)
