"""Pallas fused LayerNorm+ReLU: parity (interpret mode) + exact VJP."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adunet.kernels import layer_norm_relu, layer_norm_relu_reference
from flax import linen as nn


def _data(rows=128, c=64, dtype=jnp.float32, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(k1, (rows, c), dtype=jnp.float32).astype(dtype)
    gamma = jax.random.normal(k2, (c,)) * 0.1 + 1.0
    beta = jax.random.normal(k3, (c,)) * 0.1
    return x, gamma, beta


def test_reference_matches_flax_layernorm_relu():
    x, gamma, beta = _data()
    ours = layer_norm_relu_reference(x, gamma, beta)
    ln = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32)
    flax_out = nn.relu(ln.apply({"params": {"scale": gamma, "bias": beta}}, x))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(flax_out), atol=1e-6)


def test_pallas_kernel_parity_interpret_mode(monkeypatch):
    monkeypatch.setenv("ADUNET_FORCE_PALLAS", "1")
    monkeypatch.setenv("ADUNET_PALLAS_INTERPRET", "1")
    x, gamma, beta = _data(rows=96, c=64)  # 96 rows: exercises block trimming
    got = layer_norm_relu(x, gamma, beta)
    want = layer_norm_relu_reference(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pallas_kernel_parity_bf16(monkeypatch):
    monkeypatch.setenv("ADUNET_FORCE_PALLAS", "1")
    monkeypatch.setenv("ADUNET_PALLAS_INTERPRET", "1")
    x, gamma, beta = _data(rows=256, c=128, dtype=jnp.bfloat16)
    got = layer_norm_relu(x, gamma, beta)
    want = layer_norm_relu_reference(x, gamma, beta)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=1e-2
    )


def test_custom_vjp_matches_autodiff():
    x, gamma, beta = _data(rows=64, c=32)

    def fused(x, g, b):
        return jnp.sum(layer_norm_relu(x, g, b) ** 2)

    def unfused(x, g, b):
        return jnp.sum(layer_norm_relu_reference(x, g, b) ** 2)

    g1 = jax.grad(fused, argnums=(0, 1, 2))(x, gamma, beta)
    g2 = jax.grad(unfused, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_convblock_fused_vs_unfused_same_output_and_tree():
    """Fused and unfused LayerNorm paths must share the SAME parameter tree
    (checkpoints interchangeable) and the same outputs."""
    from adunet.nn.blocks import ConvBlock

    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    fused = ConvBlock(8, norm="layer", fused_norm=True)
    unfused = ConvBlock(8, norm="layer", fused_norm=False)
    vf = jax.jit(fused.init)(jax.random.key(1), x)
    vu = jax.jit(unfused.init)(jax.random.key(1), x)
    assert (jax.tree_util.tree_structure(vf["params"])
            == jax.tree_util.tree_structure(vu["params"]))
    # the exact same params run through BOTH paths
    yf = jax.jit(fused.apply)(vf, x)
    yu = jax.jit(unfused.apply)(vf, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu), atol=1e-6)


def test_convblock_rejects_unknown_norm():
    import pytest

    from adunet.nn.blocks import ConvBlock

    x = jax.random.uniform(jax.random.key(0), (1, 8, 8, 3))
    with pytest.raises(ValueError, match="unknown norm"):
        ConvBlock(8, norm="Layer").init(jax.random.key(1), x)
