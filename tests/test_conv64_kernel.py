"""Pallas tap-paired implicit-GEMM conv (adunet/kernels/conv64.py).

Runs in interpret mode on the CPU mesh; on TPU the same code compiles via
Mosaic. Forward is checked against lax.conv_general_dilated and the custom
VJP against XLA autodiff gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from adunet.kernels.conv64 import conv3x3_same, conv3x3_same_pallas, supported


def _ref_conv(x, w, b):
    out = lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out + b


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 128, 64)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 64, 64)) * 0.05).astype(np.float32))
    b = jnp.asarray((rng.normal(size=(64,)) * 0.1).astype(np.float32))
    return x, w, b


def test_supported_predicate():
    assert supported((2, 16, 128, 64), (3, 3, 64, 64))
    assert not supported((2, 16, 128, 32), (3, 3, 32, 32))  # C != 64
    assert not supported((2, 16, 100, 64), (3, 3, 64, 64))  # W % 128
    assert not supported((2, 10, 128, 64), (3, 3, 64, 64))  # H % 8
    assert not supported((2, 16, 128, 64), (5, 5, 64, 64))  # kernel size


def test_forward_matches_xla(data):
    x, w, b = data
    ref = np.asarray(_ref_conv(x, w, b))
    got = np.asarray(conv3x3_same_pallas(x, w, b), np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_forward_edge_rows_and_cols(data):
    """SAME zero-padding at the image border is the halo-handling risk."""
    x, w, b = data
    ref = np.asarray(_ref_conv(x, w, b))
    got = np.asarray(conv3x3_same_pallas(x, w, b), np.float32)
    np.testing.assert_allclose(got[:, 0, :, :], ref[:, 0, :, :], atol=1e-5)
    np.testing.assert_allclose(got[:, -1, :, :], ref[:, -1, :, :], atol=1e-5)
    np.testing.assert_allclose(got[:, :, 0, :], ref[:, :, 0, :], atol=1e-5)
    np.testing.assert_allclose(got[:, :, -1, :], ref[:, :, -1, :], atol=1e-5)


def test_custom_vjp_matches_xla_grads(data):
    x, w, b = data

    def loss_pallas(x, w, b):
        return jnp.sum(jnp.sin(conv3x3_same(x, w, b)))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.sin(_ref_conv(x, w, b)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for name, a, r in zip(("dx", "dw", "db"), gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-3,
                                   err_msg=f"{name} mismatch")


def test_unsupported_shapes_fall_back(data):
    _, w, b = data
    rng = np.random.default_rng(1)
    x32 = jnp.asarray(rng.normal(size=(1, 16, 128, 32)).astype(np.float32))
    w32 = jnp.asarray((rng.normal(size=(3, 3, 32, 32)) * 0.05).astype(np.float32))
    b32 = jnp.zeros((32,), jnp.float32)
    got = np.asarray(conv3x3_same(x32, w32, b32))
    ref = np.asarray(_ref_conv(x32, w32, b32))
    np.testing.assert_allclose(got, ref, atol=1e-5)
