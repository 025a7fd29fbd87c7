"""VGG19 perceptual feature extractor for the 'combined' SR loss.

The reference uses Keras VGG19(include_top=False, weights='imagenet') cut at
block4_conv4 with caffe-style preprocessing
(/root/reference/Super_resolution/code/train_adaptive_unet.py:336-360).

This is a Flax rebuild of that truncated tower (conv stacks 2-2-4-4 with
post-conv ReLU, 2x2 max-pool between blocks, stopping after block4_conv4's
ReLU). ImageNet weights cannot be downloaded in this offline environment;
``load_vgg19_params`` loads them from a local ``.npz`` (keys
``block{i}_conv{j}/kernel|bias``, HWIO layout) when available, otherwise the
extractor runs with seeded random weights — still a valid perceptual
regulariser, but numbers are then not comparable to the reference's
ImageNet-VGG term. The reference's *default* SR loss is charbonnier
(train_adaptive_unet.py:734), so baseline parity does not depend on this.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import freeze

__all__ = ["VGG19Features", "vgg19_preprocess", "load_vgg19_params", "make_perceptual_fn"]

# (block, n_convs, features) for the truncated tower through block4_conv4.
_CFG = [(1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512)]

# Caffe-style BGR means used by keras.applications.vgg19.preprocess_input.
_BGR_MEANS = (103.939, 116.779, 123.68)


def vgg19_preprocess(rgb01: jax.Array) -> jax.Array:
    """[0,1] RGB → caffe BGR: x*255, channel flip, mean subtraction."""
    x = rgb01.astype(jnp.float32) * 255.0
    bgr = x[..., ::-1]
    return bgr - jnp.asarray(_BGR_MEANS, dtype=jnp.float32)


class VGG19Features(nn.Module):
    """VGG19 tower truncated at block4_conv4 (post-ReLU), pools between blocks."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb01: jax.Array) -> jax.Array:
        x = vgg19_preprocess(rgb01).astype(self.dtype)
        for block, n_convs, features in _CFG:
            for conv in range(1, n_convs + 1):
                x = nn.Conv(
                    features,
                    (3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"block{block}_conv{conv}",
                )(x)
                x = nn.relu(x)
                if block == 4 and conv == 4:
                    return x.astype(jnp.float32)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        raise AssertionError("unreachable")


def load_vgg19_params(path: str | Path) -> Dict:
    """Load block{i}_conv{j}/kernel|bias arrays from an .npz into a Flax
    params tree for VGG19Features."""
    data = np.load(str(path))
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for block, n_convs, _ in _CFG:
        for conv in range(1, n_convs + 1):
            name = f"block{block}_conv{conv}"
            params[name] = {
                "kernel": data[f"{name}/kernel"],
                "bias": data[f"{name}/bias"],
            }
            if block == 4 and conv == 4:
                return freeze({"params": params})
    raise AssertionError("unreachable")


def make_perceptual_fn(
    weights_path: str | Path | None = None,
    input_size: int = 256,
    dtype: Any = jnp.float32,
):
    """Build a pure fn rgb01 -> block4_conv4 features, weights frozen."""
    module = VGG19Features(dtype=dtype)
    if weights_path is not None:
        variables = load_vgg19_params(weights_path)
    else:
        variables = module.init(
            jax.random.key(19), jnp.zeros((1, input_size, input_size, 3))
        )

    def perceptual_fn(rgb01: jax.Array) -> jax.Array:
        return module.apply(variables, rgb01)

    return perceptual_fn
