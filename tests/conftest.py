"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the JAX-idiomatic "fake backend" for exercising multi-chip sharding
without TPU hardware (SURVEY.md §4). Must run before jax is imported anywhere.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel), which would run every test op over the network.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Keep TF (used only as a parity oracle in tests) off any accelerator.
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# Initialise the JAX CPU backend BEFORE any test module imports TensorFlow:
# jax-import → tf-import → jax-backend-init deadlocks in this image (thread
# pools collide); jax-init → tf-import → jax-use is fine.
import jax  # noqa: E402

# Persistent compile cache cuts repeat-run times substantially. The image's
# sitecustomize imports jax before env vars can bind, so set config directly.
# Keyed by host CPU fingerprint: XLA:CPU AOT entries embed the compiling
# host's vector-feature set but the cache key does not, and session hosts
# vary — a foreign entry loads with only a may-SIGILL warning.
from adunet.utils.runtime import host_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", f"/root/.cache/jax_test_cache_{host_fingerprint()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

# The image's sitecustomize registers the 'axon' remote-TPU plugin and calls
# jax.config.update("jax_platforms", "axon,cpu"), which overrides the
# JAX_PLATFORMS env var — every op would silently run over the TPU tunnel
# (with ~2-minute remote compiles). Reset it before any backend initialises.
jax.config.update("jax_platforms", "cpu")
jax.devices()



import pytest  # noqa: E402


@pytest.fixture
def perturb_params():
    """Break identity-start before an equivalence test.

    The SR model's residual head is zero-initialised, so on a fresh init the
    output is exactly clip(input) and every gradient upstream of the head is
    exactly zero — output- or gradient-equivalence assertions then compare
    zeros and pass vacuously. Perturbing every leaf makes the whole network
    load-bearing, as a trained checkpoint would be.
    """

    def _perturb(params, scale=0.02, seed=7):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.key(seed), len(leaves))
        leaves = [
            l + scale * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)
        ]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return _perturb
