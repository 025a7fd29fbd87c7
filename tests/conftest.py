"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the JAX-idiomatic "fake backend" for exercising multi-chip sharding
without TPU hardware (SURVEY.md §4). Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Keep TF (used only as a parity oracle in tests) off any accelerator.
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
