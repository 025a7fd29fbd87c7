"""Runtime environment setup shared by CLI entry points."""

from __future__ import annotations

import os

__all__ = ["setup_runtime"]


def setup_runtime() -> None:
    """Enable the persistent XLA compilation cache.

    TPU compiles for the deep configs take minutes (and this environment
    routes them through a remote compile service); caching makes reruns and
    sweep steps with repeated shapes near-instant. Opt out with
    ADUNET_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("ADUNET_NO_COMPILE_CACHE") == "1":
        return
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/adunet_xla_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
