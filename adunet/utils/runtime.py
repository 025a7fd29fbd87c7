"""Runtime environment setup shared by CLI entry points."""

from __future__ import annotations

import os

__all__ = ["setup_runtime", "host_fingerprint"]


def host_fingerprint() -> str:
    """Short stable id of this host's CPU feature set (for cache dirs)."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    basis = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                basis = platform.machine()
    except OSError:
        basis = platform.machine()
    return hashlib.sha1(basis.encode()).hexdigest()[:10]


def setup_runtime() -> None:
    """Enable the persistent XLA compilation cache.

    TPU compiles for the deep configs take minutes (and this environment
    routes them through a remote compile service); caching makes reruns and
    sweep steps with repeated shapes near-instant. Opt out with
    ADUNET_NO_COMPILE_CACHE=1.
    """
    # Debugging hook: `kill -USR1 <pid>` dumps every thread's Python stack
    # to stderr without disturbing the process — the only way to see where a
    # long-running training job sits when remote compiles/transfers stall.
    try:
        import faulthandler
        import signal

        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except Exception:
        pass

    # The image's sitecustomize force-registers the remote-TPU plugin and
    # sets jax_platforms='axon,cpu' at interpreter startup, overriding the
    # JAX_PLATFORMS env var. Re-apply the user's explicit choice here (before
    # backend init) so `JAX_PLATFORMS=cpu python bench.py` really runs on CPU.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        import jax

        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

    if os.environ.get("ADUNET_NO_COMPILE_CACHE") == "1":
        return
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/adunet_xla_cache")
    )
    if env_platforms and "cpu" in env_platforms.split(","):
        # XLA:CPU cache entries embed the compiling host's AVX/AMX feature
        # set but the cache KEY does not — an entry written on one machine
        # loads on another with only a may-SIGILL warning. Session hosts
        # vary, so CPU runs get a per-host-fingerprint cache dir.
        cache_dir = f"{cache_dir}_{host_fingerprint()}"
    # This image's sitecustomize imports jax at interpreter startup, so the
    # env vars are read before any user code runs — set the config directly.
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
