"""Runtime environment setup shared by CLI entry points."""

from __future__ import annotations

import os

__all__ = ["setup_runtime", "host_fingerprint", "honor_env_platforms", "first_contact_watchdog"]


def honor_env_platforms() -> None:
    """Re-apply the JAX_PLATFORMS env var over the image's sitecustomize.

    The image force-registers the remote-TPU "axon" plugin and sets
    ``jax_platforms='axon,cpu'`` at interpreter startup, overriding the env
    var. Calling this before backend init restores the user's explicit
    choice (``JAX_PLATFORMS=cpu`` really runs on CPU); no-op afterwards."""
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        import jax

        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass


def first_contact_watchdog(limit_s: float = 900.0, extra_fields: dict | None = None):
    """Turn a wedged PJRT device claim into a bounded, diagnosable failure.

    Observed failure mode: the remote-TPU tunnel holding a stale grant
    blocks PJRT client init inside ``make_c_api_client`` forever, with no
    output. Arm this BEFORE the first device op; it prints one JSON error
    line (merged over ``extra_fields``) and ``os._exit(17)``s if first
    contact doesn't complete within ``limit_s``. Returns a zero-arg
    ``disarm`` callable — call it right after the first tiny op finishes
    (healthy first contact is seconds)."""
    import json
    import threading

    contact = threading.Event()

    def _watch() -> None:
        if not contact.wait(limit_s):
            payload = dict(extra_fields or {})
            payload["error"] = (
                f"device claim/first op did not complete within {limit_s:.0f}s "
                "(backend init hang — see NOTES_ROUND3.md tunnel-outage entry)"
            )
            print(json.dumps(payload), flush=True)
            os._exit(17)

    threading.Thread(target=_watch, daemon=True).start()
    return contact.set


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

    honor_env_platforms()
    env_platforms = os.environ.get("JAX_PLATFORMS")

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
