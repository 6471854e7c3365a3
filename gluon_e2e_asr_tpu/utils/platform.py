"""Platform selection helper.

This image's experimental 'axon' TPU plugin ignores the JAX_PLATFORMS
environment variable; jax.config.update honors it. CLI entry points call
this before touching devices so JAX_PLATFORMS=cpu works as documented.
"""

from __future__ import annotations

import os


def configure_from_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS", "").strip()
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (verified working through this
    image's axon compile service: 10.6 s -> 0.3 s across processes).
    First compiles of each entry point are 60-120 s here, so CLIs enable
    this by default; override the location with JAX_COMPILATION_CACHE_DIR."""
    if os.environ.get("JAX_ENABLE_COMPILATION_CACHE", "").lower() in (
        "false", "0", "no",
    ):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "gluon_e2e_asr_tpu", "jax_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def warm_device_transfer() -> None:
    """Initialize the device->host transfer path early.

    Measured on this image's axon TPU tunnel: the FIRST host fetch of a
    process is slow to initialize, and if it is deferred until after
    large XLA compilations it can take minutes (156 s observed) instead
    of ~20 s at startup; every later fetch is then ~30 ms. CLI entry
    points call this once right after device discovery so decode
    latency / metrics fetches measure steady-state transfer time.
    """
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        np.asarray(jnp.zeros((8, 128)))
    except Exception:
        pass
