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
