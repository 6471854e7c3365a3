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
