"""Backend-selection helper for the CLI apps.

In environments with an ambient accelerator plugin the ``JAX_PLATFORMS``
env var alone can be overridden at backend-registration time; the
``jax.config.update("jax_platforms", ...)`` call is authoritative (the
tests/conftest.py finding).  Every CLI app calls
:func:`honor_platform_request` first so ``JAX_PLATFORMS=cpu python -m
hypelcnn_tpu.apps...`` behaves the way users (and orchestration scripts
like scripts/soak_round5.py) expect.

Must run before any jax backend initialization in the process.
"""

from __future__ import annotations

import os


def honor_platform_request() -> None:
    requested = os.environ.get("JAX_PLATFORMS")
    if requested:
        import jax

        jax.config.update("jax_platforms", requested)
