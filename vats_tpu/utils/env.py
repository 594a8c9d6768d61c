"""Runtime environment helpers."""

from __future__ import annotations

import os


def maybe_force_cpu() -> None:
    """Honor VATS_FORCE_CPU=1 by switching the JAX backend to CPU.

    This container's sitecustomize imports jax at interpreter start and pins
    JAX_PLATFORMS to the TPU plugin, so the env var alone is ignored; the
    config update below wins as long as no computation has run yet.
    """
    if os.environ.get("VATS_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
