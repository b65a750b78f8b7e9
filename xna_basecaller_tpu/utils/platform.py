"""Backend detection: choose Pallas TPU kernels vs pure-JAX fallbacks."""

from __future__ import annotations

import functools

import jax


@functools.cache
def is_tpu() -> bool:
    """True when the default backend is a TPU (incl. tunneled 'axon')."""
    try:
        if jax.default_backend() in ("tpu", "axon"):
            return True
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
