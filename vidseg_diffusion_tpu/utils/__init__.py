"""Small shared utilities (functional counterparts of sgm/util.py helpers)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def append_dims(x: jax.Array, target_ndim: int) -> jax.Array:
    """Right-pad `x` with size-1 dims until it has `target_ndim` dims.

    Counterpart of sgm/util.py:append_dims (reference uses it to broadcast
    per-batch sigmas over [b, c, h, w] latents).
    """
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"input has {x.ndim} dims but target_ndim is {target_ndim}")
    return x.reshape(x.shape + (1,) * dims_to_append)


def append_zero(x: jax.Array) -> jax.Array:
    """Append a scalar zero to a 1-D array (σ-schedule termination)."""
    return jnp.concatenate([x, jnp.zeros((1,), dtype=x.dtype)])


def default(val, d):
    return val if val is not None else d


def ensure_backend() -> str:
    """Initialize a usable JAX backend, falling back to CPU when the TPU is
    unavailable or already claimed by another process (axon grants are
    exclusive). VIDSEG_PLATFORM=cpu|tpu forces a platform. Returns the
    backend name."""
    import os

    forced = os.environ.get("VIDSEG_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)
        return jax.default_backend()
    try:
        return jax.default_backend()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
        return jax.default_backend()
