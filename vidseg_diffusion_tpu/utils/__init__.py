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
