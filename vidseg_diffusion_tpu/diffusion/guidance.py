"""Classifier-free-guidance guiders.

Counterparts of sgm/modules/diffusionmodules/guiders.py:24-100. The batch
layout contract is identical to the reference and load-bearing for all VidSeg
modulation index arithmetic: `prepare_inputs` doubles the batch as
**[uc; c] concatenated on axis 0**, and `__call__` splits it back and blends.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from vidseg_diffusion_tpu.utils import append_dims

Cond = Dict[str, jnp.ndarray]

_CONCAT_KEYS = ("vector", "crossattn", "concat")


def _concat_conds(c: Cond, uc: Cond, extra_keys: Tuple[str, ...] = ()) -> Cond:
    out = {}
    keys = _CONCAT_KEYS + tuple(extra_keys)
    for k in c:
        if k in keys:
            out[k] = jnp.concatenate([uc[k], c[k]], axis=0)
        else:
            out[k] = c[k]
    return out


@dataclasses.dataclass(frozen=True)
class VanillaCFG:
    """x_pred = x_u + scale·(x_c − x_u) (guiders.py:24-42)."""

    scale: float

    def prepare_inputs(self, x, s, c: Cond, uc: Cond):
        return (
            jnp.concatenate([x, x], axis=0),
            jnp.concatenate([s, s], axis=0),
            _concat_conds(c, uc),
        )

    def __call__(self, x: jnp.ndarray, sigma) -> jnp.ndarray:
        x_u, x_c = jnp.split(x, 2, axis=0)
        return x_u + self.scale * (x_c - x_u)


@dataclasses.dataclass(frozen=True)
class IdentityGuider:
    """No guidance (guiders.py:45-57)."""

    def prepare_inputs(self, x, s, c: Cond, uc: Cond):
        return x, s, dict(c)

    def __call__(self, x: jnp.ndarray, sigma) -> jnp.ndarray:
        return x


@dataclasses.dataclass(frozen=True)
class LinearPredictionGuider:
    """Per-frame CFG scale linspace(min,max,T) for SVD (guiders.py:60-100).

    x has layout [(b t), ...] with t = num_frames; the scale ramps linearly
    over the frame index.
    """

    max_scale: float
    num_frames: int
    min_scale: float = 1.0
    additional_cond_keys: Tuple[str, ...] = ()

    def prepare_inputs(self, x, s, c: Cond, uc: Cond):
        return (
            jnp.concatenate([x, x], axis=0),
            jnp.concatenate([s, s], axis=0),
            _concat_conds(c, uc, self.additional_cond_keys),
        )

    def __call__(self, x: jnp.ndarray, sigma) -> jnp.ndarray:
        x_u, x_c = jnp.split(x, 2, axis=0)
        t = self.num_frames
        b = x_u.shape[0] // t
        x_u = x_u.reshape((b, t) + x_u.shape[1:])
        x_c = x_c.reshape((b, t) + x_c.shape[1:])
        scale = jnp.linspace(self.min_scale, self.max_scale, t, dtype=x_u.dtype)
        scale = append_dims(scale[None, :], x_u.ndim)
        out = x_u + scale * (x_c - x_u)
        return out.reshape((b * t,) + out.shape[2:])
