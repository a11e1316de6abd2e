"""EMA parameter tracking and LR schedules (training-only surface).

Counterparts of sgm/modules/ema.py (LitEma :5-86) and sgm/lr_scheduler.py
(warmup-cosine schedulers), functional: EMA state is a params-shaped pytree,
updates are pure, schedules are optax-compatible callables.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.struct

import jax
import jax.numpy as jnp


@flax.struct.dataclass
class EmaState:
    params: Any
    num_updates: jnp.ndarray  # int32 scalar


def ema_init(params) -> EmaState:
    return EmaState(params=jax.tree.map(jnp.asarray, params),
                    num_updates=jnp.asarray(0, jnp.int32))


def ema_update(state: EmaState, params, decay: float = 0.9999,
               use_num_updates: bool = True) -> EmaState:
    """LitEma update: effective decay min(decay, (1+n)/(10+n)) (ema.py:5-50)."""
    n = state.num_updates + 1
    if use_num_updates:
        d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    else:
        d = jnp.asarray(decay)
    new = jax.tree.map(lambda e, p: e - (1.0 - d) * (e - p), state.params, params)
    return EmaState(params=new, num_updates=n)


def lambda_warmup_cosine(
    warm_up_steps: int,
    lr_min: float,
    lr_max: float,
    lr_start: float,
    max_decay_steps: int,
):
    """LambdaWarmUpCosineScheduler semantics (lr_scheduler.py)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) * step / max(warm_up_steps, 1)
        t = jnp.clip(
            (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1), 0.0, 1.0
        )
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule
