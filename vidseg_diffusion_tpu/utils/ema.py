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
    """LambdaWarmUpCosineScheduler semantics (lr_scheduler.py:4-48)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) * step / max(warm_up_steps, 1)
        t = jnp.clip(
            (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1), 0.0, 1.0
        )
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def _multi_cycle(warm_up_steps, f_min, f_max, f_start, cycle_lengths, decay):
    """Shared machinery of the multi-cycle schedulers
    (LambdaWarmUpCosineScheduler2 / LambdaLinearScheduler,
    lr_scheduler.py:51-135): locate the cycle by cumulative length
    (boundary step n == cum_cycles[i] belongs to cycle i-1 — the
    reference's `n <= cl`), warm up linearly from f_start to f_max, then
    decay by `decay(t, f_min, f_max)` over the cycle remainder.

    jnp-traceable (searchsorted + gather) so it jits inside a train step;
    use with base_lr 1.0 like the reference."""
    import numpy as np

    wu = jnp.asarray(warm_up_steps, jnp.float32)
    fmn = jnp.asarray(f_min, jnp.float32)
    fmx = jnp.asarray(f_max, jnp.float32)
    fst = jnp.asarray(f_start, jnp.float32)
    cl = jnp.asarray(cycle_lengths, jnp.float32)
    cum = jnp.asarray(np.cumsum([0] + list(cycle_lengths)), jnp.float32)

    def schedule(step):
        n_glob = jnp.asarray(step, jnp.float32)
        # reference find_in_interval: first i with n <= cum_cycles[i+1]
        cyc = jnp.clip(
            jnp.searchsorted(cum[1:], n_glob, side="left"), 0, cl.shape[0] - 1
        )
        n = n_glob - cum[cyc]
        warm = (fmx[cyc] - fst[cyc]) / wu[cyc] * n + fst[cyc]
        t = jnp.clip((n - wu[cyc]) / (cl[cyc] - wu[cyc]), 0.0, 1.0)
        dec = decay(t, n, fmn[cyc], fmx[cyc], cl[cyc])
        return jnp.where(n < wu[cyc], warm, dec)

    return schedule


def lambda_warmup_cosine2(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    """LambdaWarmUpCosineScheduler2 (lr_scheduler.py:51-111): per-cycle
    linear warmup then half-cosine f_max→f_min."""
    return _multi_cycle(
        warm_up_steps, f_min, f_max, f_start, cycle_lengths,
        lambda t, n, mn, mx, length: mn + 0.5 * (mx - mn) * (1 + jnp.cos(t * jnp.pi)),
    )


def lambda_linear(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    """LambdaLinearScheduler (lr_scheduler.py:113-135): linear decay
    f ∝ (cycle_length - n) / cycle_length — note the reference divides by
    the FULL cycle length (not minus warmup) and does not clamp, quirks
    preserved."""
    return _multi_cycle(
        warm_up_steps, f_min, f_max, f_start, cycle_lengths,
        lambda t, n, mn, mx, length: mn + (mx - mn) * (length - n) / length,
    )
