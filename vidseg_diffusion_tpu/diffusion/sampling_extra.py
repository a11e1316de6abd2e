"""Extended sampler family: DPM++ (2S ancestral / 2M), linear multistep,
conditioning-swap editing, and null-text inversion optimization.

Counterparts of the rest of sgm/modules/diffusionmodules/sampling.py:
LinearMultistepSampler (:457-492), DPMPP2SAncestralSampler (:521-575),
DPMPP2MSampler (:578-646), `edit` (:381-415), `null_text_optimization`
(:298-378). None of these sit on the VidSeg hot path (the CLIs use Euler
EDM), but they complete the framework's sampler surface.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidseg_diffusion_tpu.utils import append_dims
from vidseg_diffusion_tpu.diffusion.sampling import (
    DenoiseFn,
    EulerEDMSampler,
    get_ancestral_step,
    to_d,
)


def _sigma_to_t(sigma):
    return -jnp.log(sigma)


def _t_to_sigma(t):
    return jnp.exp(-t)


@dataclasses.dataclass(frozen=True)
class DPMPP2SAncestralSampler(EulerEDMSampler):
    """DPM-Solver++(2S) with ancestral noise (sampling.py:521-575)."""

    eta: float = 1.0

    def step(self, denoise_fn, x, sigma, next_sigma, step_idx, gamma=0.0, rng=None):
        sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, eta=self.eta)
        denoised, aux = denoise_fn(x, sigma, step_idx)

        def euler_branch(x):
            d = to_d(x, sigma[None], denoised)
            return x + (sigma_down - sigma) * d

        def dpmpp_branch(x):
            # clamp like HeunEDMSampler.correction: log(0) in the discarded
            # branch leaks NaN gradients through jnp.where
            sd = jnp.maximum(sigma_down, 1e-14)
            t, t_next = _sigma_to_t(sigma), _sigma_to_t(sd)
            h = t_next - t
            s = t + 0.5 * h
            x2 = (_t_to_sigma(s) / _t_to_sigma(t)) * x - jnp.expm1(-0.5 * h) * denoised
            denoised2, _ = denoise_fn(x2, _t_to_sigma(s), step_idx)
            return (_t_to_sigma(t_next) / _t_to_sigma(t)) * x - jnp.expm1(-h) * denoised2

        x = jnp.where(sigma_down < 1e-14, euler_branch(x), dpmpp_branch(x))
        if rng is not None:
            noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
            x = x + noise * self.s_noise * sigma_up
        return x, aux


@dataclasses.dataclass(frozen=True)
class DPMPP2MSampler(EulerEDMSampler):
    """DPM-Solver++(2M): multistep, carries the previous denoised estimate
    (sampling.py:578-646). The scan carry holds (x, old_denoised, old_h)."""

    def __call__(
        self,
        denoise_fn: DenoiseFn,
        x: jnp.ndarray,
        *,
        num_steps: Optional[int] = None,
        t_start: int = 0,
        t_end: Optional[int] = None,
        post_step_fn=None,
        rng=None,
        prescale: bool = True,
        unroll: int = 1,
    ):
        n = self.num_steps if num_steps is None else num_steps
        sigmas = self.sigmas(n)
        num_sigmas = n + 1
        if t_end is None:
            t_end = num_sigmas - 1
        t_end = min(t_end, num_sigmas - 1)
        if prescale:
            x = self.prescale(x, sigmas)
        idxs = jnp.arange(t_start, t_end)

        def body(carry, per_step):
            x, old_denoised, old_h, have_old = carry
            i, sigma, next_sigma = per_step
            denoised, aux = denoise_fn(x, sigma, i)
            t, t_next = _sigma_to_t(sigma), _sigma_to_t(jnp.maximum(next_sigma, 1e-10))
            h = t_next - t
            r = old_h / h
            denoised_mix = jnp.where(
                have_old,
                (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised,
                denoised,
            )
            x_new = (
                _t_to_sigma(t_next) / _t_to_sigma(t)
            ) * x - jnp.expm1(-h) * denoised_mix
            # final σ=0 step: plain Euler to zero (denoised)
            x_new = jnp.where(next_sigma < 1e-14, denoised, x_new)
            if post_step_fn is not None:
                x_new = post_step_fn(x_new, i)
            return (x_new, denoised, h, jnp.asarray(True)), aux

        init = (x, jnp.zeros_like(x), jnp.asarray(1.0, x.dtype), jnp.asarray(False))
        (x, *_), aux = jax.lax.scan(
            body, init, (idxs, sigmas[idxs], sigmas[idxs + 1]), unroll=unroll
        )
        return x, aux


def linear_multistep_coeff(order: int, sigmas: np.ndarray, i: int, j: int) -> float:
    """∫ Lagrange basis over [σ_i, σ_{i+1}] (sampling_utils.py, scipy quad)."""
    from scipy import integrate

    if order - 1 > i:
        raise ValueError(f"order {order} too high for step {i}")

    def fn(tau):
        prod = 1.0
        for k in range(order):
            if j == k:
                continue
            prod *= (tau - sigmas[i - k]) / (sigmas[i - j] - sigmas[i - k])
        return prod

    return integrate.quad(fn, sigmas[i], sigmas[i + 1], epsrel=1e-4)[0]


@dataclasses.dataclass(frozen=True)
class LinearMultistepSampler(EulerEDMSampler):
    """LMS sampler (sampling.py:457-492). Coefficients are precomputed on
    host from the static σ schedule (the reference calls scipy.quad inside
    its loop); the device loop is a scan over a derivative ring buffer."""

    order: int = 4

    def __call__(
        self,
        denoise_fn: DenoiseFn,
        x: jnp.ndarray,
        *,
        num_steps: Optional[int] = None,
        t_start: int = 0,
        t_end: Optional[int] = None,
        post_step_fn=None,
        rng=None,
        prescale: bool = True,
        unroll: int = 1,
    ):
        n = self.num_steps if num_steps is None else num_steps
        sigmas_j = self.sigmas(n)
        sigmas_np = np.asarray(sigmas_j, dtype=np.float64)
        num_sigmas = n + 1
        if t_end is None:
            t_end = num_sigmas - 1
        t_end = min(t_end, num_sigmas - 1)
        if prescale:
            x = self.prescale(x, sigmas_j)

        steps = list(range(t_start, t_end))
        max_order = self.order
        # coeff table [num_loop_steps, order] (zero-padded below cur_order)
        coeffs = np.zeros((len(steps), max_order), dtype=np.float32)
        for si, i in enumerate(steps):
            # ring-buffer count governs the usable order: at loop step si
            # only si+1 real derivatives exist (min(i+1, ...) paired
            # higher-order coefficients with zero-filled slots at t_start>0)
            cur = min(si + 1, max_order)
            for j in range(cur):
                coeffs[si, j] = linear_multistep_coeff(cur, sigmas_np, i, j)
        coeffs_j = jnp.asarray(coeffs)
        idxs = jnp.arange(t_start, t_end)

        def body(carry, per_step):
            x, ds = carry  # ds: [order, ...] ring of derivatives (newest first)
            si, i, sigma = per_step
            denoised, aux = denoise_fn(x, sigma, i)
            d = to_d(x, sigma[None], denoised)
            ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
            cs = coeffs_j[si]
            upd = jnp.tensordot(cs, ds, axes=(0, 0))
            x_new = x + upd.astype(x.dtype)
            if post_step_fn is not None:
                x_new = post_step_fn(x_new, i)
            return (x_new, ds), aux

        ds0 = jnp.zeros((max_order,) + x.shape, x.dtype)
        (x, _), aux = jax.lax.scan(
            body, (x, ds0),
            (jnp.arange(len(steps)), idxs, sigmas_j[idxs]),
            unroll=unroll,
        )
        return x, aux


def edit(
    sampler: EulerEDMSampler,
    denoise_fn_base: Callable,
    denoise_fn_edit: Callable,
    x: jnp.ndarray,
    edit_start_step: int = 5,
    edit_end_step: int = 24,
    num_steps: Optional[int] = None,
):
    """Conditioning-swap editing (sampling.py:381-415): within
    [edit_start_step, edit_end_step] the edit conditioning drives the
    denoiser. Both branches are traced; a step-indexed select chooses."""

    def denoise_fn(xc, sigma, i):
        base, aux = denoise_fn_base(xc, sigma, i)
        ed, _ = denoise_fn_edit(xc, sigma, i)
        use_edit = (i >= edit_start_step) & (i <= edit_end_step)
        return jnp.where(use_edit, ed, base), aux

    return sampler(denoise_fn, x, num_steps=num_steps)


def null_text_optimization(
    sampler: EulerEDMSampler,
    make_denoise_fn: Callable,  # (uc_crossattn) -> denoise_fn
    latents_inv: jnp.ndarray,   # [num_steps+1, ...] inversion trajectory
    uc_crossattn: jnp.ndarray,
    num_inner_steps: int = 10,
    lr: float = 1e-2,
    num_steps: Optional[int] = None,
):
    """Null-text inversion (sampling.py:298-378): per outer step, optimize
    the unconditional cross-attention embedding so one sampler step from the
    inverted latent reproduces the recorded trajectory. Returns the list of
    optimized uc embeddings (one per step). Uses optax Adam; the reference's
    per-step lr decay 1e-2·(1−i/100) and fixed inner-step count are kept
    (early-exit on ε is dropped — fixed-trip loops are jit-compilable and
    the reference's break is a wall-clock optimization, not semantics)."""
    import optax

    n = sampler.num_steps if num_steps is None else num_steps
    sigmas = sampler.sigmas(n)
    latent_cur = latents_inv[-1]
    uc_list = []

    # ONE compilation for all n outer steps: step data (target, sigma pair,
    # lr) are traced arguments — the previous per-outer-step @jax.jit with
    # closed-over constants recompiled the UNet fwd+bwd graph n times.
    # optax.adam == chain(scale_by_adam, scale(-lr)); keeping lr out of the
    # transform lets the per-step decayed lr ride as a traced scalar.
    tx = optax.scale_by_adam()

    @jax.jit
    def inner(uc, opt_state, latent_cur, target, i, sigma, next_sigma, lr_t):
        def loss_fn(uc):
            dn = make_denoise_fn(uc)
            x_next, _ = sampler.step(dn, latent_cur, sigma, next_sigma, i)
            return jnp.mean((x_next - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(uc)
        updates, opt_state = tx.update(grads, opt_state, uc)
        uc = jax.tree.map(lambda u, g: u - lr_t * g, uc, updates)
        return uc, opt_state, loss

    @jax.jit
    def advance(uc, latent_cur, i, sigma, next_sigma):
        dn = make_denoise_fn(uc)
        return sampler.step(dn, latent_cur, sigma, next_sigma, i)[0]

    for i in range(n):
        target = latents_inv[n - i - 1]
        lr_t = jnp.asarray(lr * (1.0 - i / 100.0), jnp.float32)
        uc = uc_crossattn
        opt_state = tx.init(uc)
        for _ in range(num_inner_steps):
            uc, opt_state, loss = inner(
                uc, opt_state, latent_cur, target, jnp.asarray(i),
                sigmas[i], sigmas[i + 1], lr_t,
            )
        uc_list.append(uc)
        latent_cur = advance(
            uc, latent_cur, jnp.asarray(i), sigmas[i], sigmas[i + 1]
        )
    return uc_list
