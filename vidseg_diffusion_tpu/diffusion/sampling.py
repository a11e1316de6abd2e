"""EDM samplers as jit/scan-friendly pure functions.

Behavioral counterpart of sgm/modules/diffusionmodules/sampling.py (EDMSampler
/ EulerEDMSampler `__call__` :146-262, `add_noise` :133-144, `inversion`
:264-296, plus the Heun / ancestral / DPM++ / LMS family :417-646), re-designed
for XLA:

- The denoise loop is a `lax.scan` over a static step window
  [t_start, t_end); per-step σ pairs and step indices are scan inputs. No
  data-dependent Python control flow — everything under one jit.
- The reference's three VidSeg hooks become functional arguments:
  * `denoise_fn(x, sigma, step_idx) -> (denoised, aux)` — guidance, CFG
    batching, modulation and injection all live inside this closure; `aux`
    (e.g. harvested attention Q/K, the post-step latent cache) is stacked by
    scan over the step axis, replacing the reference's disk-writing
    `img_callback` (svd_single_video_inference.py:109-149).
  * `post_step_fn(x, step_idx) -> x` — latent blending (sampling.py:229-250)
    reads the cached trajectory from HBM instead of `load_xt` disk loads.
- `prepare_sampling_loop`'s `x *= sqrt(1+σ₀²)` pre-scale (sampling.py:45-59)
  and `add_noise`'s inverse (:133-144) are preserved exactly: they cancel by
  construction, and VidSeg relies on that.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from vidseg_diffusion_tpu.utils import append_dims
from vidseg_diffusion_tpu.diffusion.discretization import Discretization

# denoise_fn(x, sigma_batchless, step_idx) -> (denoised, aux_pytree)
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, object]]
PostStepFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def to_d(x: jnp.ndarray, sigma: jnp.ndarray, denoised: jnp.ndarray) -> jnp.ndarray:
    """ODE derivative (sampling_utils.py:to_d)."""
    return (x - denoised) / append_dims(sigma, x.ndim)


def get_ancestral_step(sigma_from, sigma_to, eta=1.0):
    """Ancestral split of a σ step (sampling_utils.py)."""
    sigma_up = jnp.minimum(
        sigma_to,
        eta * (sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2) ** 0.5,
    )
    sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
    return sigma_down, sigma_up


@dataclasses.dataclass(frozen=True)
class EulerEDMSampler:
    """Euler EDM sampler with s_churn support (sampling.py:92-262, 495-499)."""

    discretization: Discretization
    num_steps: int
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_noise: float = 1.0

    # -- schedule -----------------------------------------------------------

    def sigmas(self, num_steps: Optional[int] = None, flip: bool = False) -> jnp.ndarray:
        n = self.num_steps if num_steps is None else num_steps
        sig = self.discretization(n, do_append_zero=True)
        if flip:
            sig = jnp.flip(sig, 0)
            sig = sig.at[0].add(1e-8)  # avoid σ=0 at loop start (sampling.py:50-51)
        return sig

    def prescale(self, x: jnp.ndarray, sigmas: jnp.ndarray) -> jnp.ndarray:
        """x · sqrt(1+σ₀²) (sampling.py:54)."""
        return x * jnp.sqrt(1.0 + sigmas[0] ** 2.0)

    # -- noising ------------------------------------------------------------

    def add_noise(
        self,
        rng: jax.Array,
        x: jnp.ndarray,
        noise_level: int,
        num_steps: Optional[int] = None,
    ) -> jnp.ndarray:
        """x + σ[noise_level]·ε, then ÷ sqrt(1+σ₀²) (sampling.py:133-144).

        The divide cancels against `prescale` inside the sampling loop; both
        are kept so intermediate values match the reference bit-for-semantics.
        """
        sigmas = self.sigmas(num_steps)
        eps = jax.random.normal(rng, x.shape, dtype=x.dtype) * sigmas[noise_level]
        return (x + eps) / jnp.sqrt(1.0 + sigmas[0] ** 2.0)

    # -- single step --------------------------------------------------------

    def _gamma(self, sigmas: jnp.ndarray, num_sigmas: int) -> jnp.ndarray:
        if self.s_churn <= 0:
            return jnp.zeros_like(sigmas)
        gamma = min(self.s_churn / (num_sigmas - 1), 2**0.5 - 1)
        in_range = (sigmas >= self.s_tmin) & (sigmas <= self.s_tmax)
        return jnp.where(in_range, gamma, 0.0)

    def step(
        self,
        denoise_fn: DenoiseFn,
        x: jnp.ndarray,
        sigma: jnp.ndarray,
        next_sigma: jnp.ndarray,
        step_idx: jnp.ndarray,
        gamma: jnp.ndarray = 0.0,
        rng: Optional[jax.Array] = None,
    ):
        """One Euler step (sampling.py:103-131). σ inputs are scalars."""
        sigma_hat = sigma * (gamma + 1.0)
        if rng is not None and self.s_churn > 0:
            eps = jax.random.normal(rng, x.shape, dtype=x.dtype) * self.s_noise
            churn = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
            x = x + eps * churn
        denoised, aux = denoise_fn(x, sigma_hat, step_idx)
        d = to_d(x, sigma_hat[None], denoised)
        x = x + (next_sigma - sigma_hat) * d
        return x, aux

    # -- full loop ----------------------------------------------------------

    def __call__(
        self,
        denoise_fn: DenoiseFn,
        x: jnp.ndarray,
        *,
        num_steps: Optional[int] = None,
        t_start: int = 0,
        t_end: Optional[int] = None,
        post_step_fn: Optional[PostStepFn] = None,
        rng: Optional[jax.Array] = None,
        prescale: bool = True,
        unroll: int = 1,
    ):
        """Run steps i = t_start .. t_end-1 (default t_end = num_steps).

        Returns (x_final, aux_stacked) where aux_stacked is denoise_fn's aux
        pytree with a leading [t_end - t_start] step axis (scan-stacked).
        """
        n = self.num_steps if num_steps is None else num_steps
        sigmas = self.sigmas(n)
        num_sigmas = n + 1
        if t_end is None:
            t_end = num_sigmas - 1
        t_end = min(t_end, num_sigmas - 1)
        assert 0 <= t_start < t_end, (t_start, t_end)

        if prescale:
            x = self.prescale(x, sigmas)

        idxs = jnp.arange(t_start, t_end)
        gammas = self._gamma(sigmas, num_sigmas)[idxs]
        sig_pairs = (sigmas[idxs], sigmas[idxs + 1])
        if rng is not None:
            rngs = jax.random.split(rng, t_end - t_start)
        else:
            rngs = jnp.zeros((t_end - t_start, 2), dtype=jnp.uint32)

        def body(carry, per_step):
            x = carry
            i, sigma, next_sigma, gamma, step_rng = per_step
            x, aux = self.step(
                denoise_fn, x, sigma, next_sigma, i, gamma,
                rng=step_rng if rng is not None else None,
            )
            if post_step_fn is not None:
                x = post_step_fn(x, i)
            return x, aux

        x, aux = jax.lax.scan(
            body, x, (idxs, sig_pairs[0], sig_pairs[1], gammas, rngs), unroll=unroll
        )
        return x, aux

    # -- inversion ----------------------------------------------------------

    def inversion(
        self,
        denoise_fn: DenoiseFn,
        x: jnp.ndarray,
        *,
        num_steps: Optional[int] = None,
        unroll: int = 1,
    ):
        """DDIM-style inversion with flipped σ schedule (sampling.py:264-296).

        Returns (x_T, latents [num_steps+1, ...]) — the trajectory including
        the (pre-scaled) start latent, matching the reference's latents_list.
        """
        n = self.num_steps if num_steps is None else num_steps
        sigmas = self.sigmas(n, flip=True)
        num_sigmas = n + 1

        x = x * jnp.sqrt(1.0 + sigmas[0] ** 2.0)
        x0 = x

        idxs = jnp.arange(0, num_sigmas - 1)

        def body(carry, per_step):
            x = carry
            i, sigma, next_sigma = per_step
            x, _ = self.step(denoise_fn, x, sigma, next_sigma, i)
            return x, x

        x, traj = jax.lax.scan(
            body, x, (idxs, sigmas[idxs], sigmas[idxs + 1]), unroll=unroll
        )
        latents = jnp.concatenate([x0[None], traj], axis=0)
        x = x / jnp.sqrt(1.0 + sigmas[-1] ** 2.0)
        return x, latents


@dataclasses.dataclass(frozen=True)
class HeunEDMSampler(EulerEDMSampler):
    """Heun 2nd-order correction (sampling.py:502-518)."""

    def step(self, denoise_fn, x, sigma, next_sigma, step_idx, gamma=0.0, rng=None):
        sigma_hat = sigma * (gamma + 1.0)
        if rng is not None and self.s_churn > 0:
            eps = jax.random.normal(rng, x.shape, dtype=x.dtype) * self.s_noise
            churn = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
            x = x + eps * churn
        denoised, aux = denoise_fn(x, sigma_hat, step_idx)
        d = to_d(x, sigma_hat[None], denoised)
        dt = next_sigma - sigma_hat
        euler = x + dt * d

        def correction(euler):
            # clamp: this branch is DISCARDED at next_sigma==0, but where()
            # still evaluates it and passes its NaN cotangents to jax.grad
            # (null-text optimization differentiates through step)
            ns = jnp.maximum(next_sigma, 1e-14)
            denoised2, _ = denoise_fn(euler, ns, step_idx)
            d2 = to_d(euler, ns[None], denoised2)
            return x + dt * 0.5 * (d + d2)

        # Euler only when next σ ≈ 0 (sampling.py:511-517)
        x = jnp.where(next_sigma < 1e-14, euler, correction(euler))
        return x, aux


@dataclasses.dataclass(frozen=True)
class EulerAncestralSampler(EulerEDMSampler):
    """Euler ancestral (sampling.py:417-454, 521-528). Requires rng."""

    eta: float = 1.0

    def step(self, denoise_fn, x, sigma, next_sigma, step_idx, gamma=0.0, rng=None):
        sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, eta=self.eta)
        denoised, aux = denoise_fn(x, sigma, step_idx)
        d = to_d(x, sigma[None], denoised)
        x = x + (sigma_down - sigma) * d
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype) if rng is not None else 0.0
        x = x + noise * self.s_noise * sigma_up
        return x, aux
