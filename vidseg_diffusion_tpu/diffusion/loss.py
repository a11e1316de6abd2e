"""Diffusion training loss (the reference's training scaffold, unused on the
VidSeg inference path but part of the framework surface).

Counterparts of sgm/modules/diffusionmodules/loss.py:12-105
(StandardDiffusionLoss, l2/l1), sigma_sampling.py:6-31 (EDMSampling,
DiscreteSampling) and denoiser_weighting.py (eps/v/unit weightings).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from vidseg_diffusion_tpu.utils import append_dims
from vidseg_diffusion_tpu.diffusion.denoiser import Denoiser


@dataclasses.dataclass(frozen=True)
class EDMSigmaSampling:
    """logN(p_mean, p_std) σ sampler (sigma_sampling.py:6-12)."""

    p_mean: float = -1.2
    p_std: float = 1.2

    def __call__(self, rng: jax.Array, n: int) -> jnp.ndarray:
        return jnp.exp(self.p_mean + self.p_std * jax.random.normal(rng, (n,)))


@dataclasses.dataclass(frozen=True)
class DiscreteSigmaSampling:
    """Uniform index into a discretized σ table (sigma_sampling.py:15-31)."""

    sigmas: jnp.ndarray = None  # [num_idx]

    def __call__(self, rng: jax.Array, n: int) -> jnp.ndarray:
        idx = jax.random.randint(rng, (n,), 0, self.sigmas.shape[0])
        return self.sigmas[idx]


def eps_weighting(sigma):
    return sigma**-2.0


def v_weighting(sigma):
    return (sigma**2 + 1.0) / sigma**2.0


def unit_weighting(sigma):
    return jnp.ones_like(sigma)


@dataclasses.dataclass(frozen=True)
class StandardDiffusionLoss:
    """w(σ)·||D(x₀+σε, σ) − x₀||² (loss.py:12-105, l2/l1/lpips types).

    For loss_type="lpips", pass `lpips_fn(pred, target) -> [B]` — typically
    `models.lpips.LPIPS` pre-bound with its params (the reference
    instantiates `LPIPS().eval()` at loss.py:31-32 and applies it without
    the σ weighting, loss.py:101-103; we preserve both behaviors)."""

    denoiser: Denoiser
    sigma_sampler: Callable[[jax.Array, int], jnp.ndarray]
    weighting: Callable = unit_weighting
    loss_type: str = "l2"
    lpips_fn: Optional[Callable] = None

    def __call__(
        self,
        network,
        rng: jax.Array,
        x0: jnp.ndarray,
        cond: Dict[str, jnp.ndarray],
    ) -> jnp.ndarray:
        r_sigma, r_noise = jax.random.split(rng)
        sigma = self.sigma_sampler(r_sigma, x0.shape[0]).astype(x0.dtype)
        noise = jax.random.normal(r_noise, x0.shape, dtype=x0.dtype)
        noised = x0 + noise * append_dims(sigma, x0.ndim)
        pred = self.denoiser(network, noised, sigma, cond)
        w = append_dims(self.weighting(sigma), x0.ndim)
        if self.loss_type == "l2":
            per = jnp.mean((w * (pred - x0) ** 2).reshape(x0.shape[0], -1), axis=1)
        elif self.loss_type == "l1":
            per = jnp.mean((w * jnp.abs(pred - x0)).reshape(x0.shape[0], -1), axis=1)
        elif self.loss_type == "lpips":
            if self.lpips_fn is None:
                raise ValueError("loss_type='lpips' requires lpips_fn")
            # the reference applies LPIPS unweighted (loss.py:101-103)
            per = self.lpips_fn(pred, x0).reshape(-1)
        else:
            raise ValueError(self.loss_type)
        return jnp.mean(per)
