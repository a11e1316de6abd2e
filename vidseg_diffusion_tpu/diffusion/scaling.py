"""EDM-style denoiser pre-conditioning scalings.

Counterparts of sgm/modules/diffusionmodules/denoiser_scaling.py:15-59. Each
scaling maps σ → (c_skip, c_out, c_in, c_noise) such that
    D(x, σ) = net(x · c_in, c_noise) · c_out + x · c_skip.
Pure functions of jnp arrays, safe inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

Scales = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class EDMScaling:
    """Karras EDM scaling (denoiser_scaling.py:15-26)."""

    sigma_data: float = 0.5

    def __call__(self, sigma: jnp.ndarray) -> Scales:
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data / (sigma**2 + sd2) ** 0.5
        c_in = 1 / (sigma**2 + sd2) ** 0.5
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise


@dataclasses.dataclass(frozen=True)
class EpsScaling:
    """ε-prediction scaling used by SD 2.1 (denoiser_scaling.py:29-37)."""

    def __call__(self, sigma: jnp.ndarray) -> Scales:
        c_skip = jnp.ones_like(sigma)
        c_out = -sigma
        c_in = 1 / (sigma**2 + 1.0) ** 0.5
        c_noise = sigma
        return c_skip, c_out, c_in, c_noise


@dataclasses.dataclass(frozen=True)
class VScaling:
    """v-prediction scaling (denoiser_scaling.py:40-48)."""

    def __call__(self, sigma: jnp.ndarray) -> Scales:
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma / (sigma**2 + 1.0) ** 0.5
        c_in = 1.0 / (sigma**2 + 1.0) ** 0.5
        c_noise = sigma
        return c_skip, c_out, c_in, c_noise


@dataclasses.dataclass(frozen=True)
class VScalingWithEDMcNoise:
    """v-prediction with EDM c_noise, used by SVD (denoiser_scaling.py:51-59)."""

    def __call__(self, sigma: jnp.ndarray) -> Scales:
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma / (sigma**2 + 1.0) ** 0.5
        c_in = 1.0 / (sigma**2 + 1.0) ** 0.5
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise
