"""Noise-level (σ) discretizations.

Behavioral counterparts of the reference's
sgm/modules/diffusionmodules/discretizer.py:28-70 (EDMDiscretization,
LegacyDDPMDiscretization), re-expressed as pure functions returning jnp
arrays. Schedules are tiny 1-D arrays computed once per pipeline setup —
float64-sensitive pieces (the DDPM β cumprod) are done in numpy float64 to
match the reference's `torch.linspace(..., dtype=torch.float64)**2` exactly,
then cast to float32.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from vidseg_diffusion_tpu.utils import append_zero


def generate_roughly_equally_spaced_steps(num_substeps: int, max_step: int) -> np.ndarray:
    """Sub-sample `num_substeps` indices out of [0, max_step) (discretizer.py:11-14)."""
    return np.linspace(max_step - 1, 0, num_substeps, endpoint=False).astype(int)[::-1]


@dataclasses.dataclass(frozen=True)
class Discretization:
    def __call__(self, n: int, do_append_zero: bool = True, flip: bool = False) -> jnp.ndarray:
        sigmas = self.get_sigmas(n)
        if do_append_zero:
            sigmas = append_zero(sigmas)
        return sigmas if not flip else jnp.flip(sigmas, 0)

    def get_sigmas(self, n: int) -> jnp.ndarray:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class EDMDiscretization(Discretization):
    """Karras ρ-ramp σ schedule (discretizer.py:28-40). SVD uses σ_max=700."""

    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0

    def get_sigmas(self, n: int) -> jnp.ndarray:
        ramp = np.linspace(0.0, 1.0, n)
        min_inv_rho = self.sigma_min ** (1.0 / self.rho)
        max_inv_rho = self.sigma_max ** (1.0 / self.rho)
        sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** self.rho
        return jnp.asarray(sigmas, dtype=jnp.float32)


def make_linear_betas(n_timestep: int, linear_start: float, linear_end: float) -> np.ndarray:
    """'linear' β schedule: linspace in sqrt-space then squared
    (diffusionmodules/util.py:22-35), float64 like the reference."""
    return (
        np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
    )


@dataclasses.dataclass(frozen=True)
class LegacyDDPMDiscretization(Discretization):
    """1000-step DDPM β schedule converted to σ (discretizer.py:43-70). SD 2.1."""

    linear_start: float = 0.00085
    linear_end: float = 0.0120
    num_timesteps: int = 1000

    @property
    def alphas_cumprod(self) -> np.ndarray:
        betas = make_linear_betas(self.num_timesteps, self.linear_start, self.linear_end)
        return np.cumprod(1.0 - betas, axis=0)

    def get_sigmas(self, n: int) -> jnp.ndarray:
        if n < self.num_timesteps:
            timesteps = generate_roughly_equally_spaced_steps(n, self.num_timesteps)
            alphas_cumprod = self.alphas_cumprod[timesteps]
        elif n == self.num_timesteps:
            alphas_cumprod = self.alphas_cumprod
        else:
            raise ValueError(f"n={n} exceeds num_timesteps={self.num_timesteps}")
        sigmas = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
        # descending σ (reference flips: discretizer.py:70)
        return jnp.asarray(sigmas[::-1].copy().astype(np.float32))
