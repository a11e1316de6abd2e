"""Denoiser pre-conditioning wrappers.

Counterparts of sgm/modules/diffusionmodules/denoiser.py:11-83, functional:
a Denoiser takes a `network` callable `(x_scaled, c_noise, cond, **extra) ->
prediction` (the UNet apply closed over params) and applies the EDM
pre-conditioning `out = net(x·c_in, c_noise)·c_out + x·c_skip`.

The VidSeg modulate/inject state does NOT thread through here as a dict of
Python objects (the reference's `modulate_params` plumbing, denoiser.py:23-46);
in this framework it rides inside `cond`/`extra` as traced arrays consumed by
the UNet — the denoiser stays pure math.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax.numpy as jnp

from vidseg_diffusion_tpu.utils import append_dims
from vidseg_diffusion_tpu.diffusion.discretization import Discretization

Network = Callable[..., jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class Denoiser:
    """Continuous-σ denoiser (denoiser.py:11-46)."""

    scaling: Callable  # σ -> (c_skip, c_out, c_in, c_noise)

    def possibly_quantize_sigma(self, sigma: jnp.ndarray) -> jnp.ndarray:
        return sigma

    def possibly_quantize_c_noise(self, c_noise: jnp.ndarray) -> jnp.ndarray:
        return c_noise

    def __call__(
        self,
        network: Network,
        x: jnp.ndarray,
        sigma: jnp.ndarray,
        cond: Dict[str, jnp.ndarray],
        **extra,
    ) -> jnp.ndarray:
        sigma = self.possibly_quantize_sigma(sigma)
        sigma_shape = sigma.shape
        sigma_b = append_dims(sigma, x.ndim)
        c_skip, c_out, c_in, c_noise = self.scaling(sigma_b)
        c_noise = self.possibly_quantize_c_noise(c_noise.reshape(sigma_shape))
        return network(x * c_in, c_noise, cond, **extra) * c_out + x * c_skip


@dataclasses.dataclass(frozen=True)
class DiscreteDenoiser(Denoiser):
    """σ quantized to a fixed table; c_noise becomes the table index — the SD
    2.1 path (denoiser.py:49-83 with LegacyDDPMDiscretization)."""

    discretization: Discretization = None
    num_idx: int = 1000
    do_append_zero: bool = False
    quantize_c_noise: bool = True
    flip: bool = True

    @property
    def sigmas(self) -> jnp.ndarray:
        return self.discretization(self.num_idx, do_append_zero=self.do_append_zero, flip=self.flip)

    def sigma_to_idx(self, sigma: jnp.ndarray) -> jnp.ndarray:
        dists = sigma - self.sigmas[(slice(None),) + (None,) * sigma.ndim]
        return jnp.argmin(jnp.abs(dists), axis=0).reshape(sigma.shape)

    def idx_to_sigma(self, idx: jnp.ndarray) -> jnp.ndarray:
        return self.sigmas[idx]

    def possibly_quantize_sigma(self, sigma: jnp.ndarray) -> jnp.ndarray:
        return self.idx_to_sigma(self.sigma_to_idx(sigma))

    def possibly_quantize_c_noise(self, c_noise: jnp.ndarray) -> jnp.ndarray:
        if self.quantize_c_noise:
            return self.sigma_to_idx(c_noise)
        return c_noise
