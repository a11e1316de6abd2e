"""First-stage latent regularizers.

Counterparts of sgm/modules/autoencoding/regularizers/__init__.py
(DiagonalGaussianRegularizer :13-31), distributions/distributions.py
(DiagonalGaussianDistribution :24-102) and quantize.py (VectorQuantizer,
:17-487, training-only in the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiagonalGaussian:
    """Posterior N(mean, diag(var)) from concatenated moments [..., 2z]."""

    mean: jnp.ndarray
    logvar: jnp.ndarray

    @classmethod
    def from_moments(cls, moments: jnp.ndarray) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return cls(mean=mean, logvar=jnp.clip(logvar, -30.0, 20.0))

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        """KL to N(0, I), summed over non-batch dims (distributions.py:60-82)."""
        var = jnp.exp(self.logvar)
        per = 0.5 * (self.mean**2 + var - 1.0 - self.logvar)
        return jnp.sum(per.reshape(per.shape[0], -1), axis=1)


def diagonal_gaussian_regularizer(
    moments: jnp.ndarray, rng: Optional[jax.Array] = None, sample: bool = True
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """(z, log) like DiagonalGaussianRegularizer.forward (:21-31)."""
    post = DiagonalGaussian.from_moments(moments)
    z = post.sample(rng) if (sample and rng is not None) else post.mode()
    return z, {"kl_loss": jnp.mean(post.kl())}


def vector_quantize(
    z: jnp.ndarray,           # [..., D]
    codebook: jnp.ndarray,    # [N, D]
    beta: float = 0.25,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Nearest-codebook quantization with straight-through gradients and the
    standard commitment loss (quantize.py VectorQuantizer semantics).
    Returns (z_q, indices, log)."""
    flat = z.reshape(-1, z.shape[-1])
    d2 = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        - 2.0 * flat @ codebook.T
        + jnp.sum(codebook**2, axis=1)[None]
    )
    idx = jnp.argmin(d2, axis=1)
    zq = codebook[idx].reshape(z.shape)
    commit = jnp.mean((jax.lax.stop_gradient(zq) - z) ** 2)
    embed = jnp.mean((zq - jax.lax.stop_gradient(z)) ** 2)
    loss = beta * commit + embed
    zq_st = z + jax.lax.stop_gradient(zq - z)  # straight-through
    return zq_st, idx.reshape(z.shape[:-1]), {"vq_loss": loss}
