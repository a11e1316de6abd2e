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


@dataclasses.dataclass(frozen=True)
class EMACodebook:
    """Functional state of EMAVectorQuantizer (quantize.py:302-353
    EmbeddingEMA buffers as an explicit pytree — TPU-native replacement for
    the reference's in-place torch buffer mutation)."""

    weight: jnp.ndarray        # [N, D]
    cluster_size: jnp.ndarray  # [N]
    embed_avg: jnp.ndarray     # [N, D]
    decay: float = 0.99
    eps: float = 1e-5

    @classmethod
    def create(cls, rng: jax.Array, n_embed: int, dim: int, **kw) -> "EMACodebook":
        w = jax.random.normal(rng, (n_embed, dim))
        return cls(weight=w, cluster_size=jnp.zeros((n_embed,)),
                   embed_avg=w.copy(), **kw)


def ema_vector_quantize(
    z: jnp.ndarray,            # [..., D]
    codebook: EMACodebook,
    beta: float = 0.25,
    train: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray], EMACodebook]:
    """EMAVectorQuantizer.forward (quantize.py:355-445): nearest-codebook
    lookup, straight-through gradients, commitment-only loss (beta·MSE), and
    (in training) EMA codebook updates with Laplace-smoothed cluster sizes.
    Returns (z_q, indices, log, new_codebook)."""
    flat = z.reshape(-1, z.shape[-1])
    d2 = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        - 2.0 * flat @ codebook.weight.T
        + jnp.sum(codebook.weight**2, axis=1)[None]
    )
    idx = jnp.argmin(d2, axis=1)
    n_embed = codebook.weight.shape[0]
    onehot = jax.nn.one_hot(idx, n_embed, dtype=flat.dtype)
    avg_probs = jnp.mean(onehot, axis=0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

    new_cb = codebook
    if train:
        d = codebook.decay
        cluster = d * codebook.cluster_size + (1 - d) * jnp.sum(onehot, axis=0)
        embed_avg = d * codebook.embed_avg + (1 - d) * (onehot.T @ flat)
        n = jnp.sum(cluster)
        smoothed = (cluster + codebook.eps) / (n + n_embed * codebook.eps) * n
        weight = embed_avg / smoothed[:, None]
        new_cb = dataclasses.replace(
            codebook, weight=weight, cluster_size=cluster, embed_avg=embed_avg
        )

    zq = codebook.weight[idx].reshape(z.shape)
    loss = beta * jnp.mean((jax.lax.stop_gradient(zq) - z) ** 2)
    zq_st = z + jax.lax.stop_gradient(zq - z)
    log = {"loss/vq": loss, "perplexity": perplexity}
    return zq_st, idx.reshape(z.shape[:-1]), log, new_cb


def gumbel_quantize(
    rng: Optional[jax.Array],
    logits: jnp.ndarray,       # [..., N] (caller projects, quantize.py:95)
    codebook: jnp.ndarray,     # [N, D]
    tau: float = 1.0,
    hard: bool = True,
    kl_weight: float = 5e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """GumbelQuantizer.forward (quantize.py:64-157): gumbel-softmax over
    codebook logits (rng None → deterministic softmax, the eval path), hard
    straight-through selection, and the KL-to-uniform-prior diversity loss.
    Returns (z_q, indices, log)."""
    n_embed = codebook.shape[0]
    if rng is not None:
        u = jax.random.uniform(rng, logits.shape, minval=1e-10, maxval=1.0)
        g = -jnp.log(-jnp.log(u))
        y_soft = jax.nn.softmax((logits + g) / tau, axis=-1)
    else:
        y_soft = jax.nn.softmax(logits / tau, axis=-1)
    idx = jnp.argmax(y_soft, axis=-1)
    if hard:
        y_hard = jax.nn.one_hot(idx, n_embed, dtype=y_soft.dtype)
        y = y_soft + jax.lax.stop_gradient(y_hard - y_soft)
    else:
        y = y_soft
    zq = y @ codebook
    qy = jax.nn.softmax(logits, axis=-1)
    kl = kl_weight * jnp.mean(
        jnp.sum(qy * jnp.log(qy * n_embed + 1e-10), axis=-1)
    )
    return zq, idx, {"loss/vq": kl}
