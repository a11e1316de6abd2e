"""LPIPS perceptual loss + PatchGAN discriminator (autoencoder training).

Counterparts of sgm/modules/autoencoding/lpips/loss/lpips.py (VGG16 feature
LPIPS :147) and losses/discriminator_loss.py (GeneralLPIPSWithDiscriminator
:306 with the NLayerDiscriminator and hinge/vanilla losses). Training-only —
never touched by the VidSeg inference path. LPIPS linear heads + VGG weights
load from the torch checkpoint files the reference uses (`vgg.pth` /
`vgg_lpips` taming weights) via the structural converter; without weights
the modules run with random init (architecture/shape complete)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")
# LPIPS taps: outputs of relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_TAP_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])


class VGG16Features(nn.Module):
    """VGG16 conv trunk emitting the five LPIPS tap activations."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        taps = []
        conv_i = 0
        stage_convs = 0
        stage = 1
        for c in _VGG16_CFG:
            if c == "M":
                taps.append(x)
                x = nn.max_pool(x, (2, 2), (2, 2))
                stage += 1
                stage_convs = 0
            else:
                x = nn.Conv(c, (3, 3), dtype=self.dtype, name=f"conv_{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
                stage_convs += 1
        return tuple(taps)


def _normalize_tensor(x, eps=1e-10):
    return x / jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + eps)


class LPIPS(nn.Module):
    """Learned perceptual distance: unit-normalized VGG feature diffs through
    1x1 linear heads, spatially averaged and summed over taps."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """x, y: [B, H, W, 3] in [-1, 1]. Returns [B] distances."""
        vgg = VGG16Features(dtype=self.dtype, name="vgg")

        def scale(t):
            return (t - _SHIFT) / _SCALE

        fx = vgg(scale(x))
        fy = vgg(scale(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
            w = nn.Conv(
                1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin_{i}"
            )(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (discriminator_loss.py's actnorm-free config)."""

    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), dtype=self.dtype, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        mult = 1
        for i in range(1, self.n_layers + 1):
            mult = min(2**i, 8)
            stride = (2, 2) if i < self.n_layers else (1, 1)
            h = nn.Conv(
                self.ndf * mult, (4, 4), strides=stride, use_bias=False,
                dtype=self.dtype, name=f"conv{i}",
            )(h)
            h = nn.GroupNorm(
                num_groups=None, group_size=1, name=f"norm{i}"
            )(h)  # instance-norm-like
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), dtype=self.dtype, name="conv_out")(h)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real)) + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(nn.softplus(-logits_real)) + jnp.mean(nn.softplus(logits_fake))
    )


def generator_adv_loss(logits_fake):
    return -jnp.mean(logits_fake)


@dataclasses.dataclass(frozen=True)
class AutoencoderLossConfig:
    """GeneralLPIPSWithDiscriminator knobs (discriminator_loss.py:306)."""

    kl_weight: float = 1e-6
    perceptual_weight: float = 1.0
    disc_weight: float = 0.5
    disc_start: int = 50001
    disc_loss: str = "hinge"


def autoencoder_reconstruction_loss(
    lpips_apply,  # (x, y) -> [B] or None
    x: jax.Array,
    recon: jax.Array,
    kl: jax.Array,
    cfg: AutoencoderLossConfig,
):
    rec = jnp.abs(x - recon)
    loss = jnp.mean(rec)
    logs = {"rec_loss": loss}
    if lpips_apply is not None and cfg.perceptual_weight > 0:
        p = jnp.mean(lpips_apply(x, recon))
        loss = loss + cfg.perceptual_weight * p
        logs["p_loss"] = p
    loss = loss + cfg.kl_weight * jnp.mean(kl)
    logs["kl_loss"] = jnp.mean(kl)
    logs["total"] = loss
    return loss, logs
