"""Auxiliary conditioner encoders (flax / functional).

Counterparts of the reference's remaining embedder family
(sgm/modules/encoders/modules.py), none of which is used by a shipped
VidSeg config (SURVEY §2.4) — implemented for complete conditioner parity:

- IdentityEncoder          (modules.py:207-212)
- ClassEmbedder            (modules.py:215-234) + ucg class semantics
- SpatialRescaler          (modules.py:757-815)
- LowScaleEncoder          (modules.py:818-911) — noise-augmented low-res
  latent conditioning for upscaler-style models
- FrozenCLIPT5Encoder      (modules.py:729-754) — CLIP ⊕ T5 text pair

Layouts are TPU-native NHWC ([b, h, w, c]; video [b, t, h, w, c]) — the
reference's NCHW rearranges disappear."""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vidseg_diffusion_tpu.diffusion.discretization import make_linear_betas


def identity_encoder(x: jax.Array) -> jax.Array:
    """IdentityEncoder (modules.py:207-212)."""
    return x


class ClassEmbedder(nn.Module):
    """Label → embedding (modules.py:215-234). Class ``n_classes`` is the
    reserved unconditional-guidance class."""

    embed_dim: int
    n_classes: int = 1000
    add_sequence_dim: bool = False

    @nn.compact
    def __call__(self, c: jax.Array) -> jax.Array:
        # +1 slot: the reference trains the ucg class as id n_classes-1 is
        # "one extra class for ucg" in its comment but indexes with
        # n_classes-1 directly — same table size
        emb = nn.Embed(self.n_classes, self.embed_dim, name="embedding")(
            c.astype(jnp.int32)
        )
        if self.add_sequence_dim:
            emb = emb[:, None, :]
        return emb

    def get_unconditional_class(self, bs: int) -> jax.Array:
        return jnp.full((bs,), self.n_classes - 1, jnp.int32)


_RESIZE_METHOD = {
    "nearest": "nearest",
    "linear": "linear",
    "bilinear": "linear",
    "trilinear": "linear",
    "bicubic": "cubic",
    "area": "linear",  # jax.image has no 'area'; linear is the down-scale analogue
}


class SpatialRescaler(nn.Module):
    """n-stage spatial rescale + optional channel remap
    (modules.py:757-815). NHWC: x [b, h, w, c]; wrap_video accepts
    [b, t, h, w, c] and rescales per frame."""

    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    out_channels: Optional[int] = None
    bias: bool = False
    wrap_video: bool = False
    kernel_size: int = 1
    remap_output: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.method in _RESIZE_METHOD, self.method
        video = self.wrap_video and x.ndim == 5
        if video:
            b, t = x.shape[:2]
            x = x.reshape((b * t,) + x.shape[2:])
        for _ in range(self.n_stages):
            h = int(x.shape[1] * self.multiplier)
            w = int(x.shape[2] * self.multiplier)
            # antialias=False: torch F.interpolate point-samples on
            # downscale (modules.py:782), jax antialiases by default
            x = jax.image.resize(
                x, (x.shape[0], h, w, x.shape[3]), _RESIZE_METHOD[self.method],
                antialias=False,
            )
        if self.remap_output or self.out_channels is not None:
            x = nn.Conv(
                self.out_channels,
                (self.kernel_size, self.kernel_size),
                padding="SAME",
                use_bias=self.bias,
                name="channel_mapper",
            )(x)
        if video:
            x = x.reshape((b, t) + x.shape[1:])
        return x


@dataclasses.dataclass(frozen=True)
class LowScaleEncoder:
    """Noise-augmented low-resolution latent conditioning
    (modules.py:818-911): VAE-encode, scale, q-sample at a random noise
    level < max_noise_level, nearest-resize to out_size. Returns
    (z, noise_level) — the level is fed to the model as an extra cond.

    ``encode_fn`` is the first-stage encode ([b,h,w,3] → latent sample;
    pass ``FirstStage.encode`` + ``.sample`` composition for KL engines)."""

    encode_fn: Callable[[jax.Array], jax.Array]
    decode_fn: Optional[Callable[[jax.Array], jax.Array]] = None
    linear_start: float = 1e-4
    linear_end: float = 2e-2
    timesteps: int = 1000
    max_noise_level: int = 250
    out_size: Optional[int] = 64
    scale_factor: float = 1.0

    @property
    def _cumprod(self) -> np.ndarray:
        betas = make_linear_betas(self.timesteps, self.linear_start, self.linear_end)
        return np.cumprod(1.0 - betas, axis=0)

    def q_sample(
        self, z: jax.Array, t: jax.Array, noise: jax.Array
    ) -> jax.Array:
        ac = jnp.asarray(self._cumprod, jnp.float32)[t]
        shape = (z.shape[0],) + (1,) * (z.ndim - 1)
        return (
            jnp.sqrt(ac).reshape(shape) * z
            + jnp.sqrt(1.0 - ac).reshape(shape) * noise
        )

    def __call__(
        self, x: jax.Array, rng: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        z = self.encode_fn(x) * self.scale_factor
        k_t, k_n = jax.random.split(rng)
        noise_level = jax.random.randint(
            k_t, (x.shape[0],), 0, self.max_noise_level
        )
        z = self.q_sample(z, noise_level, jax.random.normal(k_n, z.shape, z.dtype))
        if self.out_size is not None:
            z = jax.image.resize(
                z,
                (z.shape[0], self.out_size, self.out_size, z.shape[3]),
                "nearest",
            )
        return z, noise_level

    def decode(self, z: jax.Array) -> jax.Array:
        assert self.decode_fn is not None
        return self.decode_fn(z / self.scale_factor)


def clip_t5_text_fn(
    clip_fn: Callable[[jax.Array], jax.Array],
    t5_fn: Callable[[jax.Array], jax.Array],
) -> Callable[[Tuple[jax.Array, jax.Array]], Tuple[jax.Array, jax.Array]]:
    """FrozenCLIPT5Encoder (modules.py:729-754): encodes with both towers
    and emits the pair; the Conditioner's tuple routing concatenates them
    on the crossattn feature axis exactly like GeneralConditioner does with
    the reference's returned list."""

    def fn(tokens_pair):
        clip_tokens, t5_tokens = tokens_pair
        return (clip_fn(clip_tokens), t5_fn(t5_tokens))

    return fn
