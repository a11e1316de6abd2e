"""VAE: Encoder / Decoder / temporal VideoDecoder + Gaussian regularizer.

Counterparts of sgm/modules/diffusionmodules/model.py (Encoder :487-602,
Decoder :604-748, ResnetBlock :94-151, AttnBlock :161-203, Up/Downsample
:58-91) and sgm/modules/autoencoding/temporal_ae.py (VideoResBlock :18-83,
AE3DConv :86-108, VideoDecoder :293-349), plus
sgm/modules/autoencoding/regularizers (DiagonalGaussianRegularizer) and
distributions.py (DiagonalGaussianDistribution). NHWC layout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidseg_diffusion_tpu.ops.attention import dot_product_attention


def _norm(name: str):
    """VAE GroupNorm(32, eps=1e-6) with fp32 statistics (model.py:52-55) —
    the shared GroupNorm32 (same 'gn' param container, gcd fallback, and
    lane-layout-preserving lowering)."""
    from vidseg_diffusion_tpu.models.layers import GroupNorm32

    return GroupNorm32(epsilon=1e-6, name=name)


class VAEResnetBlock(nn.Module):
    """norm→swish→conv ×2 with 1x1 nin shortcut (model.py:94-151)."""

    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        c_out = self.out_channels if self.out_channels is not None else c_in
        h = nn.silu(_norm("norm1")(x))
        h = nn.Conv(c_out, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = nn.silu(_norm("norm2")(h))
        h = nn.Conv(c_out, (3, 3), dtype=self.dtype, name="conv2")(h)
        if c_in != c_out:
            x = nn.Conv(c_out, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class TemporalResnetBlock3D(nn.Module):
    """time_stack of temporal_ae.VideoResBlock: a 3-D ResBlock with
    skip_t_emb=True (temporal_ae.py:32-44). NDHWC, kernel (3,1,1)."""

    kernel: Tuple[int, int, int] = (3, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from vidseg_diffusion_tpu.models.unet import TemporalConv

        c = x.shape[-1]
        h = nn.silu(_norm("in_norm")(x))
        h = TemporalConv(c, self.kernel, dtype=self.dtype, name="in_conv")(h)
        h = nn.silu(_norm("out_norm")(h))
        h = TemporalConv(
            c, self.kernel, dtype=self.dtype, name="out_conv", zero_init=True,
        )(h)
        return x + h


class VideoVAEResnetBlock(nn.Module):
    """VAEResnetBlock + temporal 3-D ResBlock + learned α merge
    (temporal_ae.py:18-83, merge_strategy='learned', alpha=0)."""

    out_channels: Optional[int] = None
    video_kernel_size: Tuple[int, int, int] = (3, 1, 1)
    alpha: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: int = 1) -> jax.Array:
        x = VAEResnetBlock(
            out_channels=self.out_channels, dtype=self.dtype, name="spatial"
        )(x)
        bt, hh, ww, c = x.shape
        t = timesteps
        b = bt // t
        x5 = x.reshape(b, t, hh, ww, c)
        x_tem = TemporalResnetBlock3D(
            kernel=self.video_kernel_size, dtype=self.dtype, name="time_stack"
        )(x5)
        mix = self.param("mix_factor", lambda k: jnp.full((1,), self.alpha, jnp.float32))
        a = jax.nn.sigmoid(mix).astype(x.dtype)
        out = a * x_tem + (1.0 - a) * x5
        return out.reshape(bt, hh, ww, c)


class AttnBlock(nn.Module):
    """Single-head self-attention over spatial tokens (model.py:161-203)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        hn = _norm("norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(b, 1, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(b, 1, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(b, 1, h * w, c)
        out = dot_product_attention(q, k, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class VideoAttnBlock(nn.Module):
    """Spatio-temporal VAE attention for VideoDecoder time_mode='all'
    (temporal_ae.py VideoBlock :110-177): spatial single-head attention,
    then a single-head VideoTransformerBlock over frames with a sinusoidal
    frame-position embedding, α-merged, then proj_out + residual."""

    alpha: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: int = 1) -> jax.Array:
        from vidseg_diffusion_tpu.models.layers import timestep_embedding
        from vidseg_diffusion_tpu.models.video_layers import VideoTransformerBlock

        bt, h, w, c = x.shape
        x_in = x
        hn = _norm("norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(bt, 1, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(bt, 1, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(bt, 1, h * w, c)
        att = dot_product_attention(q, k, v).reshape(bt, h * w, c)

        frame_ids = jnp.tile(jnp.arange(timesteps), bt // timesteps)
        t_emb = timestep_embedding(frame_ids, c)
        emb = nn.Dense(c * 4, dtype=self.dtype, name="video_time_embed_0")(t_emb)
        emb = nn.Dense(c, dtype=self.dtype, name="video_time_embed_2")(nn.silu(emb))
        x_mix = att + emb[:, None, :].astype(att.dtype)
        x_mix = VideoTransformerBlock(
            heads=1, dim_head=c, ff_in=True, dtype=self.dtype, name="time_mix_block"
        )(x_mix, context=None, timesteps=timesteps)
        mix = self.param("mix_factor", lambda _: jnp.full((1,), self.alpha, jnp.float32))
        a = jax.nn.sigmoid(mix).astype(att.dtype)
        merged = a * att + (1.0 - a) * x_mix
        merged = merged.reshape(bt, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(merged)
        return x_in + out


class VAEDownsample(nn.Module):
    """Asymmetric-padded stride-2 conv (model.py:74-91)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            c, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv"
        )(x)


class VAEUpsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        x = x.reshape(b, 2 * h, 2 * w, c)
        return nn.Conv(c, (3, 3), dtype=self.dtype, name="conv")(x)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """configs/inference/{svd,sd_2_1}.yaml ddconfig."""

    ch: int = 128
    out_ch: int = 3
    in_channels: int = 3
    z_channels: int = 4
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    double_z: bool = True
    video_decoder: bool = False
    video_kernel_size: Tuple[int, ...] = (3, 1, 1)
    # VideoDecoder time_mode ∈ {conv-only, all, attn-only}
    # (temporal_ae.py:293-349; SVD ships conv-only)
    time_mode: str = "conv-only"
    dtype: jnp.dtype = jnp.float32


class Encoder(nn.Module):
    """model.py:487-602. x [B, H, W, 3] → moments [B, H/8, W/8, 2z]."""

    config: VAEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dt = cfg.dtype
        h = nn.Conv(cfg.ch, (3, 3), dtype=dt, name="conv_in")(x.astype(dt))
        for i_level, mult in enumerate(cfg.ch_mult):
            for i_block in range(cfg.num_res_blocks):
                h = VAEResnetBlock(
                    out_channels=cfg.ch * mult, dtype=dt,
                    name=f"down_{i_level}_block_{i_block}",
                )(h)
            if i_level != len(cfg.ch_mult) - 1:
                h = VAEDownsample(dtype=dt, name=f"down_{i_level}_downsample")(h)
        h = VAEResnetBlock(dtype=dt, name="mid_block_1")(h)
        h = AttnBlock(dtype=dt, name="mid_attn_1")(h)
        h = VAEResnetBlock(dtype=dt, name="mid_block_2")(h)
        h = nn.silu(_norm("norm_out")(h))
        out_c = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_c, (3, 3), dtype=dt, name="conv_out")(h)


class Decoder(nn.Module):
    """model.py:604-748 (+ VideoDecoder conv-only temporal path when
    config.video_decoder). z [B, h, w, z] → x [B, 8h, 8w, 3]."""

    config: VAEConfig

    def _res(self, name, out_channels=None):
        cfg = self.config
        if cfg.video_decoder and cfg.time_mode != "attn-only":
            return VideoVAEResnetBlock(
                out_channels=out_channels,
                video_kernel_size=tuple(cfg.video_kernel_size),
                dtype=cfg.dtype, name=name,
            )
        return VAEResnetBlock(out_channels=out_channels, dtype=cfg.dtype, name=name)

    @nn.compact
    def __call__(self, z: jax.Array, timesteps: int = 1) -> jax.Array:
        cfg = self.config
        dt = cfg.dtype
        kw = (
            dict(timesteps=timesteps)
            if (cfg.video_decoder and cfg.time_mode != "attn-only")
            else {}
        )
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), dtype=dt, name="conv_in")(z.astype(dt))
        h = self._res("mid_block_1")(h, **kw)
        if cfg.video_decoder and cfg.time_mode in ("all", "attn-only"):
            h = VideoAttnBlock(dtype=dt, name="mid_attn_1")(h, timesteps=timesteps)
        else:
            h = AttnBlock(dtype=dt, name="mid_attn_1")(h)
        h = self._res("mid_block_2")(h, **kw)
        for i_level in reversed(range(len(cfg.ch_mult))):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = self._res(f"up_{i_level}_block_{i_block}", block_out)(h, **kw)
            if i_level != 0:
                h = VAEUpsample(dtype=dt, name=f"up_{i_level}_upsample")(h)
        h = nn.silu(_norm("norm_out")(h))
        h = nn.Conv(cfg.out_ch, (3, 3), dtype=dt, name="conv_out")(h)
        if cfg.video_decoder and cfg.time_mode != "attn-only":
            # AE3DConv: spatial conv followed by temporal mix conv
            # (temporal_ae.py:86-108)
            bt, hh, ww, c = h.shape
            h5 = h.reshape(bt // timesteps, timesteps, hh, ww, c)
            from vidseg_diffusion_tpu.models.unet import TemporalConv

            h5 = TemporalConv(
                c, tuple(cfg.video_kernel_size), dtype=dt,
                name="conv_out_time_mix",
            )(h5)
            h = h5.reshape(bt, hh, ww, c)
        return h


def gaussian_sample(moments: jax.Array, rng: Optional[jax.Array]) -> jax.Array:
    """DiagonalGaussianDistribution sample/mode (distributions.py:24-102).

    moments [..., 2z]; rng None → mode (AutoencoderKLModeOnly)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if rng is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
