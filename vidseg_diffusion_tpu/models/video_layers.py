"""Temporal (video) transformer blocks for the SVD UNet.

Counterparts of sgm/modules/video_attention.py: VideoTransformerBlock
(:18-288) and SpatialVideoTransformer (:291-489). The factorized attention
layout is preserved exactly because the VidSeg method indexes into it:
spatial attention folds frames into batch ([(b t), s, c]) and temporal
attention folds tokens into batch ([(b s), t, c], video_attention.py:152),
with the CFG uc half occupying the first half of each folded batch.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from vidseg_diffusion_tpu.models.layers import (
    AlphaBlender,
    BasicTransformerBlock,
    BlockInjection,
    BlockModulation,
    CrossAttention,
    FeedForward,
    GroupNorm32,
    timestep_embedding,
)


def temporal_layout() -> str:
    """Temporal-block layout knob (read per trace, like VIDSEG_OUTPROJ_MODE):

    - 'direct' (default): temporal blocks stay in the UNet-native
      [(b t), s, c] layout; attention runs across the frame groups of the
      batch axis via ops/attention.temporal_attention_direct (Pallas kernel
      on TPU), and the (b t) s c ↔ (b s) t c transposes are never
      materialized. Norms/FFs/projections are row-order-agnostic; λ·mask
      modulation uses the frame-major `spatial_add` form; harvested temporal
      q/k are sown in (and injected from) the direct layout, so a feature
      pass and its modulated runs under one mode are self-consistent. Modes
      must not be mixed across a harvest/inject pair.
    - 'folded': the reference's rearrange — temporal blocks run on
      [(b s), t, c] (video_attention.py:152), paying a physical transpose
      pair per site (~3 GB/step of HBM copy traffic across the 10 temporal
      sites at swan scale, PROFILE_UNET %copy/%reshape attribution).

    Measured on v5e at the swan bench (serialized A/B, two runs each,
    ROUND_NOTES r5): direct 469.5/469.6 ms/step (29.81 f/s) vs folded
    494.4/494.6 ms (28.31 f/s) — a 25 ms (5.1%) win, hence the default.
    """
    import os

    return os.environ.get("VIDSEG_TEMPORAL_LAYOUT", "direct")


class VideoTransformerBlock(nn.Module):
    """Temporal transformer block (video_attention.py:18-288).

    Operates on [(b t), s, c]; internally reshapes to [(b s), t, c]. SVD
    config: ff_in=True (extra_ff_mix_layer), inner_dim == dim (is_res),
    temporal cross-attention enabled with spatial context.

    Injection quirk preserved from the reference: only attn1 (temporal self
    attention) accepts injected Q/K/V (video_attention.py:166-195); attn2 is
    always computed even though temporal_cross features are harvested.
    """

    heads: int
    dim_head: int
    ff_in: bool = True
    dtype: jnp.dtype = jnp.float32
    sow_qk: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [(b t), s, c]
        context: Optional[jax.Array] = None,  # time context [(b s)-broadcastable, 1, ctx]
        timesteps: int = None,
        modulation: Optional[BlockModulation] = None,
        injection: Optional[BlockInjection] = None,
    ) -> jax.Array:
        bt, s, c = x.shape
        t = timesteps
        b = bt // t
        direct = temporal_layout() == "direct"
        if not direct:
            # (b t) s c -> (b s) t c  (video_attention.py:152)
            x = x.reshape(b, t, s, c).transpose(0, 2, 1, 3).reshape(b * s, t, c)
        # in direct mode x stays [(b t), s, c]; attention crosses the frame
        # groups of the batch axis (temporal_attention_direct) and the
        # λ·mask add uses the frame-major spatial_add form — same values,
        # no HBM transposes
        tf = t if direct else None
        mod_add = (lambda m, y: m.spatial_add(y)) if direct else (
            lambda m, y: m.temporal_add(y)
        )

        if self.ff_in:
            x_skip = x
            x = FeedForward(dtype=self.dtype, name="ff_in")(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_in")(x)
            )
            x = x + x_skip  # is_res: inner_dim == dim

        a1 = CrossAttention(
            heads=self.heads, dim_head=self.dim_head, dtype=self.dtype,
            sow_qk=self.sow_qk, temporal_frames=tf, name="attn1"
        )(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x),
            context=None,
            injection=injection.attn1 if injection is not None else None,
        )
        if modulation is not None and modulation.self_attn is not None:
            a1 = mod_add(modulation.self_attn, a1)
        x = a1 + x

        a2 = CrossAttention(
            heads=self.heads, dim_head=self.dim_head, dtype=self.dtype,
            sow_qk=self.sow_qk, name="attn2"
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), context=context)
        if modulation is not None and modulation.cross_attn is not None:
            a2 = mod_add(modulation.cross_attn, a2)
        x = a2 + x

        x_skip = x
        f = FeedForward(dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        )
        if modulation is not None and modulation.ff_out is not None:
            f = mod_add(modulation.ff_out, f)
        x = x_skip + f

        if not direct:
            # (b s) t c -> (b t) s c
            x = x.reshape(b, s, t, c).transpose(0, 2, 1, 3).reshape(b * t, s, c)
        return x


@flax.struct.dataclass
class SiteModulation:
    """Modulation for one UNet block: separate spatial/temporal layer gates
    (modulate_layer_type, video_attention.py:432-460)."""

    spatial: Optional[BlockModulation] = None
    temporal: Optional[BlockModulation] = None


@flax.struct.dataclass
class SiteInjection:
    """Injection for one UNet block's spatial and temporal transformer."""

    spatial: Optional[BlockInjection] = None
    temporal: Optional[BlockInjection] = None


class SpatialVideoTransformer(nn.Module):
    """Interleaved spatial + temporal transformer (video_attention.py:291-489).

    Per depth: spatial BasicTransformerBlock → add sinusoidal frame-position
    embedding → VideoTransformerBlock → AlphaBlender merge.
    """

    heads: int
    dim_head: int
    depth: int = 1
    use_linear: bool = True
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    max_time_embed_period: int = 10000
    dtype: jnp.dtype = jnp.float32
    sow_qk: bool = True
    zero_init_proj_out: bool = False  # see SpatialTransformer

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B=(b t), H, W, C]
        context: Optional[jax.Array] = None,  # [(b t), Lc, ctx]
        timesteps: int = None,
        image_only_indicator: Optional[jax.Array] = None,
        modulation: Optional[SiteModulation] = None,
        injection: Optional[SiteInjection] = None,
    ) -> jax.Array:
        bt, h, w, c = x.shape
        t = timesteps
        inner = self.heads * self.dim_head
        x_in = x

        spatial_context = context
        # use_spatial_context: time context = context of each video's first
        # frame, repeated per batch row of the temporal block's layout —
        # per spatial token for the folded [(b s), t, c] layout
        # (video_attention.py:395-404), per frame for the direct
        # [(b t), s, c] layout (the context is constant over both s and t,
        # so the two repeats feed identical per-query contexts)
        time_context = None
        if context is not None:
            first = context[::t]  # [b, Lc, ctx]
            if temporal_layout() == "direct":
                time_context = jnp.repeat(first, t, axis=0)  # [(b t), Lc, ctx]
            else:
                time_context = jnp.repeat(first, h * w, axis=0)  # [(b hw), Lc, ctx]

        x = GroupNorm32(epsilon=1e-6, name="norm")(x)
        x = x.reshape(bt, h * w, c)
        # always a Dense: 1x1-conv checkpoints (use_linear=False) convert
        # through io/checkpoint._adapt's conv->dense squeeze
        x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)

        # sinusoidal frame-position embedding (video_attention.py:417-427)
        frame_ids = jnp.tile(jnp.arange(t), bt // t)
        t_emb = timestep_embedding(frame_ids, c, max_period=self.max_time_embed_period)
        emb = nn.Dense(c * 4, dtype=self.dtype, name="time_pos_embed_0")(t_emb)
        emb = nn.Dense(c, dtype=self.dtype, name="time_pos_embed_2")(nn.silu(emb))
        emb = emb[:, None, :].astype(x.dtype)

        mixer = AlphaBlender(
            alpha=self.merge_factor,
            merge_strategy=self.merge_strategy,
            broadcast="bt11",
            name="time_mixer",
        )  # constructed ONCE: per-depth construction with a fixed name
        #    raises flax NameInUseError at depth >= 2; the reference shares
        #    one time_mixer across depths

        for d in range(self.depth):
            x = BasicTransformerBlock(
                heads=self.heads,
                dim_head=self.dim_head,
                dtype=self.dtype,
                sow_qk=self.sow_qk,
                name=f"transformer_blocks_{d}",
            )(
                x,
                context=spatial_context,
                modulation=modulation.spatial if modulation is not None else None,
                injection=injection.spatial if injection is not None else None,
            )

            x_mix = x + emb
            x_mix = VideoTransformerBlock(
                heads=self.heads,
                dim_head=self.dim_head,
                ff_in=True,
                dtype=self.dtype,
                sow_qk=self.sow_qk,
                name=f"time_stack_{d}",
            )(
                x_mix,
                context=time_context,
                timesteps=t,
                modulation=modulation.temporal if modulation is not None else None,
                injection=injection.temporal if injection is not None else None,
            )
            x = mixer(
                x_spatial=x, x_temporal=x_mix,
                image_only_indicator=image_only_indicator,
            )

        x = nn.Dense(
            c, dtype=self.dtype, name="proj_out",
            kernel_init=(nn.initializers.zeros if self.zero_init_proj_out
                         else nn.initializers.lecun_normal()),
        )(x)
        x = x.reshape(bt, h, w, c)
        return x + x_in
