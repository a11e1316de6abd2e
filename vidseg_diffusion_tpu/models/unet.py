"""Diffusion UNets: SD 2.1 image UNet and SVD video UNet.

Behavioral counterparts of sgm/modules/diffusionmodules/openaimodel.py
(UNetModel :487-954, ResBlock :220-370, Up/Downsample :117-218) and
video_model.py (VideoUNet :92-566, VideoResBlock :15-89), re-designed:

- NHWC layout throughout (TPU conv-native); video tensors are [(b t), h, w, c]
  with temporal ops reshaping to [b, t, h, w, c] (NDHWC 3-D convs).
- Block topology is built statically from the config (channel_mult,
  num_res_blocks, attention_resolutions) exactly mirroring the reference's
  constructor loops, so checkpoint conversion is 1:1 by block index.
- VidSeg hooks: `UNetHooks` carries per-block-index modulation/injection
  state. Block gating (which indices) is static — mirrors the reference's
  `i in modulate_block_idx` / `input_block_indices` tests
  (video_model.py:480-562, openaimodel.py:861-949); step/frame gating inside
  is traced, so the whole denoise loop stays one compiled scan.
- Attention Q/K harvest: flax 'intermediates' sow inside CrossAttention.
  Paths look like `output_blocks_8/attn/transformer_blocks_0/attn1/q`,
  replacing the reference's `.pt` dumps (svd_single_video_inference.py:113-130).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from vidseg_diffusion_tpu.models.layers import (
    BlockInjection,
    BlockModulation,
    GroupNorm32,
    SpatialTransformer,
    timestep_embedding,
)
from vidseg_diffusion_tpu.models.video_layers import (
    SiteInjection,
    SiteModulation,
    SpatialVideoTransformer,
)


@flax.struct.dataclass
class UNetHooks:
    """VidSeg state threaded into a UNet forward.

    Keys are block indices (static pytree structure = static gating).
    For the image UNet, SiteModulation.temporal / SiteInjection.temporal are
    simply never populated."""

    output_mod: Dict[int, SiteModulation] = flax.struct.field(default_factory=dict)
    output_inj: Dict[int, SiteInjection] = flax.struct.field(default_factory=dict)
    input_inj: Dict[int, SiteInjection] = flax.struct.field(default_factory=dict)
    # static: output-block indices whose attention q/k get sown. None = all
    # sites (the default; tests inspect arbitrary blocks). The engine's
    # feature pass narrows this to the harvested set — a sow at every site
    # under mutable=['intermediates'] materializes GBs per step.
    sow_blocks: Optional[Tuple[int, ...]] = flax.struct.field(
        pytree_node=False, default=None
    )


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Static architecture config (configs/inference/{sd_2_1,svd}.yaml)."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_head_channels: int = 64
    # int (all levels) or per-level tuple — SDXL uses [1, 2, 10]
    # (configs/inference/sd_xl_base.yaml:31; openaimodel.py:142-146)
    transformer_depth: Any = 1
    context_dim: int = 1024
    adm_in_channels: Optional[int] = None  # SVD: 768 ("sequential" class emb)
    video: bool = False
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    video_kernel_size: Tuple[int, ...] = (3, 1, 1)
    dtype: jnp.dtype = jnp.float32
    # per-block jax.checkpoint (reference use_checkpoint, openaimodel.py:231
    # via util.checkpoint). jax semantics: forward-only jit is unchanged;
    # only the VJP rematerializes block activations — so honoring the
    # reference YAMLs' use_checkpoint: True costs inference nothing and
    # gives training the same memory/flops trade.
    remat: bool = False
    # selective remat: name of a jax.checkpoint_policies entry (e.g.
    # "dots_with_no_batch_dims_saveable") — the per-block VJP then SAVES the
    # policy's values instead of recomputing everything. The special value
    # "save_conv" saves the checkpoint_name-tagged conv outputs (_tag_conv;
    # needs VIDSEG_CKPT_NAME_CONVS=1). None = the default nothing_saveable
    # (full per-block recompute, the reference torch.utils.checkpoint
    # semantics, attention.py:599). Pallas-attention residuals (LSE) live
    # inside the kernels' custom_vjp and are saved regardless of policy.
    remat_policy: Optional[str] = None

    @property
    def num_blocks(self) -> int:
        return len(self.channel_mult) * self.num_res_blocks + len(self.channel_mult)

    def depth_for_level(self, level: int) -> int:
        td = self.transformer_depth
        if isinstance(td, (tuple, list)):
            return td[level]
        return td

    def block_layout(self):
        """Reproduce the reference's constructor loops to get, per input and
        output block index, (has_attention, channels, ds). Used both by the
        model and by the checkpoint converter / engine resolution math."""
        ch = self.model_channels
        ds = 1
        input_blocks = [dict(kind="conv_in", ch=ch, ds=ds)]
        input_chans = [ch]
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = mult * self.model_channels
                attn = ds in self.attention_resolutions
                input_blocks.append(
                    dict(kind="res", ch=ch, ds=ds, attn=attn, level=level)
                )
                input_chans.append(ch)
            if level != len(self.channel_mult) - 1:
                ds *= 2
                input_blocks.append(dict(kind="down", ch=ch, ds=ds))
                input_chans.append(ch)
        middle = dict(ch=ch, ds=ds, level=len(self.channel_mult) - 1)
        output_blocks = []
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                ich = input_chans.pop()
                ch = self.model_channels * mult
                attn = ds in self.attention_resolutions
                up = level > 0 and i == self.num_res_blocks
                if up:
                    ds //= 2
                output_blocks.append(
                    dict(kind="res", ch=ch, skip_ch=ich, ds=ds * (2 if up else 1),
                         attn=attn, up=up, level=level)
                )
        return input_blocks, middle, output_blocks


def _tag_conv(out: jax.Array) -> jax.Array:
    """Optionally name conv outputs for selective-remat policies.

    With VIDSEG_CKPT_NAME_CONVS=1 (read per trace; set by train harnesses
    when remat_policy='save_conv'), conv outputs get
    jax.ad_checkpoint.checkpoint_name('conv_out') so
    save_only_these_names('conv_out') can SAVE them across the remat
    boundary — the backward then skips recomputing the FLOPs-heavy convs
    while everything else still rematerializes. Default off: the name
    primitive is identity, but inference programs stay byte-identical."""
    import os

    if os.environ.get("VIDSEG_CKPT_NAME_CONVS") == "1":
        from jax.ad_checkpoint import checkpoint_name

        return checkpoint_name(out, "conv_out")
    return out


class SpatialConv3x3(nn.Module):
    """3x3 SAME conv with a Pallas-kernel dispatch hook.

    Param tree matches nn.Conv ({kernel [3,3,cin,cout], bias}) so checkpoint
    conversion is unchanged. Routes to ops/conv3x3.conv3x3_same (9 shifted
    MXU dots) when the dispatcher enables it for the shape; otherwise the
    stock XLA NHWC lowering — identical numerics either way (interp-parity
    tested)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from vidseg_diffusion_tpu.ops.conv3x3 import (
            conv3x3_same, use_pallas_conv3x3,
        )

        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        if use_pallas_conv3x3(x.shape[1], x.shape[2], cin, self.features):
            return _tag_conv(conv3x3_same(x, k, b))
        return _tag_conv(jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b)


class ResBlock(nn.Module):
    """GroupNorm→SiLU→conv ×2 with timestep-embedding add and skip
    (openaimodel.py:220-370). NHWC."""

    out_channels: Optional[int] = None
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        c_out = self.out_channels if self.out_channels is not None else c_in

        h = nn.silu(GroupNorm32(name="in_norm")(x))
        if self.up:
            h = _nearest_up2(h)
            x = _nearest_up2(x)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), (2, 2))
            x = nn.avg_pool(x, (2, 2), (2, 2))
        h = SpatialConv3x3(c_out, dtype=self.dtype, name="in_conv")(h)

        e = nn.Dense(c_out, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]

        h = nn.silu(GroupNorm32(name="out_norm")(h))
        h = SpatialConv3x3(
            c_out, dtype=self.dtype, name="out_conv",
            kernel_init=nn.initializers.zeros,
        )(h)

        if c_out != c_in:
            x = nn.Conv(c_out, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class TemporalConv(nn.Module):
    """(kt, kh, kw) video conv decomposed into kt time-shifted 2-D convs.

    XLA:TPU lowers a 3-spatial-dim convolution through space-to-depth
    relayouts that materialize full-size fp32 copies around every
    `time_stack` site (~5 GB of %copy + %reshape per UNet step in the swan
    HLO dump — the largest relayout family). The same math as
    Conv3D(kt,kh,kw) with SAME zero padding on t is

        out[t'] = Σ_{j<kt} Conv2D(kh,kw)( x_tpad[t'+j], W[j] ) + bias

    where x_tpad has kt//2 zero frames each side — for the SVD kernel
    (3,1,1) each term is a plain channel matmul, which is exactly what the
    MXU wants and keeps the activation in its native [.., h, w, c] layout.
    Param tree matches nn.Conv ({kernel [kt,kh,kw,cin,cout], bias}), so
    checkpoint conversion is unchanged."""

    features: int
    kernel: Tuple[int, int, int] = (3, 1, 1)
    dtype: jnp.dtype = jnp.float32
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [b, t, h, w, c]
        b, t, hh, ww, cin = x.shape
        kt, kh, kw = self.kernel
        init = (
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal()
        )
        kernel = self.param(
            "kernel", init, (kt, kh, kw, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        from vidseg_diffusion_tpu.ops.temporal_conv import (
            temporal_conv_1x1, use_pallas_temporal_conv,
        )
        if use_pallas_temporal_conv(self.kernel, cin, self.features, t):
            # Fused Pallas path: all taps in one HBM pass, plain MXU dots
            # (the per-tap lowering below lands in a ~12%-efficient XLA conv
            # emitter on TPU — see ops/temporal_conv.py).
            y = temporal_conv_1x1(
                x.reshape(b, t, hh * ww, cin).astype(self.dtype),
                kernel[:, 0, 0].astype(self.dtype),
                bias,
            )
            return _tag_conv(y.reshape(b, t, hh, ww, self.features))

        pad = kt // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
        out = None
        for j in range(kt):
            xj = xp[:, j:j + t].reshape(b * t, hh, ww, cin).astype(self.dtype)
            wj = kernel[j].astype(self.dtype)  # [kh, kw, cin, cout]
            if kh == 1 and kw == 1:
                # Flat [M,K]@[K,N] matmul, NOT einsum 'bhwc,cd->bhwd': XLA:TPU
                # lowers the latter through 01bf_io01 conv emitters at ~12% MXU
                # efficiency (measured 53 ms/step across the time_stack sites);
                # the explicit dot is ~6x faster at the same shapes
                # (scripts/tests/temporal_conv_tune.py) and bit-identical.
                y = (xj.reshape(b * t * hh * ww, cin) @ wj[0, 0]).reshape(
                    b * t, hh, ww, self.features
                )
            else:
                y = jax.lax.conv_general_dilated(
                    xj, wj, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            out = y if out is None else out + y
        out = out + bias.astype(self.dtype)
        return _tag_conv(out.reshape(b, t, hh, ww, self.features))


class TemporalResBlock3D(nn.Module):
    """The `time_stack` ResBlock inside VideoResBlock
    (video_model.py:45-58; openaimodel ResBlock with dims=3,
    kernel_size=video_kernel_size, exchange_temb_dims=True). NDHWC; convs
    via the TemporalConv decomposition (no 3-D conv on the TPU path)."""

    kernel: Tuple[int, int, int] = (3, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        # x: [b, t, h, w, c]; emb: [b, t, E]
        c = x.shape[-1]
        # NOTE (measured, do not redo): fusing these norms into the Pallas
        # GN+SiLU kernel (fuse_silu=True) to dodge the standalone-stats
        # relayout the Pallas temporal conv induces was a net LOSS
        # (+8 ms/step): the GN custom call breaks the surrounding
        # elementwise fusions (+22 ms of %fusion) for -21 ms of stats.
        h = nn.silu(GroupNorm32(name="in_norm")(x))
        h = TemporalConv(c, self.kernel, dtype=self.dtype, name="in_conv")(h)
        e = nn.Dense(c, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        # exchange_temb_dims: per-frame embedding broadcast over (h, w)
        h = h + e[:, :, None, None, :]
        h = nn.silu(GroupNorm32(name="out_norm")(h))
        h = TemporalConv(
            c, self.kernel, dtype=self.dtype, name="out_conv", zero_init=True,
        )(h)
        return x + h


class VideoResBlock(nn.Module):
    """Spatial ResBlock + temporal 3-D ResBlock + AlphaBlender
    (video_model.py:15-89)."""

    out_channels: Optional[int] = None
    up: bool = False
    down: bool = False
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    video_kernel_size: Tuple[int, int, int] = (3, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [(b t), h, w, c]
        emb: jax.Array,  # [(b t), E]
        num_video_frames: int = 1,
        image_only_indicator: Optional[jax.Array] = None,
    ) -> jax.Array:
        x = ResBlock(
            out_channels=self.out_channels, up=self.up, down=self.down,
            dtype=self.dtype, name="spatial",
        )(x, emb)
        t = num_video_frames
        bt, hh, ww, c = x.shape
        b = bt // t
        x_5d = x.reshape(b, t, hh, ww, c)
        emb_5d = emb.reshape(b, t, -1)
        x_mix = x_5d
        x_tem = TemporalResBlock3D(
            kernel=self.video_kernel_size, dtype=self.dtype, name="time_stack"
        )(x_5d, emb_5d)
        x_out = AlphaBlenderB1T(
            alpha=self.merge_factor, merge_strategy=self.merge_strategy,
            name="time_mixer",
        )(x_mix, x_tem, image_only_indicator)
        return x_out.reshape(bt, hh, ww, c)


class AlphaBlenderB1T(nn.Module):
    """AlphaBlender for [b, t, h, w, c] video layout (rearrange_pattern
    'b t -> b 1 t 1 1' in the reference maps to [b, t, 1, 1, 1] in NDHWC)."""

    alpha: float = 0.5
    merge_strategy: str = "learned_with_images"

    @nn.compact
    def __call__(self, x_spatial, x_temporal, image_only_indicator=None):
        if self.merge_strategy == "fixed":
            alpha = jnp.asarray(self.alpha, x_spatial.dtype)
        else:
            mix = self.param(
                "mix_factor", lambda k: jnp.full((1,), self.alpha, jnp.float32)
            )
            alpha = jax.nn.sigmoid(mix)
            if self.merge_strategy == "learned_with_images":
                assert image_only_indicator is not None
                alpha = jnp.where(image_only_indicator.astype(bool), 1.0, alpha[..., None])
                alpha = alpha[:, :, None, None, None]  # [b, t, 1, 1, 1]
        alpha = alpha.astype(x_spatial.dtype)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


def _nearest_up2(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Upsample(nn.Module):
    """2× nearest upsample + conv (openaimodel.py:117-167)."""

    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.out_channels if self.out_channels is not None else x.shape[-1]
        return nn.Conv(c, (3, 3), dtype=self.dtype, name="conv")(_nearest_up2(x))


class Downsample(nn.Module):
    """Stride-2 conv (openaimodel.py:169-218)."""

    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.out_channels if self.out_channels is not None else x.shape[-1]
        # torch Conv2d(stride=2, padding=1) pads symmetrically; flax's default
        # "SAME" would pad (0, 1) at stride 2 and sample a shifted grid
        return nn.Conv(
            c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="op",
        )(x)


class UNetModel(nn.Module):
    """The diffusion UNet (image or video per config.video).

    forward(x [(b t), h, w, c], timesteps [(b t)], context [(b t), Lc, ctx],
    y [(b t), adm] | None) → [(b t), h, w, out_c].
    """

    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        context: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        num_video_frames: int = 1,
        image_only_indicator: Optional[jax.Array] = None,
        hooks: Optional[UNetHooks] = None,
    ) -> jax.Array:
        cfg = self.config
        dt = cfg.dtype
        input_blocks, middle, output_blocks = cfg.block_layout()

        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(cfg.model_channels * 4, dtype=dt, name="time_embed_0")(t_emb.astype(dt))
        emb = nn.Dense(cfg.model_channels * 4, dtype=dt, name="time_embed_2")(nn.silu(emb))

        if y is not None:
            assert cfg.adm_in_channels is not None
            le = nn.Dense(cfg.model_channels * 4, dtype=dt, name="label_emb_0")(y.astype(dt))
            le = nn.Dense(cfg.model_channels * 4, dtype=dt, name="label_emb_2")(nn.silu(le))
            emb = emb + le

        # per-block rematerialization (static_argnums count self as 0; the
        # static slots are the num_video_frames / timesteps ints)
        if cfg.remat:
            if cfg.remat_policy == "save_conv":
                # save the checkpoint_name-tagged conv outputs (requires
                # VIDSEG_CKPT_NAME_CONVS=1, see _tag_conv) — the backward
                # skips recomputing the convs, everything else remats
                policy = jax.checkpoint_policies.save_only_these_names(
                    "conv_out"
                )
            elif cfg.remat_policy:
                policy = getattr(jax.checkpoint_policies, cfg.remat_policy)
            else:
                policy = None
            _Res = nn.remat(ResBlock, policy=policy)
            _VRes = nn.remat(VideoResBlock, static_argnums=(3,), policy=policy)
            _ST = nn.remat(SpatialTransformer, policy=policy)
            _SVT = nn.remat(
                SpatialVideoTransformer, static_argnums=(3,), policy=policy
            )
        else:
            _Res, _VRes = ResBlock, VideoResBlock
            _ST, _SVT = SpatialTransformer, SpatialVideoTransformer

        def res_block(idx_name, spec, h):
            if cfg.video:
                return _VRes(
                    out_channels=spec["ch"],
                    merge_strategy=cfg.merge_strategy,
                    merge_factor=cfg.merge_factor,
                    video_kernel_size=cfg.video_kernel_size,
                    dtype=dt,
                    name=idx_name,
                )(h, emb, num_video_frames, image_only_indicator)
            return _Res(out_channels=spec["ch"], dtype=dt, name=idx_name)(h, emb)

        def attn_block(idx_name, spec, h, mod, inj, sow=True):
            heads = spec["ch"] // cfg.num_head_channels
            depth = cfg.depth_for_level(spec.get("level", 0))
            if cfg.video:
                return _SVT(
                    heads=heads,
                    dim_head=cfg.num_head_channels,
                    depth=depth,
                    merge_strategy=cfg.merge_strategy,
                    merge_factor=cfg.merge_factor,
                    dtype=dt,
                    sow_qk=sow,
                    name=idx_name,
                )(h, context, num_video_frames, image_only_indicator, mod, inj)
            return _ST(
                heads=heads,
                dim_head=cfg.num_head_channels,
                depth=depth,
                dtype=dt,
                sow_qk=sow,
                name=idx_name,
            )(
                h, context,
                mod.spatial if mod is not None else None,
                inj.spatial if inj is not None else None,
            )

        hooks = hooks if hooks is not None else UNetHooks()

        hs = []
        h = x.astype(dt)
        for i, spec in enumerate(input_blocks):
            if spec["kind"] == "conv_in":
                h = nn.Conv(cfg.model_channels, (3, 3), dtype=dt, name="input_blocks_0_0")(h)
            elif spec["kind"] == "down":
                h = Downsample(out_channels=spec["ch"], dtype=dt, name=f"input_blocks_{i}_0")(h)
            else:
                h = res_block(f"input_blocks_{i}_0", spec, h)
                if spec.get("attn"):
                    inj = hooks.input_inj.get(i)
                    h = attn_block(
                        f"input_blocks_{i}_1", spec, h, None, inj,
                        sow=hooks.sow_blocks is None,
                    )
            hs.append(h)

        h = res_block("middle_block_0", dict(ch=middle["ch"]), h)
        h = attn_block(
            "middle_block_1", middle, h, None, None,
            sow=hooks.sow_blocks is None,
        )
        h = res_block("middle_block_2", dict(ch=middle["ch"]), h)

        for i, spec in enumerate(output_blocks):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = res_block(f"output_blocks_{i}_0", spec, h)
            if spec.get("attn"):
                mod = hooks.output_mod.get(i)
                inj = hooks.output_inj.get(i)
                h = attn_block(
                    f"output_blocks_{i}_1", spec, h, mod, inj,
                    sow=hooks.sow_blocks is None or i in hooks.sow_blocks,
                )
            if spec.get("up"):
                pos = 2 if spec.get("attn") else 1
                h = Upsample(out_channels=spec["ch"], dtype=dt, name=f"output_blocks_{i}_{pos}")(h)

        h = nn.silu(GroupNorm32(name="out_0")(h))
        h = nn.Conv(
            cfg.out_channels, (3, 3), dtype=dt, name="out_2",
            kernel_init=nn.initializers.zeros,
        )(h)
        return h.astype(x.dtype)
