"""OpenCLIP-compatible text and vision towers (flax).

Counterparts of the open_clip ViT-H-14 towers consumed by the reference's
conditioner embedders (sgm/modules/encoders/modules.py: FrozenOpenCLIPEmbedder
:498-566 text/penultimate; FrozenOpenCLIPImageEmbedder :570-728 pooled image
embedding). Architecture mirrors open_clip's ResidualAttentionBlock so the
laion2b ViT-H checkpoint converts 1:1 (pre-LN attn + GELU MLP; packed QKV
in_proj in the checkpoint is split by the converter).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidseg_diffusion_tpu.ops.attention import dot_product_attention


class ResidualAttentionBlock(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32
    act: str = "gelu"  # "gelu" (open_clip ViT-H/bigG) | "quick_gelu" (OpenAI CLIP-L)

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = False) -> jax.Array:
        width = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        b, l, _ = h.shape
        q = nn.Dense(width, dtype=self.dtype, name="attn_q")(h)
        k = nn.Dense(width, dtype=self.dtype, name="attn_k")(h)
        v = nn.Dense(width, dtype=self.dtype, name="attn_v")(h)
        dh = width // self.heads

        def split(t):
            return t.reshape(b, l, self.heads, dh).transpose(0, 2, 1, 3)

        if causal:
            # tiny seq (77) — explicit masked softmax is fine and fuses
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", split(q), split(k),
                preferred_element_type=jnp.float32,
            ) / jnp.sqrt(dh).astype(jnp.float32)
            mask = jnp.tril(jnp.ones((l, l), bool))
            logits = jnp.where(mask[None, None], logits, -jnp.inf)
            w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", w, split(v))
        else:
            out = dot_product_attention(split(q), split(k), split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, l, width)
        out = nn.Dense(width, dtype=self.dtype, name="attn_out")(out)
        x = x + out

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(width * 4, dtype=self.dtype, name="mlp_c_fc")(h)
        if self.act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = nn.gelu(h, approximate=False)
        h = nn.Dense(width, dtype=self.dtype, name="mlp_c_proj")(h)
        return x + h


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    act: str = "gelu"  # "quick_gelu" for the OpenAI CLIP-L tower
    dtype: jnp.dtype = jnp.float32


class CLIPTextTransformer(nn.Module):
    """Text tower covering the three reference text-embedder variants:

    - SD 2.1 FrozenOpenCLIPEmbedder layer='penultimate'
      (modules.py:552-563): penultimate=True, final_ln=True — skip the last
      block, apply ln_final.
    - SDXL FrozenOpenCLIPEmbedder2 (ViT-bigG, legacy=False,
      always_return_pooled, modules.py:395-496): penultimate=True,
      final_ln=False, return_pooled=True — returns (penultimate hidden WITHOUT
      ln_final, pooled = ln_final(last)[eot-argmax] @ text_projection).
    - SDXL FrozenCLIPEmbedder (HF CLIP-L, layer='hidden', layer_idx=11,
      modules.py:330-393): penultimate=True, final_ln=False,
      config.act='quick_gelu' — HF hidden_states[11] is the raw penultimate
      block output, no final LayerNorm.
    """

    config: CLIPTextConfig
    penultimate: bool = True
    final_ln: bool = True
    return_pooled: bool = False

    @nn.compact
    def __call__(self, tokens: jax.Array):
        cfg = self.config
        emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width),
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = emb[tokens].astype(cfg.dtype) + pos[None].astype(cfg.dtype)
        # without pooling, a skipped last block need not exist in the tree
        n = cfg.layers - (1 if (self.penultimate and not self.return_pooled) else 0)
        x_pen = x
        for i in range(n):
            if self.return_pooled and i == cfg.layers - 1:
                x_pen = x
            x = ResidualAttentionBlock(
                heads=cfg.heads, dtype=cfg.dtype, act=cfg.act,
                name=f"resblocks_{i}",
            )(x, causal=True)
        if not self.return_pooled:
            if self.final_ln:
                return nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_final")(x)
            return x
        # return_pooled implies legacy=False: hidden stays un-normalized
        # (modules.py:456-468 applies ln_final only to the pooled path)
        hidden = x_pen if self.penultimate else x
        o = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_final")(x)
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02), (cfg.width, cfg.width)
        )
        # eot pooling: token ids peak at EOT (modules.py:468-474)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = o[jnp.arange(o.shape[0]), eot] @ proj.astype(cfg.dtype)
        return hidden, pooled


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    heads: int = 16
    layers: int = 32
    output_dim: int = 1024
    dtype: jnp.dtype = jnp.float32


class CLIPVisionTransformer(nn.Module):
    """Vision tower → pooled, projected embedding [b, output_dim]
    (open_clip VisionTransformer; consumed at modules.py:693-728)."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        b = x.shape[0]
        # x: [b, 224, 224, 3] already CLIP-normalized
        x = nn.Conv(
            cfg.width, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            dtype=cfg.dtype, name="conv1",
        )(x.astype(cfg.dtype))
        grid = x.shape[1] * x.shape[2]
        x = x.reshape(b, grid, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (grid + 1, cfg.width),
        )
        x = x + pos[None].astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_pre")(x)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(
                heads=cfg.heads, dtype=cfg.dtype, name=f"resblocks_{i}"
            )(x, causal=False)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (cfg.width, cfg.output_dim)
        )
        return pooled @ proj.astype(cfg.dtype)


_CLIP_MEAN = jnp.array([0.48145466, 0.4578275, 0.40821073])
_CLIP_STD = jnp.array([0.26862954, 0.26130258, 0.27577711])


def clip_preprocess(x: jax.Array) -> jax.Array:
    """[-1, 1] frames [b, h, w, 3] → 224² CLIP-normalized
    (FrozenOpenCLIPImageEmbedder.preprocess, modules.py:620-632: bicubic
    224 resize with antialias, then mean/std normalize)."""
    x = jax.image.resize(
        x, (x.shape[0], 224, 224, x.shape[3]), method="bicubic", antialias=True
    )
    x = (x + 1.0) / 2.0
    return (x - _CLIP_MEAN) / _CLIP_STD


def clip_text_key_fn(path: Tuple[str, ...]) -> str:
    """flax path → open_clip text-tower checkpoint key. Packed in_proj is
    handled by the converter's qkv splitter (see convert_clip_attn)."""
    return _clip_key(path)


def clip_vision_key_fn(path: Tuple[str, ...]) -> str:
    return "visual." + _clip_key(path)


def _clip_key(path: Tuple[str, ...]) -> str:
    parts = list(path)
    leaf = parts.pop()
    segs = []
    for p in parts:
        if p.startswith("resblocks_"):
            segs.append("transformer." + p.replace("resblocks_", "resblocks."))
        elif p.startswith("attn_"):
            segs.append("attn." + p.split("_", 1)[1])  # placeholder; packed qkv split upstream
        elif p.startswith("mlp_"):
            segs.append("mlp." + p.split("_", 1)[1])
        else:
            segs.append(p)
    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias"}
    if leaf == "token_embedding":
        return ".".join(segs + ["token_embedding", "weight"])
    if leaf in ("positional_embedding", "class_embedding", "proj", "text_projection"):
        return ".".join(segs + [leaf])
    return ".".join(segs + [leaf_map[leaf]])


def hf_clip_text_key_fn(path: Tuple[str, ...]) -> str:
    """flax path → HuggingFace CLIPTextModel checkpoint key (the SDXL
    checkpoint stores its CLIP-L tower in HF layout under
    conditioner.embedders.0.transformer.text_model.*)."""
    parts = list(path)
    leaf = parts.pop()
    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias"}
    if leaf == "token_embedding":
        return "text_model.embeddings.token_embedding.weight"
    if leaf == "positional_embedding":
        return "text_model.embeddings.position_embedding.weight"
    if leaf == "text_projection":
        return "text_projection.weight"
    segs = []
    for p in parts:
        if p.startswith("resblocks_"):
            segs.append(
                "text_model.encoder.layers." + p.removeprefix("resblocks_")
            )
        elif p == "ln_1":
            segs.append("layer_norm1")
        elif p == "ln_2":
            segs.append("layer_norm2")
        elif p.startswith("attn_"):
            name = p.split("_", 1)[1]
            segs.append(f"self_attn.{'out_proj' if name == 'out' else name + '_proj'}")
        elif p == "mlp_c_fc":
            segs.append("mlp.fc1")
        elif p == "mlp_c_proj":
            segs.append("mlp.fc2")
        elif p == "ln_final":
            segs.append("text_model.final_layer_norm")
        else:
            segs.append(p)
    return ".".join(segs + [leaf_map[leaf]])


def split_packed_qkv(sd: dict, prefix: str = "") -> dict:
    """Split open_clip's packed attention projections
    (`...attn.in_proj_weight` [3W, W]) into attn_q/attn_k/attn_v entries the
    flax tree expects, and rename out_proj → attn.out."""
    import numpy as np

    out = dict(sd)
    for k in list(sd.keys()):
        if k.endswith("attn.in_proj_weight"):
            w = np.asarray(sd[k])
            w3 = w.shape[0] // 3
            base = k[: -len("in_proj_weight")]
            for i, name in enumerate(("q", "k", "v")):
                out[base + f"{name}.weight"] = w[i * w3 : (i + 1) * w3]
            del out[k]
        elif k.endswith("attn.in_proj_bias"):
            bvec = np.asarray(sd[k])
            w3 = bvec.shape[0] // 3
            base = k[: -len("in_proj_bias")]
            for i, name in enumerate(("q", "k", "v")):
                out[base + f"{name}.bias"] = bvec[i * w3 : (i + 1) * w3]
            del out[k]
        elif ".attn.out_proj." in k:
            out[k.replace(".attn.out_proj.", ".attn.out.")] = sd[k]
            del out[k]
    return out
