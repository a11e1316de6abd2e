"""T5 / ByT5 text-encoder tower (flax).

Counterpart of the reference's FrozenT5Embedder / FrozenByT5Embedder
(sgm/modules/encoders/modules.py:249-328), which wrap HF
``T5EncoderModel``. Unused by every shipped VidSeg config (SURVEY §2.4),
implemented for full conditioner parity: the architecture mirrors HF's
encoder stack 1:1 so a ``google/t5-v1_1-*`` / ``google/byt5-*`` checkpoint
converts exactly (see ``t5_key_fn`` + ``io.checkpoint.convert_state_dict``;
validated against the torch ``T5EncoderModel`` in
``tests/test_t5_parity.py``).

T5-specific quirks preserved:
- RMS LayerNorm with fp32 variance and NO mean subtraction / bias,
- NO 1/sqrt(d_kv) attention scaling (folded into init upstream),
- a single learned relative-position-bucket bias table, owned by block 0
  and shared by every layer,
- v1.1 gated-GELU FFN (``wi_0 * gelu_new`` gate) vs legacy ReLU ``wi``.
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128       # byt5: 384
    d_model: int = 512
    d_kv: int = 64
    num_heads: int = 8
    d_ff: int = 1024
    num_layers: int = 6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    feed_forward_proj: str = "gated-gelu"  # | "relu" (legacy t5)
    layer_norm_epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32


class T5RMSNorm(nn.Module):
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)).astype(
            self.dtype
        )
        return scale.astype(self.dtype) * x


def relative_position_bucket(
    relative_position: jax.Array,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jax.Array:
    """Bidirectional log-bucketed relative positions (HF
    T5Attention._relative_position_bucket semantics)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class _T5Block(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, x: jax.Array, position_bias: jax.Array) -> jax.Array:
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        b, l, _ = x.shape

        h = T5RMSNorm(cfg.layer_norm_epsilon, cfg.dtype, name="ln_attn")(x)
        q = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="attn_q")(h)
        k = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="attn_k")(h)
        v = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="attn_v")(h)

        def split(t):
            return t.reshape(b, l, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

        # T5: un-scaled logits + shared relative-position bias; seqs are
        # short (77) so the explicit fused softmax is the right TPU lowering
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k),
            preferred_element_type=jnp.float32,
        ) + position_bias.astype(jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        x = x + nn.Dense(
            cfg.d_model, use_bias=False, dtype=cfg.dtype, name="attn_o"
        )(out)

        h = T5RMSNorm(cfg.layer_norm_epsilon, cfg.dtype, name="ln_ff")(x)
        if cfg.feed_forward_proj == "gated-gelu":
            g = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi_0")(h)
            u = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi_1")(h)
            h = nn.gelu(g, approximate=True) * u  # gelu_new gate
        else:
            h = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi")(h)
            h = nn.relu(h)
        h = nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype, name="wo")(h)
        return x + h


class T5Encoder(nn.Module):
    """Encoder stack; returns the final-normed hidden states
    [b, l, d_model] (= HF ``last_hidden_state``, the value
    FrozenT5Embedder.forward returns, modules.py:279-283)."""

    config: T5Config

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        cfg = self.config
        emb = self.param(
            "token_embedding",
            nn.initializers.normal(1.0),
            (cfg.vocab_size, cfg.d_model),
        )
        x = emb[tokens].astype(cfg.dtype)

        l = tokens.shape[-1]
        pos = jnp.arange(l)
        rel = pos[None, :] - pos[:, None]  # memory - context
        buckets = relative_position_bucket(
            rel,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
        bias_table = nn.Embed(
            cfg.relative_attention_num_buckets,
            cfg.num_heads,
            name="rel_bias",
        )(buckets)  # [l, l, heads] — block 0 owns it, all layers share
        position_bias = bias_table.transpose(2, 0, 1)[None]

        for i in range(cfg.num_layers):
            x = _T5Block(cfg, name=f"block_{i}")(x, position_bias)
        return T5RMSNorm(cfg.layer_norm_epsilon, cfg.dtype, name="ln_final")(x)


_T5_SUB = {
    "attn_q": "layer.0.SelfAttention.q",
    "attn_k": "layer.0.SelfAttention.k",
    "attn_v": "layer.0.SelfAttention.v",
    "attn_o": "layer.0.SelfAttention.o",
    "ln_attn": "layer.0.layer_norm",
    "wi": "layer.1.DenseReluDense.wi",
    "wi_0": "layer.1.DenseReluDense.wi_0",
    "wi_1": "layer.1.DenseReluDense.wi_1",
    "wo": "layer.1.DenseReluDense.wo",
    "ln_ff": "layer.1.layer_norm",
}


def t5_key_fn(path: Tuple[str, ...]) -> str:
    """Flax param path → HF T5EncoderModel state_dict key."""
    name = path[0]
    if name == "token_embedding":
        return "shared.weight"
    if name == "rel_bias":
        return "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    if name == "ln_final":
        return "encoder.final_layer_norm.weight"
    m = re.match(r"block_(\d+)$", name)
    if m:
        return f"encoder.block.{m.group(1)}.{_T5_SUB[path[1]]}.weight"
    raise KeyError(f"unmapped T5 path {path}")


def t5_config_from_state_dict(sd, dtype=jnp.float32) -> "T5Config":
    """Infer a T5Config from an HF ``T5EncoderModel`` state dict — the
    reference YAMLs carry only the HF version string (modules.py:252-255),
    so the architecture must come from the checkpoint itself.
    ``max_distance`` is not recoverable from shapes; every released
    t5/byt5 checkpoint uses 128."""
    import numpy as np

    vocab, d_model = np.asarray(sd["shared.weight"]).shape
    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"encoder\.block\.(\d+)\.", k))
    )
    inner = np.asarray(sd["encoder.block.0.layer.0.SelfAttention.q.weight"]).shape[0]
    num_buckets, num_heads = np.asarray(
        sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
    ).shape
    gated = "encoder.block.0.layer.1.DenseReluDense.wi_0.weight" in sd
    ff_key = "wi_0" if gated else "wi"
    d_ff = np.asarray(
        sd[f"encoder.block.0.layer.1.DenseReluDense.{ff_key}.weight"]
    ).shape[0]
    return T5Config(
        vocab_size=vocab,
        d_model=d_model,
        d_kv=inner // num_heads,
        num_heads=num_heads,
        d_ff=d_ff,
        num_layers=n_layers,
        relative_attention_num_buckets=num_buckets,
        feed_forward_proj="gated-gelu" if gated else "relu",
        dtype=dtype,
    )


def byt5_tokenize(
    texts, max_length: int = 77, pad_id: int = 0, eos_id: int = 1
) -> jax.Array:
    """ByT5 byte-level tokenizer (HF ByT5Tokenizer semantics: utf-8 bytes
    shifted by 3 special ids, EOS appended, truncated+padded to
    max_length). No vocab file needed — this is the whole tokenizer."""
    import numpy as np

    if isinstance(texts, str):
        texts = [texts]
    out = np.full((len(texts), max_length), pad_id, dtype=np.int32)
    for i, t in enumerate(texts):
        ids = [b + 3 for b in t.encode("utf-8")][: max_length - 1] + [eos_id]
        out[i, : len(ids)] = ids
    return jnp.asarray(out)


def t5_tokenize(
    texts,
    sp_model_path: str,
    max_length: int = 77,
) -> jax.Array:
    """SentencePiece T5 tokenization. Needs the ``sentencepiece`` package +
    a ``spiece.model`` file (neither is bundled); gate with a clear error —
    pre-tokenized ids can always be fed to ``T5Encoder`` directly."""
    try:
        import sentencepiece as spm  # noqa
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "t5_tokenize needs the `sentencepiece` package (not bundled); "
            "pass pre-tokenized ids to T5Encoder instead, or use "
            "byt5_tokenize which is vocab-free"
        ) from e
    import numpy as np

    sp = spm.SentencePieceProcessor(model_file=sp_model_path)
    if isinstance(texts, str):
        texts = [texts]
    out = np.zeros((len(texts), max_length), dtype=np.int32)
    for i, t in enumerate(texts):
        ids = sp.encode(t)[: max_length - 1] + [sp.eos_id()]
        out[i, : len(ids)] = ids
    return jnp.asarray(out)
