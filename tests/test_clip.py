"""CLIP towers: numerics vs an independent numpy forward, and converter key
mapping against synthetic open_clip-style state dicts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextTransformer,
    CLIPVisionConfig,
    CLIPVisionTransformer,
    clip_preprocess,
    clip_text_key_fn,
    clip_vision_key_fn,
    split_packed_qkv,
)
from vidseg_diffusion_tpu.io.checkpoint import convert_state_dict


def _np_layer_norm(x, g, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def _np_attn(x, wq, bq, wk, bk, wv, bv, wo, bo, heads, causal):
    b, l, d = x.shape
    dh = d // heads
    q = x @ wq.T + bq
    k = x @ wk.T + bk
    v = x @ wv.T + bv

    def split(t):
        return t.reshape(b, l, heads, dh).transpose(0, 2, 1, 3)

    qs, ks, vs = split(q), split(k), split(v)
    logits = qs @ ks.transpose(0, 1, 3, 2) / np.sqrt(dh)
    if causal:
        mask = np.tril(np.ones((l, l), bool))
        logits = np.where(mask, logits, -1e30)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    out = (w @ vs).transpose(0, 2, 1, 3).reshape(b, l, d)
    return out @ wo.T + bo


def _np_gelu(x):
    from scipy.stats import norm

    return x * norm.cdf(x)


def _make_open_clip_text_sd(rng, layers, width, vocab, ctx):
    """Synthetic state dict with the exact open_clip text-tower key schema."""
    sd = {}
    sd["token_embedding.weight"] = rng.randn(vocab, width).astype(np.float32) * 0.02
    sd["positional_embedding"] = rng.randn(ctx, width).astype(np.float32) * 0.01
    for i in range(layers):
        p = f"transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = rng.rand(width).astype(np.float32) + 0.5
        sd[p + "ln_1.bias"] = rng.randn(width).astype(np.float32) * 0.1
        sd[p + "attn.in_proj_weight"] = rng.randn(3 * width, width).astype(np.float32) * 0.05
        sd[p + "attn.in_proj_bias"] = rng.randn(3 * width).astype(np.float32) * 0.05
        sd[p + "attn.out_proj.weight"] = rng.randn(width, width).astype(np.float32) * 0.05
        sd[p + "attn.out_proj.bias"] = rng.randn(width).astype(np.float32) * 0.05
        sd[p + "ln_2.weight"] = rng.rand(width).astype(np.float32) + 0.5
        sd[p + "ln_2.bias"] = rng.randn(width).astype(np.float32) * 0.1
        sd[p + "mlp.c_fc.weight"] = rng.randn(4 * width, width).astype(np.float32) * 0.05
        sd[p + "mlp.c_fc.bias"] = rng.randn(4 * width).astype(np.float32) * 0.05
        sd[p + "mlp.c_proj.weight"] = rng.randn(width, 4 * width).astype(np.float32) * 0.05
        sd[p + "mlp.c_proj.bias"] = rng.randn(width).astype(np.float32) * 0.05
    sd["ln_final.weight"] = rng.rand(width).astype(np.float32) + 0.5
    sd["ln_final.bias"] = rng.randn(width).astype(np.float32) * 0.1
    return sd


def _np_text_forward(sd, tokens, layers, width, heads, penultimate=True):
    x = sd["token_embedding.weight"][tokens] + sd["positional_embedding"][None]
    n = layers - (1 if penultimate else 0)
    for i in range(n):
        p = f"transformer.resblocks.{i}."
        w = sd[p + "attn.in_proj_weight"]
        b = sd[p + "attn.in_proj_bias"]
        wq, wk, wv = np.split(w, 3, axis=0)
        bq, bk, bv = np.split(b, 3, axis=0)
        h = _np_layer_norm(x, sd[p + "ln_1.weight"], sd[p + "ln_1.bias"])
        x = x + _np_attn(
            h, wq, bq, wk, bk, wv, bv,
            sd[p + "attn.out_proj.weight"], sd[p + "attn.out_proj.bias"],
            heads, causal=True,
        )
        h = _np_layer_norm(x, sd[p + "ln_2.weight"], sd[p + "ln_2.bias"])
        h = h @ sd[p + "mlp.c_fc.weight"].T + sd[p + "mlp.c_fc.bias"]
        h = _np_gelu(h)
        h = h @ sd[p + "mlp.c_proj.weight"].T + sd[p + "mlp.c_proj.bias"]
        x = x + h
    return _np_layer_norm(x, sd["ln_final.weight"], sd["ln_final.bias"])


class TestTextTower:
    def test_matches_numpy_reference_after_conversion(self):
        pytest.importorskip("scipy")
        rng = np.random.RandomState(0)
        layers, width, heads, vocab, ctx = 3, 32, 4, 50, 11
        sd = _make_open_clip_text_sd(rng, layers, width, vocab, ctx)
        cfg = CLIPTextConfig(
            vocab_size=vocab, width=width, heads=heads, layers=layers,
            context_length=ctx,
        )
        model = CLIPTextTransformer(cfg, penultimate=True)
        tokens = rng.randint(0, vocab, (2, ctx))
        init = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens))["params"]
        params, unused = convert_state_dict(
            init, split_packed_qkv(sd), clip_text_key_fn
        )
        # only the skipped last block's params stay unused
        assert all(f"resblocks.{layers-1}." in k for k in unused), unused
        got = np.asarray(model.apply({"params": params}, jnp.asarray(tokens)))
        expected = _np_text_forward(sd, tokens, layers, width, heads)
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


class TestVisionTower:
    def test_shapes_and_key_mapping(self):
        cfg = CLIPVisionConfig(
            image_size=28, patch_size=14, width=32, heads=4, layers=2, output_dim=16
        )
        model = CLIPVisionTransformer(cfg)
        x = jnp.zeros((2, 28, 28, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        out = model.apply({"params": params}, x)
        assert out.shape == (2, 16)
        # every flax leaf must map to a visual.-prefixed open_clip key
        from flax import traverse_util

        for path in traverse_util.flatten_dict(params):
            key = clip_vision_key_fn(path)
            assert key.startswith("visual."), (path, key)

    def test_preprocess_range(self):
        x = jnp.zeros((1, 64, 48, 3))  # mid-gray in [-1,1] space
        out = clip_preprocess(x)
        assert out.shape == (1, 224, 224, 3)
        # (0.5 - mean)/std for mid-gray
        np.testing.assert_allclose(
            np.asarray(out[0, 0, 0]),
            (0.5 - np.array([0.48145466, 0.4578275, 0.40821073]))
            / np.array([0.26862954, 0.26130258, 0.27577711]),
            rtol=1e-4,
        )
