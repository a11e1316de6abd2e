"""CLIP converter validation against executable torch replicas.

Builds tiny torch towers with the exact open_clip module/state-dict schema
(TextTransformer / VisionTransformer with packed-qkv nn.MultiheadAttention,
open_clip/model.py naming) and HuggingFace's real CLIPTextModel, converts
their state dicts with the production key fns, and asserts end-to-end
numerical agreement — the checkpoint-free test for the packed-QKV /
transpose risk class (reference embedders: sgm/modules/encoders/modules.py
:330-496 (SDXL CLIP-L + bigG), :498-566 (SD 2.1), :570-728 (SVD image))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from vidseg_diffusion_tpu.models.clip import (  # noqa: E402
    CLIPTextConfig,
    CLIPTextTransformer,
    CLIPVisionConfig,
    CLIPVisionTransformer,
    clip_text_key_fn,
    clip_vision_key_fn,
    hf_clip_text_key_fn,
    split_packed_qkv,
)
from vidseg_diffusion_tpu.io.checkpoint import convert_state_dict  # noqa: E402

WIDTH, HEADS, LAYERS, VOCAB, CTX = 32, 4, 3, 50, 11


class _Block(nn.Module):
    """open_clip ResidualAttentionBlock schema: ln_1, attn (packed qkv),
    ln_2, mlp.c_fc/c_proj."""

    def __init__(self, width, heads, act):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width)
        self.attn = nn.MultiheadAttention(width, heads)
        self.ln_2 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
        self.mlp.add_module("gelu", act())
        self.mlp.add_module("c_proj", nn.Linear(width * 4, width))

    def forward(self, x, attn_mask=None):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class _Transformer(nn.Module):
    def __init__(self, width, heads, layers, act=nn.GELU):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [_Block(width, heads, act) for _ in range(layers)]
        )


class TorchOpenClipText(nn.Module):
    """open_clip TextTransformer schema (token_embedding, positional_embedding,
    transformer.resblocks, ln_final, text_projection)."""

    def __init__(self, vocab=VOCAB, width=WIDTH, heads=HEADS, layers=LAYERS, ctx=CTX):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, width)
        self.positional_embedding = nn.Parameter(torch.randn(ctx, width) * 0.01)
        self.transformer = _Transformer(width, heads, layers)
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(torch.randn(width, width) * 0.02)
        mask = torch.full((ctx, ctx), float("-inf")).triu(1)
        self.register_buffer("attn_mask", mask, persistent=False)

    def forward(self, tokens, penultimate=True, return_pooled=False):
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)  # NLD -> LND (open_clip layout)
        pen = None
        for i, blk in enumerate(self.transformer.resblocks):
            if i == len(self.transformer.resblocks) - 1:
                pen = x.permute(1, 0, 2)
            x = blk(x, attn_mask=self.attn_mask)
        last = x.permute(1, 0, 2)
        if return_pooled:
            # FrozenOpenCLIPEmbedder2 legacy=False (modules.py:456-474)
            o = self.ln_final(last)
            pooled = o[torch.arange(o.shape[0]), tokens.argmax(dim=-1)] @ self.text_projection
            return pen, pooled
        h = pen if penultimate else last
        return self.ln_final(h)


class TorchOpenClipVision(nn.Module):
    """open_clip VisionTransformer schema (conv1, class_embedding,
    positional_embedding, ln_pre, transformer.resblocks, ln_post, proj)."""

    def __init__(self, image_size=28, patch=14, width=WIDTH, heads=HEADS,
                 layers=2, output_dim=16):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, patch, stride=patch, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(width) * 0.02)
        grid = (image_size // patch) ** 2
        self.positional_embedding = nn.Parameter(torch.randn(grid + 1, width) * 0.01)
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = _Transformer(width, heads, layers)
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(torch.randn(width, output_dim) * 0.02)

    def forward(self, x):  # x NCHW
        x = self.conv1(x)
        b, c, gh, gw = x.shape
        x = x.reshape(b, c, gh * gw).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(b, 1, c)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x).permute(1, 0, 2)
        for blk in self.transformer.resblocks:
            x = blk(x)
        x = x.permute(1, 0, 2)
        return self.ln_post(x[:, 0]) @ self.proj


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.RandomState(3)
    t = rng.randint(1, VOCAB - 1, (2, CTX))
    t[:, -1] = VOCAB - 1  # highest id last → argmax pooling hits it
    return t


class TestOpenClipTextParity:
    def test_penultimate(self, tokens):
        torch.manual_seed(0)
        ref = TorchOpenClipText().eval()
        with torch.no_grad():
            want = ref(torch.from_numpy(tokens), penultimate=True).numpy()

        cfg = CLIPTextConfig(
            vocab_size=VOCAB, width=WIDTH, heads=HEADS, layers=LAYERS,
            context_length=CTX,
        )
        model = CLIPTextTransformer(cfg, penultimate=True)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
        )["params"]
        params, unused = convert_state_dict(
            shapes, split_packed_qkv(_sd(ref)), clip_text_key_fn
        )
        assert all(
            f"resblocks.{LAYERS-1}." in k or k == "text_projection" for k in unused
        ), unused
        got = np.asarray(model.apply({"params": params}, jnp.asarray(tokens)))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_pooled_bigg_variant(self, tokens):
        torch.manual_seed(1)
        ref = TorchOpenClipText().eval()
        with torch.no_grad():
            want_pen, want_pooled = ref(torch.from_numpy(tokens), return_pooled=True)

        cfg = CLIPTextConfig(
            vocab_size=VOCAB, width=WIDTH, heads=HEADS, layers=LAYERS,
            context_length=CTX,
        )
        model = CLIPTextTransformer(
            cfg, penultimate=True, final_ln=False, return_pooled=True
        )
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
        )["params"]
        params, unused = convert_state_dict(
            shapes, split_packed_qkv(_sd(ref)), clip_text_key_fn
        )
        assert not unused, unused  # pooled variant consumes every key
        pen, pooled = model.apply({"params": params}, jnp.asarray(tokens))
        np.testing.assert_allclose(np.asarray(pen), want_pen.numpy(), atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(pooled), want_pooled.numpy(), atol=2e-5, rtol=1e-4)


class TestOpenClipVisionParity:
    def test_pooled_image_embedding(self):
        torch.manual_seed(2)
        ref = TorchOpenClipVision().eval()
        rng = np.random.RandomState(0)
        img = rng.randn(2, 28, 28, 3).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()

        cfg = CLIPVisionConfig(
            image_size=28, patch_size=14, width=WIDTH, heads=HEADS,
            layers=2, output_dim=16,
        )
        model = CLIPVisionTransformer(cfg)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(img))
        )["params"]
        sd = {("visual." + k): v for k, v in split_packed_qkv(_sd(ref)).items()}
        params, unused = convert_state_dict(shapes, sd, clip_vision_key_fn)
        assert not unused, unused
        got = np.asarray(model.apply({"params": params}, jnp.asarray(img)))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


class TestHFClipTextParity:
    def test_hidden_layer_11_semantics(self, tokens):
        """Our quick-gelu penultimate tower == HF CLIPTextModel
        hidden_states[num_layers - 1] (FrozenCLIPEmbedder layer='hidden',
        layer_idx=11 on the 12-layer CLIP-L; modules.py:376-386)."""
        transformers = pytest.importorskip("transformers")
        hf_cfg = transformers.CLIPTextConfig(
            vocab_size=VOCAB, hidden_size=WIDTH, num_attention_heads=HEADS,
            num_hidden_layers=LAYERS, intermediate_size=WIDTH * 4,
            max_position_embeddings=CTX, hidden_act="quick_gelu",
        )
        torch.manual_seed(4)
        ref = transformers.CLIPTextModel(hf_cfg).eval()
        with torch.no_grad():
            out = ref(
                input_ids=torch.from_numpy(tokens), output_hidden_states=True
            )
        want = out.hidden_states[LAYERS - 1].numpy()  # penultimate, no final LN

        cfg = CLIPTextConfig(
            vocab_size=VOCAB, width=WIDTH, heads=HEADS, layers=LAYERS,
            context_length=CTX, act="quick_gelu",
        )
        model = CLIPTextTransformer(cfg, penultimate=True, final_ln=False)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
        )["params"]
        params, unused = convert_state_dict(shapes, _sd(ref), hf_clip_text_key_fn)
        got = np.asarray(model.apply({"params": params}, jnp.asarray(tokens)))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
