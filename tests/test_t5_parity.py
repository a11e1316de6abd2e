"""T5 encoder validation against HF's real torch T5EncoderModel.

Tiny random-weight configs (gated-gelu v1.1 schema AND legacy relu), state
dicts converted with the production ``t5_key_fn``, forward outputs compared
end-to-end — the checkpoint-free proof that a real google/t5-v1_1-* or
google/byt5-* checkpoint would load and agree (reference embedders:
sgm/modules/encoders/modules.py:249-328)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vidseg_diffusion_tpu.io.checkpoint import convert_state_dict  # noqa: E402
from vidseg_diffusion_tpu.models.t5 import (  # noqa: E402
    T5Config,
    T5Encoder,
    byt5_tokenize,
    t5_key_fn,
)


def _build_pair(ff_proj: str, seed: int = 0):
    hf_cfg = transformers.T5Config(
        vocab_size=384,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=3,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj=ff_proj,
        dropout_rate=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(seed)
    ref = transformers.T5EncoderModel(hf_cfg).eval()

    cfg = T5Config(
        vocab_size=384,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=3,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu" if ff_proj == "gated-gelu" else "relu",
    )
    model = T5Encoder(cfg)
    tokens = byt5_tokenize(["a swan swims", "x"], max_length=13)
    init = model.init(jax.random.PRNGKey(0), tokens)["params"]
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, unused = convert_state_dict(init, sd, t5_key_fn)
    # every encoder weight must be consumed (embed_tokens aliases shared)
    assert all(u.startswith("encoder.embed_tokens") for u in unused), unused
    return model, params, ref, tokens


import jax  # noqa: E402


@pytest.mark.parametrize("ff_proj", ["gated-gelu", "relu"])
def test_t5_encoder_matches_hf(ff_proj):
    model, params, ref, tokens = _build_pair(ff_proj)
    got = model.apply({"params": params}, tokens)
    with torch.no_grad():
        want = ref(input_ids=torch.from_numpy(np.asarray(tokens))).last_hidden_state
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=2e-4, rtol=1e-3
    )


def test_t5_config_inference_from_state_dict():
    from vidseg_diffusion_tpu.models.t5 import t5_config_from_state_dict

    _, _, ref, _ = _build_pair("gated-gelu")
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = t5_config_from_state_dict(sd)
    assert (cfg.vocab_size, cfg.d_model, cfg.d_kv, cfg.num_heads) == (384, 32, 8, 4)
    assert (cfg.d_ff, cfg.num_layers) == (64, 3)
    assert cfg.relative_attention_num_buckets == 8
    assert cfg.feed_forward_proj == "gated-gelu"

    _, _, ref_relu, _ = _build_pair("relu")
    sd = {k: v.detach().numpy() for k, v in ref_relu.state_dict().items()}
    assert t5_config_from_state_dict(sd).feed_forward_proj == "relu"


def test_byt5_tokenize_matches_hf_semantics():
    # HF ByT5Tokenizer = utf-8 bytes + 3, eos=1, pad=0
    toks = np.asarray(byt5_tokenize("hi✓", max_length=10))
    raw = list("hi✓".encode("utf-8"))
    assert toks[0, : len(raw)].tolist() == [b + 3 for b in raw]
    assert toks[0, len(raw)] == 1
    assert (toks[0, len(raw) + 1 :] == 0).all()
    # truncation keeps room for EOS
    t2 = np.asarray(byt5_tokenize("abcdefgh", max_length=5))
    assert t2[0].tolist() == [ord("a") + 3, ord("b") + 3, ord("c") + 3,
                              ord("d") + 3, 1]


def test_bucket_fn_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention
    from vidseg_diffusion_tpu.models.t5 import relative_position_bucket

    pos = torch.arange(29)
    rel = pos[None, :] - pos[:, None]
    want = T5Attention._relative_position_bucket(
        rel, bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    got = np.asarray(relative_position_bucket(jnp.asarray(rel.numpy()), 32, 128))
    np.testing.assert_array_equal(got, want)
