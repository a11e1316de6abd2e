"""Aux conditioner encoders vs torch/NumPy oracles
(sgm/modules/encoders/modules.py:207-234, 729-911)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.models.aux_encoders import (
    ClassEmbedder,
    LowScaleEncoder,
    SpatialRescaler,
    clip_t5_text_fn,
    identity_encoder,
)


def test_identity_and_class_embedder():
    x = jnp.arange(6.0).reshape(2, 3)
    assert (identity_encoder(x) == x).all()

    m = ClassEmbedder(embed_dim=16, n_classes=10, add_sequence_dim=True)
    c = jnp.asarray([1, 9])
    params = m.init(jax.random.PRNGKey(0), c)
    emb = m.apply(params, c)
    assert emb.shape == (2, 1, 16)
    uc = m.get_unconditional_class(2)
    assert uc.tolist() == [9, 9]


def test_spatial_rescaler_matches_torch_bilinear():
    torch = pytest.importorskip("torch")

    x = np.random.RandomState(0).rand(2, 8, 12, 3).astype(np.float32)
    m = SpatialRescaler(n_stages=2, method="bilinear", multiplier=0.5)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = m.apply(variables, jnp.asarray(x))

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for _ in range(2):
        t = torch.nn.functional.interpolate(t, scale_factor=0.5, mode="bilinear")
    want = t.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_spatial_rescaler_remap_and_video():
    x = jnp.ones((1, 2, 8, 8, 3))  # [b, t, h, w, c]
    m = SpatialRescaler(
        n_stages=1, multiplier=0.5, out_channels=5, wrap_video=True,
        kernel_size=3, remap_output=True,
    )
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 2, 4, 4, 5)
    assert np.isfinite(np.asarray(y)).all()


def test_low_scale_encoder_q_sample_oracle():
    """q_sample must match the reference's extract_into_tensor formula
    (modules.py:888-895) computed directly in NumPy float64."""
    enc = LowScaleEncoder(encode_fn=lambda x: x, out_size=None,
                          linear_start=1e-4, linear_end=2e-2, timesteps=50,
                          max_noise_level=20)
    rs = np.random.RandomState(1)
    z = rs.rand(3, 4, 4, 2).astype(np.float32)
    noise = rs.rand(3, 4, 4, 2).astype(np.float32)
    t = np.asarray([0, 7, 19])

    betas = np.linspace(1e-4**0.5, 2e-2**0.5, 50, dtype=np.float64) ** 2
    ac = np.cumprod(1.0 - betas)[t]
    want = (
        np.sqrt(ac)[:, None, None, None] * z
        + np.sqrt(1.0 - ac)[:, None, None, None] * noise
    )
    got = enc.q_sample(jnp.asarray(z), jnp.asarray(t), jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_low_scale_encoder_end_to_end():
    enc = LowScaleEncoder(
        encode_fn=lambda x: x[:, ::2, ::2, :1], out_size=6,
        scale_factor=0.5, max_noise_level=10, timesteps=100,
        decode_fn=lambda z: z,
    )
    x = jnp.ones((2, 8, 8, 3))
    z, lvl = enc(x, jax.random.PRNGKey(0))
    assert z.shape == (2, 6, 6, 1)
    assert lvl.shape == (2,) and (np.asarray(lvl) < 10).all()
    assert np.isfinite(np.asarray(z)).all()
    assert enc.decode(z).shape == z.shape


_T5_COND_YAML = """
model:
  target: sgm.models.diffusion.DiffusionEngine
  params:
    scale_factor: 0.18215
    denoiser_config:
      target: sgm.modules.diffusionmodules.denoiser.Denoiser
      params:
        scaling_config:
          target: sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling
    network_config:
      target: sgm.modules.diffusionmodules.openaimodel.UNetModel
      params:
        in_channels: 4
        out_channels: 4
        model_channels: 32
        attention_resolutions: [1]
        num_res_blocks: 1
        channel_mult: [1]
        num_head_channels: 16
        transformer_depth: 1
        context_dim: 16
    first_stage_config:
      target: sgm.models.autoencoder.AutoencoderKL
      params:
        embed_dim: 4
        ddconfig:
          double_z: true
          z_channels: 4
          in_channels: 3
          out_ch: 3
          ch: 16
          ch_mult: [1]
          num_res_blocks: 1
    conditioner_config:
      target: sgm.modules.GeneralConditioner
      params:
        emb_models:
          - is_trainable: False
            input_key: txt
            target: sgm.modules.encoders.modules.{EMB}
            params: {PARAMS}
"""


def _write_yaml(tmp_path, emb, params):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        _T5_COND_YAML.replace("{EMB}", emb).replace("{PARAMS}", params)
    )
    return str(p)


@pytest.mark.slow  # ~80 s full-pipeline build; T5 numerics covered by test_t5_parity
def test_build_pipeline_t5_conditioner(tmp_path):
    from vidseg_diffusion_tpu.engine.build import build_pipeline

    cfg = _write_yaml(
        tmp_path, "FrozenT5Embedder",
        "{t5_cfg: {vocab_size: 384, d_model: 16, d_kv: 4, num_heads: 4, "
        "d_ff: 32, num_layers: 2}}",
    )
    pipe = build_pipeline(cfg)
    assert pipe.conditioner is not None and pipe.conditioner.kind == "t5_text"

    from vidseg_diffusion_tpu.models.t5 import byt5_tokenize

    out = pipe.conditioner({"txt_t5_tokens": byt5_tokenize(["a", "bb"], 9)})
    assert out["crossattn"].shape == (2, 9, 16)
    assert np.isfinite(np.asarray(out["crossattn"])).all()


@pytest.mark.slow  # ~50 s full-pipeline build; embedder covered by test_identity_and_class_embedder
def test_build_pipeline_class_conditioner(tmp_path):
    from vidseg_diffusion_tpu.engine.build import build_pipeline

    cfg = _write_yaml(
        tmp_path, "ClassEmbedder",
        "{embed_dim: 16, n_classes: 7, add_sequence_dim: True}",
    )
    pipe = build_pipeline(cfg)
    assert pipe.conditioner is not None and pipe.conditioner.kind == "class"
    out = pipe.conditioner({"cls": jnp.asarray([0, 6])})
    assert out["crossattn"].shape == (2, 1, 16)


def test_clip_t5_pair_routes_as_tuple():
    from vidseg_diffusion_tpu.models.conditioner import Conditioner, EmbedderSpec

    fn = clip_t5_text_fn(
        lambda t: jnp.ones((t.shape[0], 7, 4)),
        lambda t: 2.0 * jnp.ones((t.shape[0], 7, 6)),
    )
    cond = Conditioner(
        embedders=(EmbedderSpec("txt_pair", fn, name="clip_t5"),)
    )
    out = cond({"txt_pair": (jnp.zeros((2, 5), jnp.int32),
                             jnp.zeros((2, 9), jnp.int32))})
    # concatenated on the crossattn feature axis like GeneralConditioner
    assert out["crossattn"].shape == (2, 7, 10)
    assert (np.asarray(out["crossattn"][..., :4]) == 1).all()
    assert (np.asarray(out["crossattn"][..., 4:]) == 2).all()
