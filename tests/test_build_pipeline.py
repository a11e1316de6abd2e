"""build_pipeline integration: assemble from a reference-format YAML plus a
synthetic reference-layout checkpoint (torch modules → prefixed state dict →
safetensors), then check the flax stack reproduces the torch forward."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # synthetic full-layout checkpoint roundtrip

from reference_compat import import_reference_unet, import_reference_vae  # noqa: E402
from vidseg_diffusion_tpu.engine.build import build_pipeline  # noqa: E402

TINY_SD_YAML = """
model:
  target: sgm.models.diffusion.DiffusionEngine
  params:
    scale_factor: 0.18215
    denoiser_config:
      target: sgm.modules.diffusionmodules.denoiser.DiscreteDenoiser
      params:
        num_idx: 1000
        scaling_config:
          target: sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling
        discretization_config:
          target: sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization
    network_config:
      target: sgm.modules.diffusionmodules.openaimodel.UNetModel
      params:
        in_channels: 4
        out_channels: 4
        model_channels: 32
        attention_resolutions: [2, 1]
        num_res_blocks: 1
        channel_mult: [1, 2]
        num_head_channels: 16
        transformer_depth: 1
        context_dim: 24
    first_stage_config:
      target: sgm.models.autoencoder.AutoencoderKL
      params:
        embed_dim: 4
        ddconfig:
          double_z: true
          z_channels: 4
          in_channels: 3
          out_ch: 3
          ch: 32
          ch_mult: [1, 2]
          num_res_blocks: 1
    sampler_config:
      target: sgm.modules.diffusionmodules.sampling.EulerEDMSampler
      params:
        discretization_config:
          target: sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization
        guider_config:
          target: sgm.modules.diffusionmodules.guiders.VanillaCFG
          params: {scale: 5}
        num_steps: 8
"""


@pytest.fixture(scope="module")
def synthetic_ckpt(tmp_path_factory):
    """Reference-layout checkpoint: model.diffusion_model.* +
    first_stage_model.{encoder,decoder,quant_conv,post_quant_conv}.*"""
    RefUNet = import_reference_unet()
    RefEncoder, RefDecoder = import_reference_vae()
    torch.manual_seed(0)
    unet = RefUNet(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=[2, 1], channel_mult=[1, 2], num_head_channels=16,
        transformer_depth=1, context_dim=24, use_linear_in_transformer=True,
        use_checkpoint=False,
    ).eval()
    dd = dict(ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[], dropout=0.0, in_channels=3, resolution=32,
              z_channels=4, double_z=True, attn_type="vanilla")
    enc = RefEncoder(**dd).eval()
    dec = RefDecoder(**dd).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)

    sd = {}
    for prefix, mod in (
        ("model.diffusion_model.", unet),
        ("first_stage_model.encoder.", enc),
        ("first_stage_model.decoder.", dec),
        ("first_stage_model.quant_conv.", quant),
        ("first_stage_model.post_quant_conv.", post_quant),
    ):
        for k, v in mod.state_dict().items():
            sd[prefix + k] = v.detach().numpy()

    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp("ckpt") / "tiny_sd.safetensors"
    save_file(sd, str(path))
    return str(path), unet, enc, dec, quant, post_quant


def test_build_pipeline_from_checkpoint(tmp_path, synthetic_ckpt):
    ckpt_path, ref_unet, ref_enc, ref_dec, quant, post_quant = synthetic_ckpt
    cfg_path = tmp_path / "tiny_sd.yaml"
    cfg_path.write_text(TINY_SD_YAML)

    pipeline = build_pipeline(str(cfg_path), ckpt_path=ckpt_path, num_steps=8)

    # UNet forward parity
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    ts = np.array([3.0, 9.0], np.float32)
    ctx = rng.randn(2, 7, 24).astype(np.float32)
    with torch.no_grad():
        out_ref = ref_unet(
            torch.from_numpy(x), torch.from_numpy(ts), torch.from_numpy(ctx)
        ).numpy()
    out = pipeline.unet.apply(
        {"params": pipeline.unet_params},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ts), jnp.asarray(ctx),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), out_ref, atol=2e-4, rtol=1e-3
    )

    # first-stage encode parity (mode path through quant_conv)
    img = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        moments = quant(ref_enc(torch.from_numpy(img)))
        mean = moments[:, :4]
        z_ref = (0.18215 * mean).numpy()
    z = pipeline.first_stage.encode(jnp.asarray(img.transpose(0, 2, 3, 1)), rng=None)
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 3, 1, 2), z_ref, atol=2e-4, rtol=1e-3
    )

    # decode parity (post_quant_conv + decoder)
    zq = rng.randn(1, 4, 4, 4).astype(np.float32)
    with torch.no_grad():
        x_ref = ref_dec(post_quant(torch.from_numpy(zq / 0.18215))).numpy()
    xd = pipeline.first_stage.decode(jnp.asarray(zq.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(xd).transpose(0, 3, 1, 2), x_ref, atol=3e-4, rtol=1e-3
    )
