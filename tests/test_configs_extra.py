"""Config-surface completeness: every reference inference YAML must parse —
both our vendored counterparts and the reference's own files unchanged
(config.py's contract). Covers the three round-3 additions: sd_2_1_768
(VScaling v-prediction), sd_xl_refiner (bigG-only conditioner, per-level
context_dim list, aesthetic embedder), svd_image_decoder (plain image VAE
under the video UNet)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.config import load_model_spec
from vidseg_diffusion_tpu.diffusion import VScaling

REF = "/root/reference/configs/inference"


class TestVendoredConfigs:
    def test_sd_2_1_768(self):
        spec = load_model_spec("configs/inference/sd_2_1_768.yaml")
        assert isinstance(spec.denoiser.scaling, VScaling)
        assert spec.unet_config.model_channels == 320
        assert spec.sampler is not None

    def test_sd_xl_refiner(self):
        spec = load_model_spec("configs/inference/sd_xl_refiner.yaml")
        u = spec.unet_config
        assert u.model_channels == 384
        assert u.channel_mult == (1, 2, 4, 4)
        assert u.transformer_depth == 4
        assert u.context_dim == 1280  # [1280]*4 collapses to the scalar
        assert u.adm_in_channels == 2560
        emb = spec.conditioner_node["params"]["emb_models"]
        keys = [e["input_key"] for e in emb]
        assert keys == [
            "txt", "original_size_as_tuple", "crop_coords_top_left",
            "aesthetic_score",
        ]

    def test_svd_image_decoder(self):
        spec = load_model_spec("configs/inference/svd_image_decoder.yaml", num_frames=14)
        assert spec.unet_config.video
        assert not spec.vae_config.video_decoder  # the point of the variant
        assert spec.vae_config.ch_mult == (1, 2, 4, 4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")
class TestReferenceYamlsParseUnchanged:
    """Every YAML the reference ships loads through load_model_spec as-is
    (sampler_config absent in four of them -> spec.sampler is None, matching
    DiffusionEngine's Optional sampler, models/diffusion.py:40)."""

    @pytest.mark.parametrize(
        "name", ["sd_2_1", "sd_2_1_768", "sd_xl_base", "sd_xl_refiner",
                 "svd", "svd_image_decoder"],
    )
    def test_parses(self, name):
        spec = load_model_spec(f"{REF}/{name}.yaml", num_frames=14)
        assert spec.unet_config.model_channels in (320, 384)

    def test_refiner_context_dim_list(self):
        spec = load_model_spec(f"{REF}/sd_xl_refiner.yaml")
        assert spec.unet_config.context_dim == 1280

    def test_no_sampler_yamls_yield_none(self):
        for name in ("sd_2_1_768", "sd_xl_base", "sd_xl_refiner",
                     "svd_image_decoder"):
            spec = load_model_spec(f"{REF}/{name}.yaml", num_frames=14)
            assert spec.sampler is None and spec.guider is None


def test_nonuniform_context_dim_rejected(tmp_path):
    import yaml

    cfg = yaml.safe_load(open("configs/inference/sd_xl_refiner.yaml"))
    p = cfg["model"]["params"]["network_config"]["params"]
    p["context_dim"] = [1280, 640, 1280, 1280]
    f = tmp_path / "bad.yaml"
    f.write_text(yaml.dump(cfg))
    with pytest.raises(ValueError, match="non-uniform"):
        load_model_spec(str(f))


class TestRefinerConditioner:
    def test_routing_widths(self):
        """bigG hidden -> crossattn 1280-analog; vector = pooled + orig +
        crop + aesthetic (sd_xl_refiner.yaml adm_in_channels 2560 contract,
        scaled down)."""
        from vidseg_diffusion_tpu.models.conditioner import (
            build_sdxl_refiner_conditioner,
        )

        W = 48

        def clip_g(tokens):
            b = tokens.shape[0]
            return (jnp.ones((b, 77, W)), jnp.ones((b, W)))

        cond = build_sdxl_refiner_conditioner(clip_g, size_outdim=16)
        assert cond.kind == "sdxl_refiner"
        batch = {
            "txt_tokens": jnp.zeros((2, 77), jnp.int32),
            "original_size_as_tuple": jnp.array([[64.0, 64.0]] * 2),
            "crop_coords_top_left": jnp.zeros((2, 2)),
            "aesthetic_score": jnp.full((2, 1), 6.0),
        }
        out = cond(batch)
        assert out["crossattn"].shape == (2, 77, W)
        assert out["vector"].shape == (2, W + 2 * 16 + 2 * 16 + 16)

    @pytest.mark.slow  # ~1 min tiny-pipeline compile; routing test above stays default
    def test_build_pipeline_refiner_tiny(self):
        from vidseg_diffusion_tpu.engine.build import build_pipeline

        p = build_pipeline("configs/inference/sd_xl_refiner_tiny.yaml")
        assert p.conditioner is not None
        assert p.conditioner.kind == "sdxl_refiner"
        assert p.unet.config.adm_in_channels == 128
