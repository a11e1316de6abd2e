"""modulated_runs_host_chunked ≡ modulated_runs_batched (same runs grid,
different dispatch granularity)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from vidseg_diffusion_tpu.diffusion import (
    Denoiser,
    EDMDiscretization,
    LinearPredictionGuider,
    VScalingWithEDMcNoise,
)
from vidseg_diffusion_tpu.diffusion.sampling import EulerEDMSampler
from vidseg_diffusion_tpu.engine.modulation import ModulationConfig
from vidseg_diffusion_tpu.engine.vidseg import VidSegEngine, svd_harvest_spec
from vidseg_diffusion_tpu.models.unet import UNetConfig, UNetModel

T, H, W = 2, 8, 8
STEPS, TS = 4, 2


def test_host_chunked_equals_batched():
    cfg = UNetConfig(
        in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1,), num_head_channels=16,
        context_dim=16, adm_in_channels=8, video=True,
    )
    unet = UNetModel(cfg)
    x0 = jnp.zeros((2 * T, H, W, 8))
    params = unet.init(
        jax.random.PRNGKey(0), x0, jnp.zeros((2 * T,)),
        jnp.zeros((2 * T, 1, 16)), jnp.zeros((2 * T, 8)),
        num_video_frames=T, image_only_indicator=jnp.zeros((2, T)),
    )["params"]

    _, _, out_layout = cfg.block_layout()
    mod_block = max(i for i, s in enumerate(out_layout) if s.get("attn"))
    engine = VidSegEngine(
        unet=unet,
        denoiser=Denoiser(scaling=VScalingWithEDMcNoise()),
        sampler=EulerEDMSampler(
            discretization=EDMDiscretization(sigma_max=700.0), num_steps=STEPS
        ),
        guider=LinearPredictionGuider(max_scale=2.5, num_frames=T),
        mod_cfg=ModulationConfig(
            modulate_block_idx=(mod_block,), modulate_timestep=(TS,),
            num_steps=STEPS, num_frames=T,
            modulate_layer_type=("spatial",), modulate_attn_type=("self_attn",),
            is_latent_blending=True, is_injected_features=False,
        ),
        harvest=svd_harvest_spec(cluster_blocks=()),
    )

    rng = np.random.RandomState(0)
    noised = jnp.asarray(rng.randn(T, H, W, 4).astype(np.float32) * 0.3)
    c = {
        "crossattn": jnp.asarray(rng.randn(T, 1, 16).astype(np.float32)),
        "vector": jnp.asarray(rng.randn(T, 8).astype(np.float32)),
        "concat": jnp.asarray(rng.randn(T, H, W, 4).astype(np.float32) * 0.1),
    }
    uc = jax.tree.map(jnp.zeros_like, c)
    m = 2
    masks_tok = jnp.asarray((rng.rand(m, T, H * W) > 0.5).astype(np.float32))
    masks_lat = masks_tok.reshape(m, T, H, W)
    cache = {"xt": jnp.asarray(rng.randn(STEPS, T, H, W, 4).astype(np.float32))}

    batched = engine.modulated_runs_batched(
        params, noised, c, uc, masks_tok, masks_lat, cache, TS, chunk=2 * m
    )
    chunked = engine.modulated_runs_host_chunked(
        params, noised, c, uc, masks_tok, masks_lat, cache, TS, chunk=1
    )
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(batched), atol=1e-5, rtol=1e-5
    )
    stepped = engine.modulated_runs_host_stepped(
        params, noised, c, uc, masks_tok, masks_lat, cache, TS
    )
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(batched), atol=1e-5, rtol=1e-5
    )
