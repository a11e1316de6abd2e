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

    # runs-mesh sharding over the 8 virtual CPU devices: 2·M=4 runs pad to
    # 8 device columns; results must match the host dispatch exactly
    from vidseg_diffusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(axes=("runs",), shape=(jax.device_count(),))
    sharded = engine.modulated_runs_sharded(
        params, noised, c, uc, masks_tok, masks_lat, cache, TS, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(batched), atol=1e-5, rtol=1e-5
    )


def test_run_single_video_mesh_equals_host(tmp_path):
    """The full pipeline on the 8-device runs mesh produces the same
    segmentation as the single-device host dispatch (VERDICT #2: CLIs must
    actually use the mesh; equivalence is the gate)."""
    from vidseg_diffusion_tpu.engine.build import build_pipeline
    from vidseg_diffusion_tpu.pipelines.single_video import VidSegArgs, run_single_video
    import dataclasses

    pipeline = build_pipeline(
        "configs/inference/svd_tiny.yaml", num_steps=6, num_frames=3
    )
    rng = np.random.RandomState(0)
    frames = rng.rand(3, 64, 64, 3).astype(np.float32) * 2 - 1
    names = ["0", "1", "2"]
    base = VidSegArgs(
        exp_name="mesh", num_steps=6, num_masks=2, modulate_timestep=(3,),
        feature_timestep=(5,), runs_chunk=4, feature_folder=str(tmp_path),
        mesh="off",
    )
    res_host = run_single_video(pipeline, frames, names, base, write_outputs=False)
    res_mesh = run_single_video(
        pipeline, frames, names, dataclasses.replace(base, mesh="runs"),
        write_outputs=False,
    )
    # steps 1-3 are the same program either way → masks/labels identical
    np.testing.assert_allclose(res_mesh.masks, res_host.masks, atol=1e-6)
    np.testing.assert_array_equal(res_mesh.unique_labels, res_host.unique_labels)
    # step 4 latents agree to float tolerance (engine-level equivalence is
    # asserted at 1e-5 above); the uint8-wraparound difference-map quirk
    # amplifies ≲1e-5 differences at argmax-tie pixels, so segmentations are
    # compared by agreement fraction, not bit-equality (with real weights
    # ties are rare; with random tiny-model weights they are common)
    agree = (res_mesh.seg_raw == res_host.seg_raw).mean()
    assert agree > 0.95, f"seg agreement {agree:.4f}"
    agree_f = (res_mesh.seg_filtered == res_host.seg_filtered).mean()
    assert agree_f > 0.95, f"filtered seg agreement {agree_f:.4f}"


def _tiny_engine(s_churn=0.0, guider=None):
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
            discretization=EDMDiscretization(sigma_max=700.0),
            num_steps=STEPS, s_churn=s_churn,
        ),
        guider=guider if guider is not None else LinearPredictionGuider(
            max_scale=2.5, num_frames=T
        ),
        mod_cfg=ModulationConfig(
            modulate_block_idx=(mod_block,), modulate_timestep=(TS,),
            num_steps=STEPS, num_frames=T,
            modulate_layer_type=("spatial",), modulate_attn_type=("self_attn",),
            is_latent_blending=True, is_injected_features=False,
        ),
        harvest=svd_harvest_spec(cluster_blocks=()),
    )
    return engine, params


def _tiny_inputs(m=2):
    rng = np.random.RandomState(0)
    noised = jnp.asarray(rng.randn(T, H, W, 4).astype(np.float32) * 0.3)
    c = {
        "crossattn": jnp.asarray(rng.randn(T, 1, 16).astype(np.float32)),
        "vector": jnp.asarray(rng.randn(T, 8).astype(np.float32)),
        "concat": jnp.asarray(rng.randn(T, H, W, 4).astype(np.float32) * 0.1),
    }
    uc = jax.tree.map(jnp.zeros_like, c)
    masks_tok = jnp.asarray((rng.rand(m, T, H * W) > 0.5).astype(np.float32))
    masks_lat = masks_tok.reshape(m, T, H, W)
    cache = {"xt": jnp.asarray(rng.randn(STEPS, T, H, W, 4).astype(np.float32))}
    return noised, c, uc, masks_tok, masks_lat, cache


def test_s_churn_consistent_across_dispatch_paths():
    """With s_churn > 0 the host-stepped path must apply the same per-step
    gamma sigma-scaling as the scan-based batched path (it silently
    dropped gamma before — same video, different numbers per path)."""
    engine, params = _tiny_engine(s_churn=1.5)
    noised, c, uc, masks_tok, masks_lat, cache = _tiny_inputs()
    m = masks_tok.shape[0]
    batched = engine.modulated_runs_batched(
        params, noised, c, uc, masks_tok, masks_lat, cache, TS, chunk=2 * m
    )
    stepped = engine.modulated_runs_host_stepped(
        params, noised, c, uc, masks_tok, masks_lat, cache, TS
    )
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(batched), atol=1e-5, rtol=1e-5
    )


def test_host_chunked_non_divisor_chunk():
    """chunk=4 with 2*m=6 runs must not crash (the old assert fired after
    the expensive feature pass); result still equals batched."""
    engine, params = _tiny_engine()
    noised, c, uc, masks_tok, masks_lat, cache = _tiny_inputs(m=3)
    batched = engine.modulated_runs_batched(
        params, noised, c, uc, masks_tok, masks_lat, cache, TS, chunk=6
    )
    chunked = engine.modulated_runs_host_chunked(
        params, noised, c, uc, masks_tok, masks_lat, cache, TS, chunk=4
    )
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(batched), atol=1e-5, rtol=1e-5
    )


def test_identity_guider_video_forward():
    """IdentityGuider (batch factor 1) must run the video engine — the
    image_only_indicator rows were hardcoded to 2."""
    from vidseg_diffusion_tpu.diffusion import IdentityGuider

    engine, params = _tiny_engine(guider=IdentityGuider())
    noised, c, uc, masks_tok, masks_lat, cache = _tiny_inputs()
    out = engine.modulated_runs_batched(
        params, noised, c, uc, masks_tok, masks_lat, cache, TS, chunk=4
    )
    assert np.isfinite(np.asarray(out)).all()


def test_feature_pass_matches_xt_cache_pass():
    """feature_pass (the minimal harvest API) must produce the same
    windowed harvest entries as xt_cache_pass (which additionally records
    the x_t trajectory) — it has no other in-repo caller, so this is its
    contract test."""
    engine, params = _tiny_engine()
    engine = type(engine)(
        **{**engine.__dict__, "harvest": svd_harvest_spec(cluster_blocks=(0,))}
    )
    rng = jax.random.PRNGKey(5)
    latent = jnp.asarray(np.random.RandomState(1).randn(T, H, W, 4), jnp.float32)
    noised, c, uc, *_ = _tiny_inputs()
    x_a, cache_a = engine.feature_pass(params, latent, c, uc, rng, TS)
    x_b, cache_b = engine.xt_cache_pass(params, latent, c, uc, rng, TS)
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_b), atol=1e-5)
    assert int(cache_a["t0"]) == int(cache_b["t0"]) == TS
    for k in cache_a:
        if k in ("t0",):
            continue
        assert k in cache_b
        np.testing.assert_allclose(
            np.asarray(cache_a[k]), np.asarray(cache_b[k]), atol=1e-5
        )
    assert "xt" in cache_b and "xt" not in cache_a
