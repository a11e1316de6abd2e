"""End-to-end denoise-loop parity against the PUBLIC reference.

Drives the reference's own EulerEDMSampler + Denoiser + LinearPrediction
guider + VideoUNet (torch, CPU, tiny config) and compares final latents with
this framework's scan-based engine on converted weights — first the plain
feature pass, then a modulated (λ·mask) run. This exercises the full chain:
σ schedule → CFG batching → preconditioning → UNet → guider blend → Euler
step → modulation index arithmetic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from reference_compat import de_zero_, ensure_reference_importable, import_reference_video_unet  # noqa: E402
from vidseg_diffusion_tpu.diffusion import (  # noqa: E402
    Denoiser,
    EDMDiscretization,
    LinearPredictionGuider,
    VScalingWithEDMcNoise,
)
from vidseg_diffusion_tpu.diffusion.sampling import EulerEDMSampler  # noqa: E402
from vidseg_diffusion_tpu.engine.modulation import ModulationConfig  # noqa: E402
from vidseg_diffusion_tpu.engine.vidseg import VidSegEngine, svd_harvest_spec  # noqa: E402
from vidseg_diffusion_tpu.io.checkpoint import convert_state_dict, unet_key_fn  # noqa: E402
from vidseg_diffusion_tpu.models.unet import UNetConfig, UNetModel  # noqa: E402

T, H, W = 3, 16, 16
NUM_STEPS = 6
T_START = 2
CTX = 24
ADM = 12


@pytest.fixture(scope="module")
def stack():
    ensure_reference_importable()
    from sgm.modules.diffusionmodules.denoiser import Denoiser as RefDenoiser
    from sgm.modules.diffusionmodules.sampling import EulerEDMSampler as RefSampler

    RefVideoUNet = import_reference_video_unet()
    torch.manual_seed(0)
    ref_unet = de_zero_(RefVideoUNet(
        in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=[2, 1], channel_mult=[1, 2], num_head_channels=16,
        transformer_depth=1, context_dim=CTX, use_linear_in_transformer=True,
        use_checkpoint=False, extra_ff_mix_layer=True, use_spatial_context=True,
        merge_strategy="learned_with_images", video_kernel_size=[3, 1, 1],
        num_classes="sequential", adm_in_channels=ADM,
    ).eval())

    ref_denoiser = de_zero_(RefDenoiser(
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"
        }
    ))
    ref_sampler = RefSampler(
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
            "params": {"sigma_max": 700.0},
        },
        guider_config={
            "target": "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider",
            "params": {"max_scale": 2.5, "min_scale": 1.0, "num_frames": T},
        },
        num_steps=NUM_STEPS,
        device="cpu",
    )

    cfg = UNetConfig(
        in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=16,
        context_dim=CTX, adm_in_channels=ADM, video=True,
    )
    unet = UNetModel(cfg)
    x0 = jnp.zeros((2 * T, H, W, 8))
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0), x0, jnp.zeros((2 * T,)),
            jnp.zeros((2 * T, 1, CTX)), jnp.zeros((2 * T, ADM)),
            num_video_frames=T, image_only_indicator=jnp.zeros((2, T)),
        )
    )["params"]
    sd = {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()}
    params, unused = convert_state_dict(shapes, sd, unet_key_fn)
    assert not unused

    rng = np.random.RandomState(1)
    cond = {
        "crossattn": rng.randn(T, 1, CTX).astype(np.float32),
        "vector": rng.randn(T, ADM).astype(np.float32),
        "concat": (rng.randn(T, H, W, 4) * 0.1).astype(np.float32),
    }
    uc = {
        "crossattn": np.zeros_like(cond["crossattn"]),
        "vector": cond["vector"],
        "concat": np.zeros_like(cond["concat"]),
    }
    noised = rng.randn(T, H, W, 4).astype(np.float32) * 0.5

    return ref_unet, ref_denoiser, ref_sampler, unet, cfg, params, cond, uc, noised


def _torch_denoiser(ref_unet, ref_denoiser, cond, uc):
    """The pipeline's denoiser closure (svd_single_video_inference.py:322-330
    + OpenAIWrapper routing, wrappers.py:23-34)."""

    def to_t(a, nchw=False):
        t = torch.from_numpy(np.asarray(a))
        if nchw and t.ndim == 4:
            t = t.permute(0, 3, 1, 2)
        return t

    c_cat = {
        "crossattn": torch.cat([to_t(uc["crossattn"]), to_t(cond["crossattn"])]),
        "vector": torch.cat([to_t(uc["vector"]), to_t(cond["vector"])]),
        "concat": torch.cat(
            [to_t(uc["concat"], True), to_t(cond["concat"], True)]
        ),
    }
    ioi = torch.zeros(2, T)

    def network(x, c_noise, c, **kwargs):
        xin = torch.cat([x, c["concat"]], dim=1)
        return ref_unet(
            xin, c_noise, context=c["crossattn"], y=c["vector"],
            time_context=None, num_video_frames=T, image_only_indicator=ioi,
            **kwargs,
        )

    def denoiser(x, sigma, c, is_modulate_step=False, is_injected_step=False,
                 modulate_params=None):
        return ref_denoiser(
            network, x, sigma, c, is_modulate_step=is_modulate_step,
            is_injected_step=is_injected_step, modulate_params=modulate_params,
        )

    return denoiser, c_cat


def _jax_engine(unet, cfg, mod_kwargs=None):
    mod_cfg = ModulationConfig(
        num_steps=NUM_STEPS, num_frames=T,
        modulate_timestep=(T_START,),
        is_latent_blending=False, is_injected_features=False,
        **(mod_kwargs or {}),
    )
    _, _, out_layout = cfg.block_layout()
    return VidSegEngine(
        unet=unet,
        denoiser=Denoiser(scaling=VScalingWithEDMcNoise()),
        sampler=EulerEDMSampler(
            discretization=EDMDiscretization(sigma_max=700.0), num_steps=NUM_STEPS
        ),
        guider=LinearPredictionGuider(max_scale=2.5, num_frames=T),
        mod_cfg=mod_cfg,
        harvest=svd_harvest_spec(cluster_blocks=()),
    )


class TestLoopParity:
    def test_plain_denoise_loop(self, stack):
        ref_unet, ref_denoiser, ref_sampler, unet, cfg, params, cond, uc, noised = stack
        denoiser, c_cat = _torch_denoiser(ref_unet, ref_denoiser, cond, uc)
        x_t = torch.from_numpy(noised).permute(0, 3, 1, 2)
        with torch.no_grad():
            out_ref = ref_sampler(
                denoiser, x_t.clone(),
                cond={"crossattn": torch.from_numpy(cond["crossattn"]),
                      "vector": torch.from_numpy(cond["vector"]),
                      "concat": torch.from_numpy(cond["concat"]).permute(0, 3, 1, 2)},
                uc={"crossattn": torch.from_numpy(uc["crossattn"]),
                    "vector": torch.from_numpy(uc["vector"]),
                    "concat": torch.from_numpy(uc["concat"]).permute(0, 3, 1, 2)},
                t_start=T_START,
            )
        out_ref = out_ref.permute(0, 2, 3, 1).numpy()

        engine = _jax_engine(unet, cfg)
        c = {k: jnp.asarray(v) for k, v in cond.items()}
        u = {k: jnp.asarray(v) for k, v in uc.items()}
        dn = engine._denoise_fn(params, c, u, T)
        out, _ = engine.sampler(dn, jnp.asarray(noised), t_start=T_START)
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=5e-3, rtol=5e-3)

    def test_inversion_loop(self, stack):
        """engine.invert == the reference sampler.inversion
        (sampling.py:264-296): flipped σ schedule, full num_steps, final
        ÷√(1+σ_last²)."""
        ref_unet, ref_denoiser, ref_sampler, unet, cfg, params, cond, uc, noised = stack
        denoiser, _ = _torch_denoiser(ref_unet, ref_denoiser, cond, uc)
        x_t = torch.from_numpy(noised).permute(0, 3, 1, 2)
        with torch.no_grad():
            out_ref, traj_ref = ref_sampler.inversion(
                denoiser, x_t.clone(),
                cond={"crossattn": torch.from_numpy(cond["crossattn"]),
                      "vector": torch.from_numpy(cond["vector"]),
                      "concat": torch.from_numpy(cond["concat"]).permute(0, 3, 1, 2)},
                uc={"crossattn": torch.from_numpy(uc["crossattn"]),
                    "vector": torch.from_numpy(uc["vector"]),
                    "concat": torch.from_numpy(uc["concat"]).permute(0, 3, 1, 2)},
            )
        out_ref = out_ref.permute(0, 2, 3, 1).numpy()
        assert len(traj_ref) == NUM_STEPS + 1

        engine = _jax_engine(unet, cfg)
        c = {k: jnp.asarray(v) for k, v in cond.items()}
        u = {k: jnp.asarray(v) for k, v in uc.items()}
        out = engine.invert(params, jnp.asarray(noised), c, u)
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=5e-3, rtol=5e-3)
        # sanity: inversion output differs from the add_noise path
        an = engine.sampler.add_noise(jax.random.PRNGKey(0), jnp.asarray(noised), noise_level=T_START)
        assert float(jnp.max(jnp.abs(out - an))) > 1e-3

    def test_modulated_loop(self, stack):
        ref_unet, ref_denoiser, ref_sampler, unet, cfg, params, cond, uc, noised = stack
        _, _, out_layout = cfg.block_layout()
        mod_block = max(i for i, s in enumerate(out_layout) if s.get("attn"))
        l_tokens = H * W  # ds=1 block

        rng = np.random.RandomState(7)
        masks_np = (rng.rand(T, l_tokens) > 0.5).astype(np.float32)
        lam = 25.0

        denoiser, _ = _torch_denoiser(ref_unet, ref_denoiser, cond, uc)
        modulate_params = {
            "feature_masks": [torch.from_numpy(m) for m in masks_np],
            "modulate_block_idx": [mod_block],
            "modulate_layer_type": ["spatial", "temporal"],
            "modulate_attn_type": ["self_attn"],
            "modulate_timestep": [T_START],
            "modulate_schedule": "constant",
            "modulate_lambda_start": lam,
            "modulate_lambda_end": lam,
            "num_frames": T,
            "modulate_uc": True,
            "is_injected_features": False,
            "injected_feature_types": None,
            "injected_block_types": None,
            "input_block_indices": None,
            "output_block_indices": None,
            "feature_folder": "/tmp/none",
            "exp_name": "none",
            "injected_features_group": {},
            "modulate_layer_frames": {},
            "modulate_block_frames": {},
            "modulate_timestep_frames": {},
            "modulate_lambda_layers": {},
            "latent_mask_start": 0,
            "latent_mask_end": 0,
        }
        x_t = torch.from_numpy(noised).permute(0, 3, 1, 2)
        with torch.no_grad():
            out_ref = ref_sampler(
                denoiser, x_t.clone(),
                cond={"crossattn": torch.from_numpy(cond["crossattn"]),
                      "vector": torch.from_numpy(cond["vector"]),
                      "concat": torch.from_numpy(cond["concat"]).permute(0, 3, 1, 2)},
                uc={"crossattn": torch.from_numpy(uc["crossattn"]),
                    "vector": torch.from_numpy(uc["vector"]),
                    "concat": torch.from_numpy(uc["concat"]).permute(0, 3, 1, 2)},
                t_start=T_START,
                is_modulate=True,
                modulate_params=modulate_params,
            )
        out_ref = out_ref.permute(0, 2, 3, 1).numpy()

        engine = _jax_engine(
            unet, cfg,
            mod_kwargs=dict(
                modulate_block_idx=(mod_block,),
                modulate_layer_type=("spatial", "temporal"),
                modulate_attn_type=("self_attn",),
                modulate_lambda_start=lam,
                modulate_lambda_end=lam,
            ),
        )
        c = {k: jnp.asarray(v) for k, v in cond.items()}
        u = {k: jnp.asarray(v) for k, v in uc.items()}
        out = engine.modulated_run(
            params, jnp.asarray(noised), c, u,
            masks_tokens=jnp.asarray(masks_np),
            masks_latent=jnp.zeros((T, H, W)),  # blending off
            lam_sign=jnp.asarray(1.0),
            cache={"xt": jnp.zeros((NUM_STEPS,) + noised.shape)},
            t_start=T_START,
        )
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=5e-3, rtol=5e-3)
