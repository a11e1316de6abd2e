"""SD 2.1-path loop parity: reference EulerEDMSampler + DiscreteDenoiser +
VanillaCFG + image UNet (torch) vs our engine — covers the σ-quantizing
denoiser and the [uc;c] VanillaCFG path the SD pipeline uses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from reference_compat import de_zero_, ensure_reference_importable, import_reference_unet  # noqa: E402
from vidseg_diffusion_tpu.diffusion import (  # noqa: E402
    DiscreteDenoiser,
    EpsScaling,
    LegacyDDPMDiscretization,
    VanillaCFG,
)
from vidseg_diffusion_tpu.diffusion.sampling import EulerEDMSampler  # noqa: E402
from vidseg_diffusion_tpu.io.checkpoint import convert_state_dict, unet_key_fn  # noqa: E402
from vidseg_diffusion_tpu.models.unet import UNetConfig, UNetModel  # noqa: E402

T, H, W = 2, 16, 16
NUM_STEPS = 5
CTX = 24


def test_sd_loop_parity():
    ensure_reference_importable()
    from sgm.modules.diffusionmodules.denoiser import DiscreteDenoiser as RefDD
    from sgm.modules.diffusionmodules.sampling import EulerEDMSampler as RefSampler

    RefUNet = import_reference_unet()
    torch.manual_seed(0)
    ref_unet = de_zero_(RefUNet(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=[2, 1], channel_mult=[1, 2], num_head_channels=16,
        transformer_depth=1, context_dim=CTX, use_linear_in_transformer=True,
        use_checkpoint=False,
    ).eval())

    ref_denoiser = de_zero_(RefDD(
        scaling_config={"target": "sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling"},
        num_idx=1000,
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"
        },
    ))
    ref_sampler = RefSampler(
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"
        },
        guider_config={
            "target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
            "params": {"scale": 5.0},
        },
        num_steps=NUM_STEPS,
        device="cpu",
    )

    rng = np.random.RandomState(3)
    ctx_c = rng.randn(T, 7, CTX).astype(np.float32)
    ctx_uc = rng.randn(T, 7, CTX).astype(np.float32)
    noised = rng.randn(T, H, W, 4).astype(np.float32) * 0.3

    def denoiser(x, sigma, c, **kw):
        def network(xs, c_noise, cd, **kwargs):
            return ref_unet(xs, c_noise, context=cd["crossattn"])

        return ref_denoiser(network, x, sigma, c)

    with torch.no_grad():
        out_ref = ref_sampler(
            denoiser,
            torch.from_numpy(noised).permute(0, 3, 1, 2),
            cond={"crossattn": torch.from_numpy(ctx_c)},
            uc={"crossattn": torch.from_numpy(ctx_uc)},
            t_start=1,
        ).permute(0, 2, 3, 1).numpy()

    cfg = UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=16,
        context_dim=CTX,
    )
    unet = UNetModel(cfg)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0), jnp.zeros((2 * T, H, W, 4)),
            jnp.zeros((2 * T,)), jnp.zeros((2 * T, 7, CTX)),
        )
    )["params"]
    sd = {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()}
    params, unused = convert_state_dict(shapes, sd, unet_key_fn)
    assert not unused

    denoiser_j = DiscreteDenoiser(
        scaling=EpsScaling(), discretization=LegacyDDPMDiscretization(), num_idx=1000
    )
    sampler_j = EulerEDMSampler(
        discretization=LegacyDDPMDiscretization(), num_steps=NUM_STEPS
    )
    guider = VanillaCFG(scale=5.0)
    c = {"crossattn": jnp.asarray(ctx_c)}
    uc = {"crossattn": jnp.asarray(ctx_uc)}

    def denoise_fn(x, sigma, i):
        b = x.shape[0]
        s = jnp.full((b,), sigma, x.dtype)
        x_in, s_in, cond = guider.prepare_inputs(x, s, c, uc)

        def network(xs, c_noise, cd):
            return unet.apply({"params": params}, xs, c_noise, cd["crossattn"])

        out = denoiser_j(network, x_in, s_in, cond)
        return guider(out, sigma), None

    out, _ = sampler_j(denoise_fn, jnp.asarray(noised), t_start=1)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=5e-3, rtol=5e-3)
