"""Training scaffold: LPIPS/discriminator modules, diffusion + autoencoder
train steps."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from vidseg_diffusion_tpu.models.lpips import (
    LPIPS,
    NLayerDiscriminator,
    hinge_d_loss,
    vanilla_d_loss,
    AutoencoderLossConfig,
)
from vidseg_diffusion_tpu.engine.train import (
    make_autoencoder_train_step,
    make_diffusion_train_step,
)
from vidseg_diffusion_tpu.diffusion.loss import EDMSigmaSampling, StandardDiffusionLoss
from vidseg_diffusion_tpu.diffusion import Denoiser, EpsScaling


class TestLPIPSModules:
    @pytest.mark.slow  # ~19 s VGG build; test_lpips_loss_type covers LPIPS in default
    def test_lpips_zero_for_identical(self):
        m = LPIPS()
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3)) * 2 - 1
        params = m.init(jax.random.PRNGKey(1), x, x)
        d = m.apply(params, x, x)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
        y = -x
        d2 = m.apply(params, x, y)
        assert float(jnp.abs(d2[0])) > 0

    def test_lpips_loss_type(self):
        # loss_type="lpips" routes through lpips_fn unweighted (reference
        # loss.py:101-103)
        m = LPIPS()
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 2 - 1
        lpips_params = m.init(jax.random.PRNGKey(1), x, x)

        def network_factory_identity(xs, c_noise, cond):
            return jnp.zeros_like(xs)

        loss_mod = StandardDiffusionLoss(
            denoiser=Denoiser(scaling=EpsScaling()),
            sigma_sampler=EDMSigmaSampling(),
            loss_type="lpips",
            lpips_fn=lambda a, b: m.apply(lpips_params, a, b),
        )
        val = loss_mod(network_factory_identity, jax.random.PRNGKey(2), x, {})
        assert np.isfinite(float(val))
        # missing lpips_fn raises
        bad = StandardDiffusionLoss(
            denoiser=Denoiser(scaling=EpsScaling()),
            sigma_sampler=EDMSigmaSampling(),
            loss_type="lpips",
        )
        with pytest.raises(ValueError):
            bad(network_factory_identity, jax.random.PRNGKey(2), x, {})

    def test_discriminator_shape(self):
        d = NLayerDiscriminator(ndf=16, n_layers=2)
        x = jnp.ones((2, 32, 32, 3))
        params = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(params, x)
        assert out.ndim == 4 and out.shape[0] == 2 and out.shape[-1] == 1

    def test_hinge_and_vanilla_losses(self):
        real = jnp.ones((4, 1))
        fake = -jnp.ones((4, 1))
        assert float(hinge_d_loss(real, fake)) == pytest.approx(0.0)
        assert float(hinge_d_loss(-real, -fake)) > 0
        assert float(vanilla_d_loss(real, fake)) < float(vanilla_d_loss(fake, real))


class TestTrainSteps:
    def test_diffusion_train_step_reduces_loss(self):
        # trivial linear "network": learn to predict x0 from noised input
        def network_factory(p):
            def network(x, c_noise, cond):
                return x * p["w"]

            return network

        loss_mod = StandardDiffusionLoss(
            denoiser=Denoiser(scaling=EpsScaling()),
            sigma_sampler=EDMSigmaSampling(),
        )
        init, step = make_diffusion_train_step(
            network_factory, loss_mod, optax.adam(5e-2), use_ema=True
        )
        state = init({"w": jnp.asarray(0.0)})
        batch = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 2))
        losses = []
        for i in range(30):
            state, logs = jax.jit(step)(state, jax.random.PRNGKey(i), batch, {})
            losses.append(float(logs["loss"]))
        assert losses[-1] < losses[0]
        assert state.ema is not None and int(state.step) == 30

    @pytest.mark.slow
    def test_autoencoder_gan_step_runs(self):
        from vidseg_diffusion_tpu.models import vae as fvae

        cfg = fvae.VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1, z_channels=2)
        enc = fvae.Encoder(cfg)
        dec = fvae.Decoder(cfg)
        disc = NLayerDiscriminator(ndf=8, n_layers=1)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3)) * 2 - 1
        ep = enc.init(jax.random.PRNGKey(1), x)["params"]
        z0 = jnp.zeros((2, 8, 8, 2))
        dp = dec.init(jax.random.PRNGKey(2), z0)["params"]
        dcp = disc.init(jax.random.PRNGKey(3), x)["params"]
        gen_params = {"enc": ep, "dec": dp}

        step = make_autoencoder_train_step(
            encode_apply=lambda p, xx: enc.apply({"params": p["enc"]}, xx),
            decode_apply=lambda p, zz: dec.apply({"params": p["dec"]}, zz),
            disc_apply=lambda p, xx: disc.apply({"params": p}, xx),
            lpips_apply=None,
            gen_optimizer=optax.adam(1e-4),
            disc_optimizer=optax.adam(1e-4),
            cfg=AutoencoderLossConfig(disc_start=0),
        )
        go = optax.adam(1e-4).init(gen_params)
        do = optax.adam(1e-4).init(dcp)
        gen_params, dcp, go, do, logs = step(
            gen_params, dcp, go, do, jax.random.PRNGKey(4), x, jnp.asarray(1)
        )
        for k in ("rec_loss", "kl_loss", "g_loss", "d_loss"):
            assert np.isfinite(float(logs[k])), k
