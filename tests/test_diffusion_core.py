"""Golden tests for σ schedules, scalings, guiders, denoisers, samplers.

Values are derived independently (closed-form / numpy float64), NOT copied
from the reference — they pin the same math the reference implements
(discretizer.py, denoiser_scaling.py, guiders.py, denoiser.py, sampling.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.diffusion import (
    EDMDiscretization,
    LegacyDDPMDiscretization,
    EDMScaling,
    EpsScaling,
    VScaling,
    VScalingWithEDMcNoise,
    VanillaCFG,
    IdentityGuider,
    LinearPredictionGuider,
    Denoiser,
    DiscreteDenoiser,
)
from vidseg_diffusion_tpu.diffusion.sampling import (
    EulerEDMSampler,
    EulerAncestralSampler,
    HeunEDMSampler,
    to_d,
)


class TestDiscretization:
    def test_edm_endpoints(self):
        d = EDMDiscretization(sigma_min=0.002, sigma_max=80.0, rho=7.0)
        s = d.get_sigmas(25)
        assert s.shape == (25,)
        np.testing.assert_allclose(float(s[0]), 80.0, rtol=1e-5)
        np.testing.assert_allclose(float(s[-1]), 0.002, rtol=1e-5)
        assert np.all(np.diff(np.asarray(s)) < 0)  # strictly decreasing

    def test_edm_closed_form_interior(self):
        d = EDMDiscretization(sigma_min=0.002, sigma_max=700.0, rho=7.0)  # SVD σmax
        s = np.asarray(d.get_sigmas(25))
        ramp = np.linspace(0, 1, 25)
        expected = (
            700.0 ** (1 / 7.0) + ramp * (0.002 ** (1 / 7.0) - 700.0 ** (1 / 7.0))
        ) ** 7.0
        np.testing.assert_allclose(s, expected, rtol=1e-5)

    def test_append_zero_and_flip(self):
        d = EDMDiscretization()
        s = d(10)
        assert s.shape == (11,)
        assert float(s[-1]) == 0.0
        sf = d(10, flip=True)
        np.testing.assert_allclose(np.asarray(sf), np.asarray(s)[::-1], rtol=1e-6)

    def test_ddpm_legacy_values(self):
        d = LegacyDDPMDiscretization()
        s = np.asarray(d.get_sigmas(1000))
        # independent recomputation in float64
        betas = np.linspace(0.00085**0.5, 0.0120**0.5, 1000, dtype=np.float64) ** 2
        ac = np.cumprod(1.0 - betas)
        expected = np.sqrt((1 - ac) / ac)[::-1]
        np.testing.assert_allclose(s, expected, rtol=1e-5)
        # descending
        assert s[0] > s[-1]

    def test_ddpm_subsampling(self):
        d = LegacyDDPMDiscretization()
        s40 = np.asarray(d.get_sigmas(40))
        s1000 = np.asarray(d.get_sigmas(1000))
        assert s40.shape == (40,)
        # subsampled sigmas must be a subset of the full table
        for v in s40:
            assert np.min(np.abs(s1000 - v)) < 1e-6


class TestScalings:
    def test_eps(self):
        sig = jnp.array([0.5, 2.0])
        c_skip, c_out, c_in, c_noise = EpsScaling()(sig)
        np.testing.assert_allclose(np.asarray(c_skip), [1.0, 1.0])
        np.testing.assert_allclose(np.asarray(c_out), [-0.5, -2.0])
        np.testing.assert_allclose(np.asarray(c_in), [1 / np.sqrt(1.25), 1 / np.sqrt(5.0)], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(c_noise), [0.5, 2.0])

    def test_v_with_edm_cnoise(self):
        sig = jnp.array([2.0])
        c_skip, c_out, c_in, c_noise = VScalingWithEDMcNoise()(sig)
        np.testing.assert_allclose(float(c_skip[0]), 1 / 5.0, rtol=1e-6)
        np.testing.assert_allclose(float(c_out[0]), -2.0 / np.sqrt(5.0), rtol=1e-6)
        np.testing.assert_allclose(float(c_in[0]), 1 / np.sqrt(5.0), rtol=1e-6)
        np.testing.assert_allclose(float(c_noise[0]), 0.25 * np.log(2.0), rtol=1e-6)

    def test_v_scaling_cnoise_is_sigma(self):
        sig = jnp.array([3.0])
        *_, c_noise = VScaling()(sig)
        np.testing.assert_allclose(float(c_noise[0]), 3.0)

    def test_edm_scaling(self):
        sig = jnp.array([1.0])
        c_skip, c_out, c_in, c_noise = EDMScaling(sigma_data=0.5)(sig)
        np.testing.assert_allclose(float(c_skip[0]), 0.25 / 1.25, rtol=1e-6)
        np.testing.assert_allclose(float(c_out[0]), 0.5 / np.sqrt(1.25), rtol=1e-6)
        np.testing.assert_allclose(float(c_in[0]), 1 / np.sqrt(1.25), rtol=1e-6)
        np.testing.assert_allclose(float(c_noise[0]), 0.0, atol=1e-7)


class TestGuiders:
    def test_vanilla_cfg_blend(self):
        g = VanillaCFG(scale=5.0)
        x_u = jnp.ones((2, 3)) * 1.0
        x_c = jnp.ones((2, 3)) * 2.0
        out = g(jnp.concatenate([x_u, x_c]), None)
        np.testing.assert_allclose(np.asarray(out), 1.0 + 5.0 * 1.0)

    def test_vanilla_cfg_prepare_layout(self):
        g = VanillaCFG(scale=1.0)
        x = jnp.arange(6.0).reshape(2, 3)
        s = jnp.ones((2,))
        c = {"crossattn": jnp.ones((2, 4)), "other": 7}
        uc = {"crossattn": jnp.zeros((2, 4)), "other": 7}
        x2, s2, cc = g.prepare_inputs(x, s, c, uc)
        assert x2.shape == (4, 3)
        # [uc; c] order — uc first (guiders.py:38)
        np.testing.assert_allclose(np.asarray(cc["crossattn"][:2]), 0.0)
        np.testing.assert_allclose(np.asarray(cc["crossattn"][2:]), 1.0)
        assert cc["other"] == 7

    def test_linear_prediction_guider(self):
        t = 4
        g = LinearPredictionGuider(max_scale=2.5, num_frames=t, min_scale=1.0)
        x_u = jnp.zeros((t, 2))
        x_c = jnp.ones((t, 2))
        out = np.asarray(g(jnp.concatenate([x_u, x_c]), None))
        expected = np.linspace(1.0, 2.5, t)[:, None] * np.ones((t, 2))
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_identity(self):
        g = IdentityGuider()
        x = jnp.ones((3,))
        np.testing.assert_allclose(np.asarray(g(x, None)), 1.0)


class TestDenoiser:
    def test_continuous_preconditioning(self):
        den = Denoiser(scaling=EpsScaling())

        def network(x, c_noise, cond):
            return x * 2.0  # fake net

        x = jnp.ones((2, 4, 8, 8))
        sigma = jnp.full((2,), 3.0)
        out = den(network, x, sigma, {})
        # out = net(x·c_in)·c_out + x·c_skip = 2·x/√10·(−3) + x
        expected = 2.0 / np.sqrt(10.0) * (-3.0) + 1.0
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)

    def test_discrete_quantization_roundtrip(self):
        disc = LegacyDDPMDiscretization()
        den = DiscreteDenoiser(scaling=EpsScaling(), discretization=disc, num_idx=1000)
        sigmas = den.sigmas
        assert sigmas.shape == (1000,)
        # quantizing an exact table value returns it
        s = sigmas[137]
        np.testing.assert_allclose(
            float(den.possibly_quantize_sigma(s[None])[0]), float(s), rtol=1e-6
        )
        # c_noise becomes the index
        idx = den.possibly_quantize_c_noise(s[None])
        assert int(idx[0]) == 137
        # sigmas are flipped: index 0 = largest σ? No — flip=True makes
        # sigmas ascend with idx: idx 999 is the largest σ.
        assert float(sigmas[999]) > float(sigmas[0])


def _zero_denoiser(x, sigma, i):
    return jnp.zeros_like(x), None


class TestEulerSampler:
    def test_zero_denoiser_analytic(self):
        """With D(x)=0, each step gives x' = x·σ'/σ, so the whole loop is
        x·σ_end/σ_0 (times the √(1+σ₀²) prescale)."""
        disc = EDMDiscretization(sigma_min=0.1, sigma_max=10.0)
        sampler = EulerEDMSampler(discretization=disc, num_steps=8)
        x = jnp.ones((1, 2, 4, 4))
        xf, _ = sampler(_zero_denoiser, x, t_start=0, t_end=5)
        sig = np.asarray(sampler.sigmas())
        expected = np.sqrt(1 + sig[0] ** 2) * sig[5] / sig[0]
        np.testing.assert_allclose(np.asarray(xf), expected, rtol=1e-4)

    def test_full_loop_terminates_at_zero(self):
        disc = EDMDiscretization(sigma_min=0.1, sigma_max=10.0)
        sampler = EulerEDMSampler(discretization=disc, num_steps=6)
        x = jnp.ones((1, 4))
        xf, _ = sampler(_zero_denoiser, x)
        np.testing.assert_allclose(np.asarray(xf), 0.0, atol=1e-6)

    def test_add_noise_prescale_cancellation(self):
        disc = EDMDiscretization(sigma_min=0.002, sigma_max=700.0)
        sampler = EulerEDMSampler(discretization=disc, num_steps=25)
        x = jnp.ones((2, 3))
        rng = jax.random.PRNGKey(0)
        noised = sampler.add_noise(rng, x, noise_level=17)
        sig = sampler.sigmas()
        rescaled = sampler.prescale(noised, sig)
        eps = jax.random.normal(rng, x.shape, dtype=x.dtype)
        np.testing.assert_allclose(
            np.asarray(rescaled), np.asarray(x + eps * sig[17]), rtol=1e-4
        )

    def test_aux_stacking_and_post_step(self):
        disc = EDMDiscretization(sigma_min=0.1, sigma_max=10.0)
        sampler = EulerEDMSampler(discretization=disc, num_steps=10)
        calls = []

        def denoise_fn(x, sigma, i):
            return jnp.zeros_like(x), {"sigma": sigma, "i": i}

        def post_step(x, i):
            return x * 0.0 + i.astype(x.dtype)

        x = jnp.ones((1, 4))
        xf, aux = sampler(denoise_fn, x, t_start=3, t_end=8, post_step_fn=post_step)
        assert aux["i"].shape == (5,)
        np.testing.assert_allclose(np.asarray(aux["i"]), np.arange(3, 8))
        sig = np.asarray(sampler.sigmas())
        np.testing.assert_allclose(np.asarray(aux["sigma"]), sig[3:8], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(xf), 7.0)  # last post_step writes i=7

    def test_inversion_shapes_and_final_scale(self):
        disc = EDMDiscretization(sigma_min=0.1, sigma_max=10.0)
        sampler = EulerEDMSampler(discretization=disc, num_steps=5)
        x = jnp.ones((1, 4))
        xf, traj = sampler.inversion(_zero_denoiser, x)
        assert traj.shape == (6, 1, 4)

    def test_ancestral_eta0_equals_euler(self):
        disc = EDMDiscretization(sigma_min=0.1, sigma_max=10.0)
        euler = EulerEDMSampler(discretization=disc, num_steps=6)
        anc = EulerAncestralSampler(discretization=disc, num_steps=6, eta=0.0)

        def dn(x, sigma, i):
            return x * 0.5, None

        x = jnp.ones((1, 4))
        xe, _ = euler(dn, x, t_end=4)
        xa, _ = anc(dn, x, t_end=4, rng=jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xe), rtol=1e-5)

    def test_heun_runs(self):
        disc = EDMDiscretization(sigma_min=0.1, sigma_max=10.0)
        heun = HeunEDMSampler(discretization=disc, num_steps=6)

        def dn(x, sigma, i):
            return x * 0.9, None

        x = jnp.ones((1, 4))
        xh, _ = heun(dn, x)
        assert np.all(np.isfinite(np.asarray(xh)))

    def test_jit_compatible(self):
        disc = EDMDiscretization(sigma_min=0.1, sigma_max=10.0)
        sampler = EulerEDMSampler(discretization=disc, num_steps=6)

        @jax.jit
        def run(x):
            return sampler(_zero_denoiser, x, t_start=1, t_end=5)[0]

        out = run(jnp.ones((1, 4)))
        assert np.all(np.isfinite(np.asarray(out)))


class TestToD:
    def test_to_d(self):
        x = jnp.full((1, 2, 2), 3.0)
        denoised = jnp.full((1, 2, 2), 1.0)
        sigma = jnp.array([2.0])
        np.testing.assert_allclose(np.asarray(to_d(x, sigma, denoised)), 1.0)
