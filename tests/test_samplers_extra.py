"""Extended samplers: DPM++ 2S/2M, LMS, edit, null-text optimization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.diffusion.discretization import EDMDiscretization
from vidseg_diffusion_tpu.diffusion.sampling import EulerEDMSampler
from vidseg_diffusion_tpu.diffusion.sampling_extra import (
    DPMPP2MSampler,
    DPMPP2SAncestralSampler,
    LinearMultistepSampler,
    edit,
    linear_multistep_coeff,
    null_text_optimization,
)

DISC = EDMDiscretization(sigma_min=0.1, sigma_max=10.0)


def _linear_denoiser(scale=0.9):
    def dn(x, sigma, i):
        return x * scale, None

    return dn


class TestDPMPP:
    def test_2m_converges_like_euler(self):
        """For D(x)=x·s the ODE is exact-solvable; 2M (2nd order) must be at
        least as accurate as Euler with the same step count."""
        euler = EulerEDMSampler(discretization=DISC, num_steps=6)
        dpm = DPMPP2MSampler(discretization=DISC, num_steps=6)
        fine = EulerEDMSampler(discretization=DISC, num_steps=200)
        x = jnp.ones((1, 4))
        dn = _linear_denoiser(0.7)
        ref, _ = fine(dn, x)
        # undo the differing prescales: compare trajectories normalized by
        # each run's own prescale factor (same σ0, so identical here)
        xe, _ = euler(dn, x)
        xd, _ = dpm(dn, x)
        err_e = float(jnp.abs(xe - ref).max())
        err_d = float(jnp.abs(xd - ref).max())
        assert err_d <= err_e + 1e-6

    def test_2s_ancestral_eta0_runs(self):
        s = DPMPP2SAncestralSampler(discretization=DISC, num_steps=6, eta=0.0)
        x = jnp.ones((1, 4))
        out, _ = s(_linear_denoiser(), x, rng=jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(out)))


class TestLMS:
    def test_coeff_order1_is_dt(self):
        sig = np.array([10.0, 5.0, 2.0, 0.0])
        c = linear_multistep_coeff(1, sig, 0, 0)
        assert c == pytest.approx(-5.0, rel=1e-4)

    def test_lms_matches_euler_order1(self):
        lms = LinearMultistepSampler(discretization=DISC, num_steps=5, order=1)
        euler = EulerEDMSampler(discretization=DISC, num_steps=5)
        x = jnp.ones((1, 4))
        dn = _linear_denoiser(0.5)
        xl, _ = lms(dn, x)
        xe, _ = euler(dn, x)
        np.testing.assert_allclose(np.asarray(xl), np.asarray(xe), rtol=1e-4)

    def test_lms_order4_finite(self):
        lms = LinearMultistepSampler(discretization=DISC, num_steps=8, order=4)
        out, _ = lms(_linear_denoiser(), jnp.ones((1, 4)))
        assert np.all(np.isfinite(np.asarray(out)))


class TestEdit:
    def test_edit_window_switches_conditioning(self):
        sampler = EulerEDMSampler(discretization=DISC, num_steps=6)

        def base(x, s, i):
            return x * 0.9, None

        def strong(x, s, i):
            return x * 0.1, None

        x = jnp.ones((1, 4))
        out_edit, _ = edit(sampler, base, strong, x, edit_start_step=0, edit_end_step=5)
        out_base, _ = sampler(base, x)
        out_strong, _ = sampler(strong, x)
        np.testing.assert_allclose(np.asarray(out_edit), np.asarray(out_strong), rtol=1e-5)
        assert not np.allclose(np.asarray(out_edit), np.asarray(out_base))


class TestNTI:
    def test_loss_decreases(self):
        pytest.importorskip("optax")
        sampler = EulerEDMSampler(discretization=DISC, num_steps=3)
        x0 = jnp.ones((1, 4))

        def make_dn(uc):
            def dn(x, s, i):
                return x * 0.5 + uc, None

            return dn

        # fabricate an "inversion trajectory" from a target uc
        uc_true = jnp.full((1, 4), 0.3)
        dn_true = make_dn(uc_true)
        sig = sampler.sigmas()
        xs = [x0 * jnp.sqrt(1 + sig[0] ** 2)]
        # build the forward trajectory the optimizer should reproduce
        x = xs[0]
        traj = [x]
        for i in range(3):
            x, _ = sampler.step(dn_true, x, sig[i], sig[i + 1], jnp.asarray(i))
            traj.append(x)
        latents_inv = jnp.stack(traj[::-1])  # [steps+1, ...] ending at start
        uc_list = null_text_optimization(
            sampler, make_dn, latents_inv, jnp.zeros((1, 4)),
            num_inner_steps=30, lr=5e-2,
        )
        assert len(uc_list) == 3
        # optimized uc at step 0 should move toward uc_true
        err0 = float(jnp.abs(uc_list[0] - uc_true).mean())
        err_init = float(jnp.abs(uc_true).mean())
        assert err0 < err_init


def test_lms_t_start_first_step_is_euler():
    """At t_start>0 the ring buffer holds ONE real derivative on the first
    step, so the update must be the order-1 (Euler) step — min(i+1, order)
    paired order-4 coefficients with zero-filled slots."""
    from vidseg_diffusion_tpu.diffusion.sampling import EulerEDMSampler
    from vidseg_diffusion_tpu.diffusion.sampling_extra import (
        LinearMultistepSampler,
    )

    disc = EDMDiscretization(sigma_max=80.0)
    lms = LinearMultistepSampler(discretization=disc, num_steps=8, order=4)
    euler = EulerEDMSampler(discretization=disc, num_steps=8)

    def denoise_fn(x, sigma, i):
        return x * 0.3, {}

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 2))
    out_lms, _ = lms(denoise_fn, x, t_start=6, t_end=7, prescale=False)
    out_euler, _ = euler(denoise_fn, x, t_start=6, t_end=7, prescale=False)
    np.testing.assert_allclose(
        np.asarray(out_lms), np.asarray(out_euler), rtol=1e-5
    )


def test_heun_and_dpmpp2s_grads_finite_at_final_step():
    """The discarded where() branch at next_sigma==0 divided by zero and
    leaked NaN cotangents into jax.grad (null-text optimization
    differentiates through step)."""
    from vidseg_diffusion_tpu.diffusion.sampling import HeunEDMSampler
    from vidseg_diffusion_tpu.diffusion.sampling_extra import (
        DPMPP2SAncestralSampler,
    )

    disc = EDMDiscretization(sigma_max=80.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 2))

    for sampler in (
        HeunEDMSampler(discretization=disc, num_steps=4),
        DPMPP2SAncestralSampler(discretization=disc, num_steps=4),
    ):
        sigmas = sampler.sigmas()

        def loss(xi):
            def dn(z, s, i):
                return z * 0.3, {}

            out, _ = sampler.step(
                dn, xi, sigmas[3], sigmas[4], jnp.asarray(3)
            )
            return jnp.sum(out**2)

        g = jax.grad(loss)(x)
        assert np.isfinite(np.asarray(g)).all(), type(sampler).__name__
