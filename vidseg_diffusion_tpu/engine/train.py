"""Training steps (framework scaffold; the reference inherits an unused
Lightning training_step, models/diffusion.py:153-236, and an autoencoder
trainer with LPIPS+GAN losses — neither runs on the VidSeg path).

Pure optax train steps, data-parallel shardable over the 'data' mesh axis
(exercised by __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import dataclasses

import flax.struct
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vidseg_diffusion_tpu.diffusion.loss import StandardDiffusionLoss
from vidseg_diffusion_tpu.models.lpips import (
    AutoencoderLossConfig,
    autoencoder_reconstruction_loss,
    generator_adv_loss,
    hinge_d_loss,
    vanilla_d_loss,
)
from vidseg_diffusion_tpu.models.regularizers import DiagonalGaussian
from vidseg_diffusion_tpu.utils.ema import EmaState, ema_init, ema_update


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema: Optional[EmaState] = None


def make_diffusion_train_step(
    network_factory: Callable,  # params -> network(x, c_noise, cond)
    loss_mod: StandardDiffusionLoss,
    optimizer: optax.GradientTransformation,
    use_ema: bool = True,
    ema_decay: float = 0.9999,
):
    """One DP-shardable diffusion training step (DiffusionEngine
    training_step counterpart)."""

    def init(params) -> TrainState:
        return TrainState(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.asarray(0, jnp.int32),
            ema=ema_init(params) if use_ema else None,
        )

    def step(state: TrainState, rng, batch, cond) -> Tuple[TrainState, Dict]:
        def loss_fn(p):
            return loss_mod(network_factory(p), rng, batch, cond)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (
            ema_update(state.ema, params, decay=ema_decay)
            if state.ema is not None
            else None
        )
        new = TrainState(params=params, opt_state=opt_state, step=state.step + 1, ema=ema)
        return new, {"loss": loss}

    return init, step


def make_autoencoder_train_step(
    encode_apply: Callable,  # (params, x) -> moments [..., 2z]
    decode_apply: Callable,  # (params, z) -> recon
    disc_apply: Callable,    # (params, x) -> logits
    lpips_apply: Optional[Callable],  # (x, y) -> [B]
    gen_optimizer: optax.GradientTransformation,
    disc_optimizer: optax.GradientTransformation,
    cfg: AutoencoderLossConfig = AutoencoderLossConfig(),
):
    """Two-phase GAN autoencoder step (GeneralLPIPSWithDiscriminator):
    generator phase (rec + LPIPS + KL + adversarial once past disc_start),
    then discriminator phase (hinge/vanilla on real vs recon)."""
    d_loss_fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss

    def step(gen_params, disc_params, gen_opt, disc_opt, rng, x, global_step):
        def gen_loss(gp):
            moments = encode_apply(gp, x)
            post = DiagonalGaussian.from_moments(moments)
            z = post.sample(rng)
            recon = decode_apply(gp, z)
            loss, logs = autoencoder_reconstruction_loss(
                lpips_apply, x, recon, post.kl(), cfg
            )
            logits_fake = disc_apply(jax.lax.stop_gradient(disc_params), recon)
            adv = generator_adv_loss(logits_fake)
            use_disc = (global_step >= cfg.disc_start).astype(loss.dtype)
            total = loss + use_disc * cfg.disc_weight * adv
            logs = dict(logs, g_adv=adv)
            return total, (recon, logs)

        (gl, (recon, logs)), g_grads = jax.value_and_grad(gen_loss, has_aux=True)(
            gen_params
        )
        g_updates, gen_opt = gen_optimizer.update(g_grads, gen_opt, gen_params)
        gen_params = optax.apply_updates(gen_params, g_updates)

        def disc_loss(dp):
            lr = disc_apply(dp, x)
            lf = disc_apply(dp, jax.lax.stop_gradient(recon))
            return d_loss_fn(lr, lf)

        dl, d_grads = jax.value_and_grad(disc_loss)(disc_params)
        d_updates, disc_opt = disc_optimizer.update(d_grads, disc_opt, disc_params)
        disc_params = optax.apply_updates(disc_params, d_updates)
        logs = dict(logs, d_loss=dl, g_loss=gl)
        return gen_params, disc_params, gen_opt, disc_opt, logs

    return step
