"""Gradient checkpointing (UNetConfig.remat ↔ the reference's
use_checkpoint, openaimodel.py:231/245): forward and grads must be
numerically identical to the non-remat model; only the VJP's memory/flop
schedule changes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidseg_diffusion_tpu.models.unet import UNetConfig, UNetModel


def _tiny_cfg(video: bool, remat: bool) -> UNetConfig:
    return UNetConfig(
        in_channels=4, out_channels=4, model_channels=16,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=8, context_dim=12,
        adm_in_channels=6 if video else None,
        video=video, remat=remat, transformer_depth=1,
    )


def _inputs(video: bool):
    rng = jax.random.PRNGKey(0)
    t = 3 if video else 1
    b = 2 * t
    x = jax.random.normal(rng, (b, 8, 8, 4))
    ts = jnp.full((b,), 0.3)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (b, 2, 12))
    kw = {}
    args = (x, ts, ctx)
    if video:
        y = jax.random.normal(jax.random.fold_in(rng, 2), (b, 6))
        args = args + (y,)
        kw = dict(num_video_frames=t,
                  image_only_indicator=jnp.zeros((2, t)))
    return args, kw


def _params_and_grads(video: bool, remat: bool):
    cfg = _tiny_cfg(video, remat)
    model = UNetModel(cfg)
    args, kw = _inputs(video)
    base = UNetModel(_tiny_cfg(video, False))
    params = base.init(jax.random.PRNGKey(7), *args, **kw)["params"]

    def loss(p):
        out = model.apply({"params": p}, *args, **kw)
        return jnp.sum(out**2)

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    return val, grads


def test_remat_param_tree_unchanged():
    video = True
    args, kw = _inputs(video)
    shapes_plain = jax.eval_shape(
        lambda: UNetModel(_tiny_cfg(video, False)).init(
            jax.random.PRNGKey(0), *args, **kw
        )
    )["params"]
    shapes_remat = jax.eval_shape(
        lambda: UNetModel(_tiny_cfg(video, True)).init(
            jax.random.PRNGKey(0), *args, **kw
        )
    )["params"]
    p = jax.tree_util.tree_structure(shapes_plain)
    r = jax.tree_util.tree_structure(shapes_remat)
    assert p == r


@pytest.mark.slow  # ~95 s CPU grads; test_remat_train_step_runs covers remat in default
def test_remat_grads_match_image_unet():
    v0, g0 = _params_and_grads(video=False, remat=False)
    v1, g1 = _params_and_grads(video=False, remat=True)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        ),
        g0, g1,
    )


@pytest.mark.slow  # ~2 min of CPU compile; image variant covers the same
def test_remat_grads_match_video_unet():
    v0, g0 = _params_and_grads(video=True, remat=False)
    v1, g1 = _params_and_grads(video=True, remat=True)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        ),
        g0, g1,
    )


@pytest.mark.slow  # ~60 s CPU; harvest-under-remat parity combo
def test_remat_harvest_sow_identical():
    """Reference YAMLs ship use_checkpoint: True, so the VidSeg harvest
    (sow into 'intermediates') must survive remat'd blocks bit-for-bit."""
    video = True
    args, kw = _inputs(video)
    params = UNetModel(_tiny_cfg(video, False)).init(
        jax.random.PRNGKey(7), *args, **kw
    )["params"]
    outs = {}
    for remat in (False, True):
        model = UNetModel(_tiny_cfg(video, remat))
        outs[remat] = model.apply(
            {"params": params}, *args, mutable=["intermediates"], **kw
        )
    (o0, s0), (o1, s1) = outs[False], outs[True]
    l0 = jax.tree_util.tree_leaves(s0["intermediates"])
    l1 = jax.tree_util.tree_leaves(s1["intermediates"])
    assert len(l0) == len(l1) and len(l0) > 0
    for a, b in zip(l0, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)


def test_config_maps_use_checkpoint():
    from vidseg_diffusion_tpu.config import build_unet_config

    node = {
        "target": "sgm.modules.diffusionmodules.openaimodel.UNetModel",
        "params": {
            "in_channels": 4, "out_channels": 4, "model_channels": 16,
            "num_res_blocks": 1, "attention_resolutions": [2],
            "channel_mult": [1, 2], "num_head_channels": 8,
            "context_dim": 12, "use_checkpoint": True,
        },
    }
    assert build_unet_config(node).remat is True
    node["params"].pop("use_checkpoint")
    assert build_unet_config(node).remat is False


def test_remat_train_step_runs():
    """A remat'd diffusion train step executes end-to-end (the actual
    use case: training memory relief)."""
    import optax

    from vidseg_diffusion_tpu.diffusion.denoiser import Denoiser
    from vidseg_diffusion_tpu.diffusion.loss import (
        EDMSigmaSampling, StandardDiffusionLoss,
    )
    from vidseg_diffusion_tpu.diffusion.scaling import EpsScaling
    from vidseg_diffusion_tpu.engine.train import make_diffusion_train_step

    cfg = _tiny_cfg(video=False, remat=True)
    model = UNetModel(cfg)
    args, kw = _inputs(video=False)
    params = model.init(jax.random.PRNGKey(0), *args, **kw)["params"]

    loss_mod = StandardDiffusionLoss(
        denoiser=Denoiser(scaling=EpsScaling()),
        sigma_sampler=EDMSigmaSampling(),
        loss_type="l2",
    )

    def network_factory(p):
        def net(x, c_noise, cond):
            return model.apply(
                {"params": p}, x, c_noise, cond.get("crossattn")
            )
        return net

    init, step = make_diffusion_train_step(
        network_factory, loss_mod, optax.adam(1e-4), use_ema=False
    )
    state = init(params)
    batch = args[0]
    cond = {"crossattn": args[2]}
    state, logs = jax.jit(step)(state, jax.random.PRNGKey(1), batch, cond)
    assert np.isfinite(float(logs["loss"]))
    assert int(state.step) == 1


@pytest.mark.slow  # two grad compiles of the tiny image UNet (~90 s CPU)
def test_remat_policy_grads_match():
    """Selective remat (remat_policy="dots_with_no_batch_dims_saveable")
    must change only the VJP's save/recompute schedule — values and grads
    identical to the plain remat and no-remat models."""
    import dataclasses

    cfg = dataclasses.replace(
        _tiny_cfg(video=False, remat=True),
        remat_policy="dots_with_no_batch_dims_saveable",
    )
    model = UNetModel(cfg)
    args, kw = _inputs(False)
    base = UNetModel(_tiny_cfg(False, False))
    params = base.init(jax.random.PRNGKey(7), *args, **kw)["params"]

    def loss(p, m):
        return jnp.sum(m.apply({"params": p}, *args, **kw) ** 2)

    v0, g0 = jax.jit(jax.value_and_grad(lambda p: loss(p, base)))(params)
    v1, g1 = jax.jit(jax.value_and_grad(lambda p: loss(p, model)))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        ),
        g0, g1,
    )


@pytest.mark.slow  # two grad compiles (~90 s CPU)
def test_remat_policy_save_conv_grads_match(monkeypatch):
    """remat_policy='save_conv' (checkpoint_name-tagged conv outputs +
    save_only_these_names) — grads identical to the no-remat model."""
    import dataclasses

    monkeypatch.setenv("VIDSEG_CKPT_NAME_CONVS", "1")
    cfg = dataclasses.replace(
        _tiny_cfg(video=False, remat=True), remat_policy="save_conv"
    )
    model = UNetModel(cfg)
    args, kw = _inputs(False)
    base = UNetModel(_tiny_cfg(False, False))
    params = base.init(jax.random.PRNGKey(7), *args, **kw)["params"]

    def loss(p, m):
        return jnp.sum(m.apply({"params": p}, *args, **kw) ** 2)

    v0, g0 = jax.jit(jax.value_and_grad(lambda p: loss(p, base)))(params)
    v1, g1 = jax.jit(jax.value_and_grad(lambda p: loss(p, model)))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        ),
        g0, g1,
    )
