"""Time one REAL training step of the remat'd SVD UNet on the TPU.

VERDICT r3 #6: the custom_vjp chunked attention backward (and every other
Pallas-kernel VJP) had never touched hardware. This times, at the swan
latent shape in bf16:

- forward-only: the StandardDiffusionLoss value on the remat'd 1.52B
  VideoUNet (use_checkpoint parity, models/unet.py remat=True)
- full step: value_and_grad + SGD update (Adam moments in fp32 would be
  +12 GB on a 16 GB v5e next to bf16 params+grads — the measured quantity
  is the backward, not the optimizer family)

Writes BENCH_TRAIN.json {fwd_ms, step_ms, bwd_fwd_ratio} at the repo root.
Steps are chained through the updated params so the tunnel cannot serve
cached dispatches. Run serialized with other TPU jobs:

    python scripts/tests/train_bench.py [--iters 4] [--remat 0|1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def build_train(remat: bool = True, t: int = 14, h: int = 56, w: int = 104,
                n_videos: int = 1, remat_policy=None):
    """Build the swan-shape training fwd/step closures + synthetic state.

    Returns dict(fwd=, step=, params=, rng=, batch=, n_params=). fwd/step
    are UNJITTED python callables closing over the module; jit at the call
    site so triage can .lower() them. n_videos stacks videos along batch
    (UNet batch = n_videos*t, the same axis CFG doubles at inference).
    """
    import numpy as np

    from vidseg_diffusion_tpu.diffusion.denoiser import Denoiser
    from vidseg_diffusion_tpu.diffusion.loss import (
        EDMSigmaSampling,
        StandardDiffusionLoss,
    )
    from vidseg_diffusion_tpu.diffusion.scaling import VScalingWithEDMcNoise
    from vidseg_diffusion_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(
        in_channels=8, out_channels=4, model_channels=320, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4),
        num_head_channels=64, context_dim=1024, adm_in_channels=768,
        video=True, dtype=jnp.bfloat16, remat=remat,
        remat_policy=remat_policy,
    )
    unet = UNetModel(cfg)

    x_init = jnp.zeros((t, 16, 16, 8), jnp.bfloat16)
    ts_init = jnp.full((t,), 0.25, jnp.float32)
    ctx_init = jnp.zeros((t, 1, 1024), jnp.bfloat16)
    y_init = jnp.zeros((t, 768), jnp.bfloat16)
    ioi = jnp.zeros((1, t), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0), x_init, ts_init, ctx_init, y_init,
            num_video_frames=t, image_only_indicator=ioi,
        )
    )["params"]

    def synth(key):
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        keys = jax.random.split(key, len(leaves))

        def make(k, s):
            return (jax.random.normal(k, s.shape, jnp.float32) * 0.02).astype(
                jnp.bfloat16
            )

        return jax.tree_util.tree_unflatten(
            treedef, [make(k, s) for k, s in zip(keys, leaves)]
        )

    params = jax.jit(synth)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))

    loss_mod = StandardDiffusionLoss(
        denoiser=Denoiser(VScalingWithEDMcNoise()),
        sigma_sampler=EDMSigmaSampling(),
    )

    # the param tree is remat-invariant, so a second module instance lets
    # callers time the barrier-free (no-remat) forward on the same params
    import dataclasses

    unet_noremat = unet if not remat else UNetModel(
        dataclasses.replace(cfg, remat=False)
    )

    def _factory(module):
        def network_factory(p):
            def network(xs, c_noise, cond_d):
                xs = jnp.concatenate(
                    [xs, cond_d["concat"].astype(xs.dtype)], -1
                )
                return module.apply(
                    {"params": p}, xs, c_noise,
                    cond_d["crossattn"], cond_d["vector"],
                    num_video_frames=t,
                    image_only_indicator=jnp.zeros(
                        (xs.shape[0] // t, t), jnp.bfloat16
                    ),
                )

            return network

        return network_factory

    network_factory = _factory(unet)
    network_factory_noremat = _factory(unet_noremat)

    rng = jax.random.PRNGKey(7)
    bsz = n_videos * t
    batch = jax.random.normal(
        jax.random.fold_in(rng, 1), (bsz, h, w, 4), jnp.bfloat16
    )
    cond = {
        "crossattn": jax.random.normal(
            jax.random.fold_in(rng, 2), (bsz, 1, 1024), jnp.bfloat16
        ),
        "vector": jax.random.normal(
            jax.random.fold_in(rng, 3), (bsz, 768), jnp.bfloat16
        ),
        "concat": jax.random.normal(
            jax.random.fold_in(rng, 4), (bsz, h, w, 4), jnp.bfloat16
        ),
    }

    def fwd(p, rng, batch):
        # the loss re-noises the batch; chain batch <- pred-ish value so
        # repeated dispatches differ
        loss = loss_mod(network_factory(p), rng, batch, cond)
        return loss, batch + loss.astype(batch.dtype) * 1e-6

    def fwd_noremat(p, rng, batch):
        loss = loss_mod(network_factory_noremat(p), rng, batch, cond)
        return loss, batch + loss.astype(batch.dtype) * 1e-6

    def step(p, rng, batch):
        def loss_fn(p):
            return loss_mod(network_factory(p), rng, batch, cond)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        p = jax.tree.map(lambda a, g: (a - 1e-4 * g).astype(a.dtype), p, grads)
        return p, loss, batch + loss.astype(batch.dtype) * 1e-6

    return dict(
        fwd=fwd, fwd_noremat=fwd_noremat, step=step, params=params, rng=rng,
        batch=batch, n_params=n_params, shape=(t, h, w),
        # exposed for train_triage bisection stages
        unet=unet, cond=cond, loss_mod=loss_mod,
        network_factory=network_factory,
        network_factory_noremat=network_factory_noremat,
    )


def probe_b14() -> None:
    """AOT-compile the b=14 (no-CFG, --videos 1) train step and print
    B14_OK. Run in a SUBPROCESS: the known failure mode is the remote
    tpu_compile_helper dying with SIGSEGV on this one program (every
    dispatched kernel compiles standalone; 1.46 MB MLIR, helper-side
    fibers-stack-overflow hypothesis — ROUND_NOTES 'b=14 AOT SIGSEGV').
    tests/tpu/test_compile_smoke.py runs this probe and skips-with-reason
    while the environment bug persists, so a fixed helper is detected
    automatically on the next hardware run."""
    built = build_train(remat=True, n_videos=1)
    step = jax.jit(built["step"], donate_argnums=(0,))
    step.lower(built["params"], built["rng"], built["batch"]).compile()
    print("B14_OK", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--remat", type=int, default=1)
    ap.add_argument("--videos", type=int, default=1,
                    help="videos stacked along batch (UNet batch=videos*14)")
    ap.add_argument("--out", default="BENCH_TRAIN.json")
    ap.add_argument("--remat-policy", default=None,
                    help="jax.checkpoint_policies name for selective remat "
                    "(e.g. dots_with_no_batch_dims_saveable); default full "
                    "per-block recompute")
    ap.add_argument("--probe-b14", action="store_true",
                    help="compile the b=14 train step and exit (subprocess "
                    "canary for the known tpu_compile_helper SIGSEGV)")
    args = ap.parse_args()

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    if args.remat_policy == "save_conv":
        # tag conv outputs so save_only_these_names('conv_out') sees them
        os.environ["VIDSEG_CKPT_NAME_CONVS"] = "1"

    if args.probe_b14:
        probe_b14()
        return

    import numpy as np

    built = build_train(
        remat=bool(args.remat), n_videos=args.videos,
        remat_policy=args.remat_policy,
    )
    t, h, w = built["shape"]
    print(
        f"params: {built['n_params']/1e9:.2f}B bf16 (remat={bool(args.remat)})",
        flush=True,
    )
    fwd = jax.jit(built["fwd"])
    fwd_nr = jax.jit(built["fwd_noremat"])
    # donate params: without it the step holds old + new params (2 x 3 GB)
    # next to grads and remat activations and OOMs 16 GB HBM at b=28
    step = jax.jit(built["step"], donate_argnums=(0,))
    params, rng, batch = built["params"], built["rng"], built["batch"]

    def fetch(a):
        # on-device slice first — np.asarray of the full array would drag
        # it through the ~MB/s tunnel (ROUND_NOTES measurement rules)
        return np.asarray(a.reshape(-1)[:2])

    def timed(fn, state, label):
        state = fn(*state)  # compile + warm
        jax.block_until_ready(state[-1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state = fn(*state)
        jax.block_until_ready(state[-1])
        fetch(state[-1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label}: {dt*1e3:.1f} ms", flush=True)
        return dt

    print("compiling forward (loss only)...", flush=True)
    loss, _ = fwd(params, rng, batch)
    print(f"loss={float(loss):.4f}", flush=True)
    state = (params, rng, batch)

    def fwd_chain(p, r, b):
        _, b2 = fwd(p, r, b)
        return p, r, b2

    def fwd_nr_chain(p, r, b):
        _, b2 = fwd_nr(p, r, b)
        return p, r, b2

    fwd_s = timed(fwd_chain, state, "fwd(remat)" if args.remat else "fwd")
    fwd_nr_s = (
        timed(fwd_nr_chain, state, "fwd(no-remat)") if args.remat else fwd_s
    )

    print("compiling train step (value_and_grad, remat backward)...", flush=True)

    def step_chain(p, r, b):
        p2, _, b2 = step(p, r, b)
        return p2, r, b2

    step_s = timed(step_chain, state, "step")

    result = {
        "shape": f"[{args.videos}x{t},{h},{w}] bf16 swan latents, "
                 f"{'remat' if args.remat else 'no-remat'} 1.52B VideoUNet",
        "remat_policy": args.remat_policy,
        "fwd_ms": round(fwd_nr_s * 1e3, 1),
        "fwd_remat_ms": round(fwd_s * 1e3, 1),
        "step_ms": round(step_s * 1e3, 1),
        # ratio vs the barrier-free forward — the inference/production fwd
        "bwd_fwd_ratio": round((step_s - fwd_nr_s) / fwd_nr_s, 2),
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
