"""Benchmark: SVD video-UNet denoise-step throughput at swan resolution.

Measures the dominant cost of the VidSeg pipeline — the UNet forward over a
CFG-doubled 14-frame batch (guiders.py:95-100 layout) at the swan demo's
latent resolution (854×480 → 832×448 → 104×56 latents,
svd_single_video_inference.py:238-240) — on the real architecture
(model_channels=320, channel_mult [1,2,4,4], configs/inference/svd.yaml) in
bfloat16 with random weights (weights don't change FLOPs or layout; the
reference checkpoints are not available in this container).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the previous round's recorded value when a
BENCH_r*.json exists, else 1.0.

Steps are chained (x_{i+1} = step(x_i)) so the tunnel cannot serve cached
results for repeated identical dispatches.
"""

import glob
import json
import sys
import time

import jax
import jax.numpy as jnp


def build_bench_step(t=14, h_lat=448 // 8, w_lat=832 // 8):
    """The benchmark program: one jitted SVD-UNet denoise step on the
    CFG-doubled frame batch. Shared with scripts/tests/unet_profile.py so
    profiling measures the exact program the bench times (and hits the same
    compilation cache entry)."""
    import os

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    bt = 2 * t

    from vidseg_diffusion_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(
        in_channels=8, out_channels=4, model_channels=320, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4),
        num_head_channels=64, context_dim=1024, adm_in_channels=768,
        video=True, dtype=jnp.bfloat16,
    )
    unet = UNetModel(cfg)

    # abstract init (no device compute), then synthesize bf16 params on
    # device — random values, correct shapes; values don't affect timing
    x_init = jnp.zeros((bt, 16, 16, 8), jnp.bfloat16)
    ts = jnp.full((bt,), 0.25, jnp.float32)
    ctx_init = jnp.zeros((bt, 1, 1024), jnp.bfloat16)
    y_init = jnp.zeros((bt, 768), jnp.bfloat16)
    ioi = jnp.zeros((2, t), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0), x_init, ts, ctx_init, y_init,
            num_video_frames=t, image_only_indicator=ioi,
        )
    )["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def make_params(key):
        outs = []
        for i, s in enumerate(leaves):
            k = jax.random.fold_in(key, i)
            if s.ndim <= 1:  # biases / norm scales: scale=1, bias=0 regime
                outs.append(jnp.ones(s.shape, jnp.bfloat16) * 0.5)
            else:
                outs.append(
                    jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02
                )
        return jax.tree_util.tree_unflatten(treedef, outs)

    params = make_params(jax.random.PRNGKey(0))
    n_params = sum(a.size for a in jax.tree.leaves(params))

    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (bt, h_lat, w_lat, 8), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (bt, 1, 1024), jnp.bfloat16)
    y = jax.random.normal(jax.random.PRNGKey(3), (bt, 768), jnp.bfloat16)

    @jax.jit
    def step(params, x):
        out = unet.apply(
            {"params": params}, x, ts, ctx, y,
            num_video_frames=t, image_only_indicator=ioi,
        )
        # chain: keep batch/channel shape by re-concatenating the 4-ch output
        return jnp.concatenate([out, out], axis=-1).astype(jnp.bfloat16)

    return step, params, x, n_params


def time_step(step, params, x, n_iter=8):
    x = step(params, x)  # compile + warmup
    x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        x = step(params, x)
    x.block_until_ready()
    return (time.perf_counter() - t0) / n_iter


def main():
    t = 14
    step, params, x, n_params = build_bench_step(t=t)
    dt = time_step(step, params, x)
    bt, h_lat, w_lat = x.shape[0], x.shape[1], x.shape[2]

    frames_per_sec = t / dt  # 14 video frames denoised per step

    prev = None
    rounds = sorted(glob.glob("BENCH_r*.json"))
    if rounds:
        try:
            with open(rounds[-1]) as f:
                rec = json.load(f)
            # driver wraps the bench line under "parsed"
            rec = rec.get("parsed", rec)
            if rec.get("unit") == "frames/sec/chip":
                prev = float(rec["value"])
        except Exception:
            prev = None
    vs_baseline = frames_per_sec / prev if prev else 1.0

    print(json.dumps({
        "metric": "svd_unet_denoise_step_throughput_swan_832x448",
        "value": round(frames_per_sec, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
    }))
    print(
        f"# params={n_params/1e9:.2f}B step={dt*1e3:.1f}ms "
        f"batch={bt}x{h_lat}x{w_lat} backend={jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
