"""Triage the train-step compile SIGSEGV (BENCH_TRAIN blocker).

The remat'd swan-shape training forward crashed the remote tpu_compile_helper
subprocess with SIGSEGV (train_bench_r4b.log). This script isolates the
crasher without paying full-program compiles blindly:

1. trace-only lower of fwd on the TPU backend with ops.attention.DISPATCH_LOG
   set -> the exact Pallas kernel shapes the train program dispatches
   (batch=14, no CFG doubling -> shapes the bench/compile-smoke never saw);
2. compile each dispatched kernel shape STANDALONE (small programs; a
   compile-helper SIGSEGV surfaces as a catchable JaxRuntimeError);
3. if all kernels pass, bisect the full program: fwd remat=0, then fwd
   remat=1, then the grad step.

Run serialized with other TPU jobs:

    python scripts/tests/train_triage.py [--stage kernels|fwd0|fwd1|step]
"""

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def _kernel_fn_args(rec):
    """Return (fn, args) reproducing one dispatched kernel call."""
    from vidseg_diffusion_tpu.ops import attention as A
    from vidseg_diffusion_tpu.ops.temporal_conv import temporal_conv_1x1

    dtype = jnp.bfloat16 if "bfloat16" in rec["dtype"] else jnp.float32
    if rec["kind"] == "temporal_conv":
        b, t, m, cin, kt, cout = (
            rec["b"], rec["t"], rec["m"], rec["cin"], rec["kt"], rec["cout"]
        )
        x = jnp.zeros((b, t, m, cin), dtype)
        w = jnp.zeros((kt, cin, cout), dtype)
        bias = jnp.zeros((cout,), dtype)
        return temporal_conv_1x1, (x, w, bias)

    b, lq, lk, h, d = rec["b"], rec["lq"], rec["lk"], rec["h"], rec["d"]
    q = jnp.zeros((b, lq, h, d), dtype)
    k = jnp.zeros((b, lk, h, d), dtype)
    v = jnp.zeros((b, lk, h, d), dtype)
    if rec["kind"] == "small_batched":
        fn = lambda q, k, v: A.small_batched_attention(q, k, v, fold=rec["fold"])
    else:
        fn = lambda q, k, v: A.flash_attention_packed(
            q.reshape(b, lq, h * d), k.reshape(b, lk, h * d),
            v.reshape(b, lk, h * d), heads=h,
        ).reshape(b, lq, h, d)
    return fn, (q, k, v)


def compile_kernel(rec, grad: bool = False) -> str:
    """Compile one dispatched kernel shape standalone; returns status."""
    fn, args = _kernel_fn_args(rec)
    if grad:
        scalar = lambda *a: fn(*a).astype(jnp.float32).sum()
        run = jax.grad(scalar, argnums=tuple(range(len(args))))
    else:
        run = fn
    t0 = time.perf_counter()
    try:
        jax.jit(run).lower(*args).compile()
        return f"ok ({time.perf_counter()-t0:.1f}s)"
    except Exception as e:  # noqa: BLE001 — triage wants the message, not a crash
        return f"FAIL: {type(e).__name__}: {str(e)[:300]}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="kernels",
                    choices=["kernels", "fwd0", "fwd1", "step0", "step1",
                             "unet0", "unet1", "noloss0"])
    ap.add_argument("--videos", type=int, default=1,
                    help="videos stacked along batch (b=videos*14; the bench "
                         "inference program compiles at b=28, b=14 SIGSEGVs "
                         "the compile helper)")
    ap.add_argument("--xla", action="store_true",
                    help="disable every Pallas kernel (attention -> jnp "
                         "reference, temporal conv -> XLA) to split "
                         "'custom calls crash the helper' from 'the base "
                         "program crashes the helper'")
    args = ap.parse_args()

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    print("backend:", jax.default_backend(), flush=True)

    from vidseg_diffusion_tpu.ops import attention as A

    if args.xla:
        from vidseg_diffusion_tpu.ops import temporal_conv as TC

        A._FLASH_MIN_SEQ = 1 << 30   # flash never triggers
        A._SMALL_MIN_ROWS = 1 << 30  # small-batched never triggers
        TC.use_pallas_temporal_conv = lambda *a, **k: False
        print("pallas kernels DISABLED (pure-XLA program)", flush=True)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_bench import build_train  # noqa: E402 — sibling script

    if args.stage == "kernels":
        # 1. trace-only lower: collect dispatched kernel shapes (no compile)
        A.DISPATCH_LOG = []
        built = build_train(remat=True)
        jax.jit(built["fwd"]).lower(built["params"], built["rng"], built["batch"])
        seen = {}
        for rec in A.DISPATCH_LOG:
            seen[tuple(sorted(rec.items()))] = rec
        print(f"{len(seen)} distinct kernel dispatches in fwd:", flush=True)
        A.DISPATCH_LOG = None
        for rec in seen.values():
            print(f"  {rec}", flush=True)
        # 2. compile each standalone — fwd and grad
        def label(rec):
            return " ".join(f"{k}={v}" for k, v in rec.items() if k != "dtype")

        for rec in seen.values():
            print(f"fwd  {label(rec)}: {compile_kernel(rec)}", flush=True)
        for rec in seen.values():
            print(f"grad {label(rec)}: {compile_kernel(rec, grad=True)}",
                  flush=True)
        return

    remat = args.stage.endswith("1")
    built = build_train(remat=remat, n_videos=args.videos)
    if args.stage.startswith("unet"):
        # bare UNet apply at the exact train shapes: no loss module, no rng
        net_of = built["network_factory"]
        cond = built["cond"]
        sigma = jnp.full((built["batch"].shape[0],), 0.25, jnp.float32)

        def fn(p, rng, batch):
            del rng
            return net_of(p)(batch, sigma, cond).astype(jnp.float32).mean()

    elif args.stage == "noloss0":
        # denoiser + UNet but fixed sigma (no rng/sigma-sampler machinery)
        from vidseg_diffusion_tpu.utils import append_dims

        loss_mod, net_of = built["loss_mod"], built["network_factory"]
        cond = built["cond"]

        def fn(p, rng, batch):
            del rng
            sigma = jnp.full((batch.shape[0],), 0.7, batch.dtype)
            noised = batch + 0.1 * append_dims(sigma, batch.ndim)
            pred = loss_mod.denoiser(net_of(p), noised, sigma, cond)
            return jnp.mean((pred - batch).astype(jnp.float32) ** 2)

    elif args.stage.startswith("fwd"):
        fn = built["fwd"]
    else:
        fn = built["step"]
    name = f"{args.stage}(remat={remat})"
    t0 = time.perf_counter()
    try:
        jax.jit(fn).lower(built["params"], built["rng"], built["batch"]).compile()
        print(f"{name}: compile ok ({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception:  # noqa: BLE001
        print(f"{name}: COMPILE FAILED after {time.perf_counter()-t0:.1f}s", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()
