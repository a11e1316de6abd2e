"""Per-op attribution of the swan-shape TRAIN step on the real TPU.

BENCH_TRAIN.json measured the first hardware train step at 3181 ms vs a
504 ms forward (bwd/fwd 5.3) — far above the ~4x FLOP ratio a remat'd
backward should cost (fwd + recompute + 2x-FLOP backward). This script
traces the actual step and attributes where the extra time goes before any
backward-kernel work is committed (VERDICT r3 #6: "go/no-go on the Pallas
backward with data").

Run serialized with other TPU jobs:
    python scripts/tests/train_profile.py [--videos 2]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=2,
                    help="b=videos*14 (b=14 SIGSEGVs the AOT compile helper)")
    ap.add_argument("--remat", type=int, default=1)
    ap.add_argument("--logdir", default="/tmp/xprof_train")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default="PROFILE_TRAIN.json")
    args = ap.parse_args()

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from train_bench import build_train
    from unet_profile import parse_top_ops

    built = build_train(remat=bool(args.remat), n_videos=args.videos)
    step = jax.jit(built["step"], donate_argnums=(0,))
    params, rng, batch = built["params"], built["rng"], built["batch"]

    # warm (compile via cache)
    p, loss, batch = step(params, rng, batch)
    jax.block_until_ready(loss)
    print(f"warm loss={float(loss):.4f}", flush=True)

    iters = 2
    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    for _ in range(iters):
        p, loss, batch = step(p, rng, batch)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()

    top = parse_top_ops(args.logdir, n=args.top, iters=iters)
    out = {"shape": f"[{args.videos}x14,56,104]",
           "remat": bool(args.remat), "top_ops": top}
    print(json.dumps(out, indent=2))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
