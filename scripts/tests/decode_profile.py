"""Characterize the temporal VideoDecoder decode on the real TPU.

The masks=20 sweep (BENCH_SWEEP_M20.json) showed each modulated run costs
12.16 s = 5.4 s denoise + ~6.5 s DECODE of its 14 frames — the decode is
now the larger half of a run and the dominant single-chip lever for the
VSPW metric of record. This measures the exact production decode program
(fs.jit_decode, chunk=decoding_t) at swan scale, computes MFU, and dumps
the xprof op table. Writes PROFILE_DECODE.json.

Run serialized with other TPU jobs:
    python scripts/tests/decode_profile.py [--decoding_t 7]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from unet_profile import PEAK_BF16, custom_call_flops, parse_top_ops  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--decoding_t", type=int, default=7)
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--height", type=int, default=448)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--logdir", default="/tmp/xprof_decode")
    ap.add_argument("--skip-trace", action="store_true")
    ap.add_argument("--out", default="PROFILE_DECODE.json")
    args = ap.parse_args()

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from vidseg_diffusion_tpu.engine.build import build_pipeline

    pipeline = build_pipeline(
        "configs/inference/svd.yaml", ckpt_path=None,
        num_steps=25, num_frames=args.frames, dtype=jnp.bfloat16,
    )
    fs = pipeline.first_stage
    t, h_lat, w_lat = args.frames, args.height // 8, args.width // 8
    z = jax.random.normal(
        jax.random.PRNGKey(0), (t, h_lat, w_lat, 4), jnp.float32
    ) * 0.18215

    def run(z):
        return fs.jit_decode(fs.params_decoder, z, chunk=args.decoding_t)

    # warm/compile, then chained timing (new input each iter via roll so
    # the tunnel cannot serve cached dispatches)
    out = run(z)
    out.block_until_ready()
    t0 = time.perf_counter()
    zz = z
    for i in range(args.iters):
        zz = jnp.roll(zz, i + 1, axis=0)
        out = run(zz)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / args.iters

    lowered = fs.jit_decode.lower(
        fs.params_decoder, z, chunk=args.decoding_t
    )
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0))
    cc_flops = custom_call_flops(compiled.as_text())
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16.get(kind)
    total_flops = flops + cc_flops
    result = {
        "device": kind,
        "what": f"VideoDecoder {t}x{h_lat}x{w_lat} latents -> "
                f"{args.height}x{args.width} frames, chunk={args.decoding_t}",
        "decode_ms": round(dt * 1e3, 2),
        "ms_per_frame": round(dt * 1e3 / t, 2),
        "flops": total_flops,
        "flops_custom_calls": cc_flops,
        "tflops_per_sec": round(total_flops / dt / 1e12, 1),
        "mfu": round(total_flops / dt / peak, 4) if peak else None,
        "bytes_accessed": bytes_acc,
        "hbm_gbps": round(bytes_acc / dt / 1e9, 1),
    }
    print(json.dumps(result, indent=2))

    if not args.skip_trace:
        os.makedirs(args.logdir, exist_ok=True)
        jax.profiler.start_trace(args.logdir)
        for i in range(2):
            zz = jnp.roll(zz, i + 1, axis=0)
            out = run(zz)
        out.block_until_ready()
        jax.profiler.stop_trace()
        top = parse_top_ops(args.logdir, n=24, iters=2)
        if top:
            result["top_ops"] = top
            print(json.dumps({"top_ops": top}, indent=2))

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
