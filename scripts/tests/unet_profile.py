"""Characterize the bench UNet denoise step on the real TPU: measured step
time, analytic/compiled FLOPs → MFU, and an xprof HLO-op breakdown.

Replaces eyeballing: the round-1 claim "MXU-saturated at 640 ms" was from a
single dispatch-layout data point (ROUND_NOTES.md r1); this script records
what the chip actually spends the step on. Writes PROFILE_UNET.json at the
repo root and (optionally) leaves the raw xprof trace under --logdir.

Run on the tunneled TPU (serialize with other TPU jobs):
    python scripts/tests/unet_profile.py
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

# v5e (TPU v5 lite) peak: 197 bf16 TFLOP/s per chip (public spec)
PEAK_BF16 = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v4": 275e12}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/xprof_unet")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip-trace", action="store_true")
    args = ap.parse_args()

    from bench import build_bench_step, time_step

    step, params, x, n_params = build_bench_step()
    dt = time_step(step, params, x, n_iter=args.iters)

    compiled = step.lower(params, x).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16.get(kind)
    mfu = flops / dt / peak if peak else None

    out = {
        "device": kind,
        "step_ms": round(dt * 1e3, 2),
        "params_b": round(n_params / 1e9, 3),
        "flops_per_step": flops,
        "tflops_per_sec": round(flops / dt / 1e12, 1),
        "peak_bf16_tflops": peak / 1e12 if peak else None,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "bytes_accessed_per_step": bytes_acc,
        "hbm_gbps": round(bytes_acc / dt / 1e9, 1),
    }
    print(json.dumps(out, indent=2))

    if not args.skip_trace:
        os.makedirs(args.logdir, exist_ok=True)
        jax.profiler.start_trace(args.logdir)
        y = x
        for _ in range(2):
            y = step(params, y)
        y.block_until_ready()
        jax.profiler.stop_trace()
        top = parse_top_ops(args.logdir)
        if top:
            out["top_ops"] = top
            print(json.dumps({"top_ops": top}, indent=2))

    with open("PROFILE_UNET.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote PROFILE_UNET.json", file=sys.stderr)


def parse_top_ops(logdir, n=25):
    """Top self-time HLO ops from the xprof trace via the tensorboard
    profile plugin's converters (no TensorBoard server needed)."""
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    except ImportError:
        print("tensorboard_plugin_profile not available", file=sys.stderr)
        return None
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        return None
    xplane = sorted(xplanes)[-1]
    try:
        data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    except Exception as e:
        print(f"op-stats conversion failed: {e}", file=sys.stderr)
        return None
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", errors="replace")
    try:
        rows = json.loads(data)
    except json.JSONDecodeError:
        print("unexpected op-stats payload", file=sys.stderr)
        return None
    # payload: list of tables; first table rows = op stats
    return rows[:n] if isinstance(rows, list) else rows


if __name__ == "__main__":
    main()
