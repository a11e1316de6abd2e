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


def custom_call_flops(hlo_text: str) -> float:
    """Analytic FLOPs of the Pallas custom calls, which XLA cost_analysis
    scores as ZERO — without this, MFU under-reports by the whole attention
    + temporal-conv + projection share (~9 TF/step at swan scale).

    Shapes come from each call's operand_layout_constraints. The
    small_batched_attention fold is counted at its algorithmic cost is not
    recoverable from the folded operands, so it is skipped (<0.5 TF)."""
    import re

    total = 0.0
    for m in re.finditer(
        r"%(\w+)[\w.\-]* = .*? custom-call\(.*?"
        # the constraint list nests one brace level per operand layout:
        # {bf16[a,b]{1,0}, bf16[c,d]{1,0}} — [^}]* would stop at the FIRST
        # inner '}' and drop every operand but the first
        r"operand_layout_constraints=\{((?:[^{}]|\{[^{}]*\})*)\}",
        hlo_text,
    ):
        # custom-call instrs carry the enclosing jitted fn's name; the
        # custom_vjp refactor renamed those to _<op>_impl — normalize
        kind = m.group(1).lstrip("_")
        if kind.endswith("_impl"):
            kind = kind[: -len("_impl")]
        shapes = [
            [int(d) for d in dims.split(",") if d]
            for dims in re.findall(r"\w+\[([\d,]*)\]", m.group(2))
        ]
        try:
            if kind.startswith("temporal_conv"):
                (b, t, mm, cin), (kt, _, cout) = shapes[0], shapes[1]
                total += 2.0 * kt * b * t * mm * cin * cout
            elif kind.startswith("flash_attention_packed"):
                (b, lq, hd), (_, lk, _) = shapes[0], shapes[1]
                total += 4.0 * b * lq * lk * hd
            elif kind.startswith("flash_attention"):
                (bh, lq, d), (_, lk, _) = shapes[0], shapes[1]
                total += 4.0 * bh * lq * lk * d
            elif kind.startswith("matmul_bias"):
                (mm, k), (_, n) = shapes[0], shapes[1]
                total += 2.0 * mm * k * n
            elif kind.startswith("conv3x3"):
                # first operand is the 5-D halo view [B, H/k, k+2, W, C]
                (b, nb, kp2, ww, cin), (_, _, _, cout) = shapes[0], shapes[1]
                total += 2.0 * 9 * b * nb * (kp2 - 2) * ww * cin * cout
            # group_norm etc.: bandwidth-bound, negligible flops
        except (IndexError, ValueError):
            # unknown operand layout for this call — under-count rather
            # than crash the profile
            print(f"custom_call_flops: skipped {kind} {shapes}",
                  file=sys.stderr)
    return total


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
    cc_flops = custom_call_flops(compiled.as_text())
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16.get(kind)
    total_flops = flops + cc_flops
    mfu = total_flops / dt / peak if peak else None

    out = {
        "device": kind,
        "step_ms": round(dt * 1e3, 2),
        "params_b": round(n_params / 1e9, 3),
        "flops_per_step": total_flops,
        "flops_xla": flops,
        "flops_custom_calls": cc_flops,
        "tflops_per_sec": round(total_flops / dt / 1e12, 1),
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


def parse_top_ops(logdir, n=20, iters=2):
    """Top HLO-op groups by device time, parsed directly from the xplane
    protobuf (the tensorboard profile plugin's generated protos are
    incompatible with this protobuf install). Fusion instances are
    collapsed by base name; note that on TPU XLA fuses GroupNorm statistics
    into the PRECEDING convolution, so 'convert_reduce_fusion' rows are
    conv+stats kernels, not standalone norms."""
    import collections

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        print("xplane_pb2 unavailable", file=sys.stderr)
        return None
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        return None
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(xplanes)[-1], "rb").read())
    planes = [pl for pl in xs.planes if "TPU" in pl.name]
    if not planes:
        return None
    md = planes[0].event_metadata
    agg = collections.Counter()
    cnt = collections.Counter()
    for line in planes[0].lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            base = md[ev.metadata_id].name.split(".")[0].split(" ")[0]
            if base.startswith("%while"):
                continue  # nests all children
            agg[base] += ev.duration_ps
            cnt[base] += 1
    return [
        {
            "op": name,
            "ms_per_step": round(t / 1e9 / iters, 2),
            "count_per_step": cnt[name] // iters,
        }
        for name, t in agg.most_common(n)
    ]


if __name__ == "__main__":
    main()
