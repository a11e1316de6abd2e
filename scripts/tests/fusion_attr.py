"""Attribute the generic %fusion time in PROFILE_UNET.json to actual fused
computations: join per-instance durations from the xprof xplane with the
fusion bodies in the compiled HLO dump.

    python scripts/tests/fusion_attr.py [--logdir /tmp/xprof_unet] [--top 30]

The xplane gives `%fusion.1234` → picoseconds; the HLO dump gives
`%fusion.1234 = bf16[...] fusion(...), calls=%fused_computation.N` whose body
says what the kernel actually is (rearrange? GN apply? residual add?).
Run after scripts/tests/unet_profile.py (which leaves the trace in --logdir);
uses the cached TPU compile for the HLO text, so no recompute when warm.
"""

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def instance_times(logdir, prefixes=("%fusion",), iters=2):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(xplanes)[-1], "rb").read())
    plane = [pl for pl in xs.planes if "TPU" in pl.name][0]
    md = plane.event_metadata
    agg = collections.Counter()
    cnt = collections.Counter()
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = md[ev.metadata_id].name.split(" ")[0]
            if any(name.startswith(p) and not name.startswith(p + "_")
                   for p in prefixes):
                agg[name] += ev.duration_ps
                cnt[name] += 1
    return {n: (t / 1e9 / iters, cnt[n] // iters) for n, t in agg.items()}


def fusion_bodies(hlo_path):
    """fusion instr name -> (output shape, called computation name);
    computation name -> compressed body description."""
    txt = open(hlo_path).read()
    inst = {}
    for m in re.finditer(
        r"(%[\w.\-]+) = (.+?) fusion\(.*?calls=(%[\w.\-]+)", txt
    ):
        inst[m.group(1)] = (m.group(2), m.group(3))

    comps = {}
    cur, ops = None, None
    for line in txt.splitlines():
        m = re.match(r"(%fused_computation[\w.\-]*) ", line.strip())
        if line.startswith("%fused_computation"):
            cur = line.split(" ")[0]
            ops = collections.Counter()
            comps[cur] = ops
            continue
        if cur is None:
            continue
        ls = line.strip()
        if ls.startswith("}"):
            cur = None
            continue
        m = re.match(r"[\w.\-%]+ = (\S+?) ([a-z\-]+)[(.]", ls)
        if m and ops is not None:
            ops[m.group(2)] += 1
    return inst, comps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/xprof_unet")
    ap.add_argument("--hlo", default="/tmp/unet_hlo.txt")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--prefix", default="%fusion")
    args = ap.parse_args()

    if not os.path.exists(args.hlo):
        from bench import build_bench_step

        step, params, x, _ = build_bench_step()
        txt = step.lower(params, x).compile().as_text()
        with open(args.hlo, "w") as f:
            f.write(txt)
        print(f"wrote {args.hlo}", file=sys.stderr)

    times = instance_times(args.logdir, prefixes=(args.prefix,))
    inst, comps = fusion_bodies(args.hlo)

    # group instances by their body signature (op-kind histogram + out shape
    # stripped of dims) so repeated per-block kernels aggregate
    groups = collections.defaultdict(lambda: [0.0, 0, None])
    for name, (ms, n) in times.items():
        shape, comp = inst.get(name, ("?", None))
        body = comps.get(comp)
        sig = (
            re.sub(r"\{[^}]*\}", "", shape),
            tuple(sorted(body.items())) if body else ("?",),
        )
        g = groups[sig]
        g[0] += ms
        g[1] += n
        g[2] = name
    rows = sorted(groups.items(), key=lambda kv: -kv[1][0])[: args.top]
    total = sum(ms for ms, _ in times.values())
    print(f"total {args.prefix} time: {total:.1f} ms/step over "
          f"{sum(n for _, n in times.values())} instances\n")
    for (shape, body), (ms, n, ex) in rows:
        ops = " ".join(f"{k}x{v}" for k, v in body) if body != ("?",) else "?"
        print(f"{ms:7.2f} ms x{n:4d}  {shape:28s} {ops}   e.g. {ex}")


if __name__ == "__main__":
    main()
