"""Attribute the bench UNet step's %copy / %reshape HLO ops by shape.

PROFILE_UNET.json says 734 copies (53.9 ms) + 458 reshapes (21.1 ms) per
step; before refactoring layouts, find out WHICH tensors they move. Uses the
cached TPU compile of the exact bench program, so this is cheap when the
persistent cache is warm.

    python scripts/tests/hlo_copies.py [--out /tmp/unet_hlo.txt]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def parse_bytes(shape: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    dt, dims = m.groups()
    size = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "pred": 1, "u8": 1,
            "s8": 1, "f64": 8, "u32": 4}.get(dt, 2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/unet_hlo.txt")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from bench import build_bench_step

    step, params, x, _ = build_bench_step()
    compiled = step.lower(params, x).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt)/1e6:.1f} MB)", file=sys.stderr)

    for opname in ("copy", "reshape", "transpose", "bitcast"):
        hist = collections.Counter()
        nbytes = collections.Counter()
        pat = re.compile(
            rf"%?[\w.\-]+ = (\S+) {opname}\((\S+ )?%?[\w.\-]+\)"
        )
        for line in txt.splitlines():
            ls = line.strip()
            m = re.match(rf"[\w.\-%]+ = (\S+?) {opname}\(", ls)
            if m:
                shape = m.group(1)
                hist[shape] += 1
                nbytes[shape] += parse_bytes(shape)
        total_b = sum(nbytes.values())
        print(f"\n== {opname}: {sum(hist.values())} ops, "
              f"{total_b/1e9:.3f} GB output ==")
        for shape, cnt in sorted(hist.items(), key=lambda kv: -nbytes[kv[0]])[: args.top]:
            print(f"  {cnt:4d} x {shape:60s} {nbytes[shape]/1e6:9.1f} MB")


if __name__ == "__main__":
    main()
