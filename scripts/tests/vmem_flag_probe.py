"""A/B the XLA scoped-VMEM limit on the exact bench step program.

XLA:TPU fusions double-buffer through "scoped" VMEM, default-capped at
16 MB (the BENCH_r03 crash surfaced the same limit for custom calls). Our
Pallas kernels pin their own 64 MB limit (ops/attention._KERNEL_VMEM_LIMIT),
but XLA's OWN conv/elementwise fusions still tile against the 16 MB default;
v5e has 128 MB physical VMEM, so there is real headroom. This probe
recompiles the bench step with --xla_tpu_scoped_vmem_limit_kib raised via
per-compile compiler_options (proto-backed flags are forwarded by the
compile helper; no traced-code or cache-key change for the default build).

    python scripts/tests/vmem_flag_probe.py --kib 32768 [--iters 8]

Chained-step timing identical to bench.time_step so numbers are comparable.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kib", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from bench import build_bench_step

    step, params, x, n_params = build_bench_step()
    fn = getattr(step, "__wrapped__", step)  # un-jit if wrapped
    lowered = jax.jit(fn).lower(params, x)
    opts = {"xla_tpu_scoped_vmem_limit_kib": str(args.kib)}
    t0 = time.perf_counter()
    compiled = lowered.compile(compiler_options=opts)
    print(f"compile({args.kib} KiB scoped vmem): {time.perf_counter()-t0:.1f}s",
          flush=True)

    xx = compiled(params, x)
    xx.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        xx = compiled(params, xx)
    xx.block_until_ready()
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "scoped_vmem_kib": args.kib,
        "step_ms": round(dt * 1e3, 1),
        "frames_per_sec": round(14 / dt, 3),
    }))


if __name__ == "__main__":
    main()
