"""Manual attention benchmark/profiling harness.

Counterpart of the reference's scripts/tests/attention.py (a torch.profiler
SDPA micro-benchmark, SURVEY.md §4): compares the Pallas flash kernel
against XLA's materialized-logits attention at VidSeg working sizes, with
optional block-size sweeps and xprof traces.

Timing note for the axon-tunneled chip: identical dispatches are served from
a cache and `block_until_ready` alone under-reports — every iteration here
chains outputs into inputs and fetches a slice to force real execution.

Usage:
  python scripts/tests/attention.py                 # default size sweep
  python scripts/tests/attention.py --l 5824 --h 5  # swan ds=1
  python scripts/tests/attention.py --sweep-blocks
  python scripts/tests/attention.py --trace /tmp/xprof
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def bench(fn, q0, iters, name, flops):
    import jax
    import numpy as np

    @jax.jit
    def loop(q):
        def body(i, q):
            out = fn(q, q, q)
            return (out * 0.5 + q * 0.5).astype(q.dtype)
        return jax.lax.fori_loop(0, iters, body, q)

    try:
        x = loop(q0)
        _ = np.asarray(x[0, 0, 0, :2])
    except Exception as e:
        print(f"{name}: FAILED ({str(e)[:120]})")
        return None
    t0 = time.perf_counter()
    for _ in range(2):
        x = loop(x)
        _ = np.asarray(x[0, 0, 0, :2])
    dt = (time.perf_counter() - t0) / (2 * iters)
    print(f"{name}: {dt*1e3:.3f} ms/call  {flops/dt/1e12:.1f} TF/s")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=28)
    p.add_argument("--h", type=int, default=10)
    p.add_argument("--l", type=int, default=1456)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--sweep-blocks", action="store_true")
    p.add_argument("--skip-xla", action="store_true",
                   help="skip the XLA path (OOMs at L≥~4k: it materializes [L,L] logits)")
    p.add_argument("--trace", default=None, help="xprof trace dir")
    args = p.parse_args()

    from vidseg_diffusion_tpu.utils import ensure_backend

    print("backend:", ensure_backend())

    import jax
    import jax.numpy as jnp

    from vidseg_diffusion_tpu.ops.attention import flash_attention, mha_reference
    from vidseg_diffusion_tpu.utils.profiling import trace

    B, H, L, D = args.b, args.h, args.l, args.d
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    q0 = jax.random.normal(jax.random.PRNGKey(0), (B, H, L, D), dtype=dt)
    flops = 4 * B * H * L * L * D
    print(f"shape [{B},{H},{L},{D}] {args.dtype}")

    import contextlib

    ctx = trace(args.trace) if args.trace else contextlib.nullcontext()
    with ctx:
        bench(lambda a, b, c: flash_attention(a, b, c), q0, args.iters,
              "flash (default blocks)", flops)
        if args.sweep_blocks:
            for bq, bk in [(256, 256), (512, 512), (512, 1536), (256, 1536)]:
                bench(
                    lambda a, b, c, bq=bq, bk=bk: flash_attention(
                        a, b, c, block_q=bq, block_k=bk
                    ),
                    q0, args.iters, f"flash q{bq} k{bk}", flops,
                )
        if not args.skip_xla:
            bench(mha_reference, q0, args.iters, "xla (materialized logits)", flops)


if __name__ == "__main__":
    main()
