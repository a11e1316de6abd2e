"""Empirical scoped-VMEM calibration for ops.attention.small_batched_attention.

BENCH_r03 crashed at compile: the folded tiny-seq kernel at
bf16[26,392,1280] (b=728, lq=lk=14, hd=1280, fold=28) needs 16.50 MB of
scoped VMEM against the v5e's 16 MB limit, while `_best_fold`'s analytic
model predicted ~8.6 MB under a 12 MB budget. This probe AOT-compiles the
kernel standalone at every temporal/spatial shape the swan 832x448 bench
step dispatches, sweeping fold, and prints PASS/OOM per (shape, fold) so
the model can be re-fit against ground truth instead of guesswork.

Usage:  python scripts/tests/sba_vmem_probe.py            # swan shapes
        python scripts/tests/sba_vmem_probe.py B LQ LK H D FOLD  # one point
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from vidseg_diffusion_tpu.ops import attention as A


def try_compile(b, lq, lk, h, d, fold):
    q = jax.ShapeDtypeStruct((b, lq, h, d), jnp.bfloat16)
    k = jax.ShapeDtypeStruct((b, lk, h, d), jnp.bfloat16)
    v = jax.ShapeDtypeStruct((b, lk, h, d), jnp.bfloat16)
    try:
        jax.jit(
            lambda q, k, v: A._small_batched_attention_impl(
                q, k, v, fold=fold
            )
        ).lower(q, k, v).compile()
        return "PASS", ""
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "vmem" in msg.lower() or "Scoped allocation" in msg:
            # pull out the reported size if present
            import re

            m = re.search(r"size ([0-9.]+[MK]) and limit ([0-9.]+[MK])", msg)
            return "OOM", (m.group(0) if m else msg[:160])
        return "ERR", msg[:200]


def model_bytes(fold, lq, lk, hd, itemsize=2):
    rows, cols = fold * lq, fold * lk
    io = (2 * rows + 2 * cols) * ((hd + 127) // 128 * 128) * 2 * itemsize
    return io, rows * cols


def main():
    if len(sys.argv) == 7:
        b, lq, lk, h, d, fold = map(int, sys.argv[1:])
        shapes = [(b, lq, lk, h, d, [fold])]
    else:
        # swan 832x448 latent 56x104 (s=5824), CFG-doubled 14 frames.
        # temporal (time_stack) attn: B=2*s/ds^2, L=t=14.
        # spatial attn at ds>=4: B=28, L=s/ds^2.
        shapes = [
            # (b, lq, lk, h, d, folds-to-sweep)
            (728, 14, 14, 20, 64, [28, 26, 21, 14, 8, 7]),   # ds4 temporal (the crash)
            (182, 14, 14, 20, 64, [26, 14, 13, 7, 2]),        # ds8 temporal
            (2912, 14, 14, 10, 64, [32, 28, 16, 14, 8]),      # ds2 temporal
            (11648, 14, 14, 5, 64, [32, 28, 16, 14, 8]),      # ds1 temporal
            (28, 364, 364, 20, 64, [1]),                      # ds4 spatial
            (28, 91, 91, 20, 64, [4, 2, 1]),                  # ds8 spatial
        ]
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    for b, lq, lk, h, d, folds in shapes:
        hd = h * d
        for fold in folds:
            if b % fold:
                continue
            io, rc = model_bytes(fold, lq, lk, hd)
            status, info = try_compile(b, lq, lk, h, d, fold)
            print(
                f"b={b:6d} l={lq:4d}x{lk:4d} hd={hd:5d} fold={fold:3d} "
                f"rows={fold*lq:4d} io2buf={io/2**20:6.2f}M rcell={rc*4/2**20:5.2f}M "
                f"-> {status} {info}",
                flush=True,
            )


if __name__ == "__main__":
    main()
