"""Attention layout micro-bench: packed all-heads kernel vs transpose+flash.

Decides whether the zero-relayout packed kernel (flash_attention_packed on
[B, L, H·D]) beats transpose-into-head-major + the 3-D flash kernel at the
swan spatial shapes, and whether the blhd jnp path beats the transposed one
at the temporal shapes. Chained iterations (outputs feed inputs, slice
fetched) so the tunnel cannot serve cached results.

    python scripts/tests/attn_layout_bench.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def bench(loop_fn, x0, iters, name, flops):
    import numpy as np

    def fetch(t):
        # slice ON DEVICE before transfer — np.asarray(t) would pull the
        # whole ~100 MB array through the ~12 MB/s dev tunnel (~9 s), which
        # swamps the measurement entirely.
        return np.asarray(t.reshape(-1)[:2])

    try:
        x = loop_fn(x0)
        _ = fetch(x)
    except Exception as e:
        print(f"{name}: FAILED ({str(e)[:160]})")
        return None
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        x = loop_fn(x)
        _ = fetch(x)
    dt = (time.perf_counter() - t0) / (reps * iters)
    print(f"{name}: {dt*1e3:.3f} ms/call  {flops/dt/1e12:.1f} TF/s", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    print("backend:", jax.default_backend(), flush=True)
    assert jax.default_backend() == "tpu", (
        "TPU not available (claimed by another process?) — numbers would "
        "be CPU garbage"
    )

    from vidseg_diffusion_tpu.ops.attention import (
        flash_attention,
        flash_attention_packed,
        mha_reference,
    )

    # ---- spatial shapes (flash path) ------------------------------------
    for (b, h, l, d, tag) in [
        (28, 5, 5824, 64, "spatial ds1"),
        (28, 10, 1456, 64, "spatial ds2"),
    ]:
        print(f"== {tag}: b={b} h={h} l={l} d={d} bf16 ==")
        flops = 4.0 * b * h * l * l * d
        q0 = jax.random.normal(
            jax.random.PRNGKey(0), (b, l, h * d), jnp.bfloat16
        ) * 0.1

        @jax.jit
        def loop_packed(q, _h=h, _it=args.iters):
            def body(i, q):
                out = flash_attention_packed(q, q, q, heads=_h)
                return (out * 0.5 + q * 0.5).astype(q.dtype)
            return jax.lax.fori_loop(0, _it, body, q)

        @jax.jit
        def loop_transpose(q, _h=h, _d=d, _it=args.iters):
            # the status-quo path: blhd -> head-major copies -> 3-D kernel
            def body(i, q):
                b_, l_, hd_ = q.shape
                qh = jnp.moveaxis(q.reshape(b_, l_, _h, _d), 2, 1)
                out = flash_attention(qh, qh, qh)
                out = jnp.moveaxis(out, 1, 2).reshape(b_, l_, hd_)
                return (out * 0.5 + q * 0.5).astype(q.dtype)
            return jax.lax.fori_loop(0, _it, body, q)

        bench(loop_packed, q0, args.iters, "packed all-heads kernel", flops)
        bench(loop_transpose, q0, args.iters, "transpose + 3-D kernel ", flops)

    # ---- temporal shapes (jnp path) -------------------------------------
    for (b, h, t, d, tag) in [
        (11648, 5, 14, 64, "temporal ds1"),
        (2912, 10, 14, 64, "temporal ds2"),
    ]:
        print(f"== {tag}: b={b} h={h} t={t} d={d} bf16 ==")
        flops = 4.0 * b * h * t * t * d
        q0 = jax.random.normal(
            jax.random.PRNGKey(1), (b, t, h, d), jnp.bfloat16
        ) * 0.1

        @jax.jit
        def loop_blhd(q, _it=args.iters):
            def body(i, q):
                out = mha_reference(q, q, q, layout="blhd")
                return (out * 0.5 + q * 0.5).astype(q.dtype)
            return jax.lax.fori_loop(0, _it, body, q)

        @jax.jit
        def loop_bhld(q, _it=args.iters):
            def body(i, q):
                qh = jnp.moveaxis(q, 2, 1)
                out = mha_reference(qh, qh, qh)
                return (jnp.moveaxis(out, 1, 2) * 0.5 + q * 0.5).astype(q.dtype)
            return jax.lax.fori_loop(0, _it, body, q)

        bench(loop_blhd, q0, args.iters, "blhd einsums          ", flops)
        bench(loop_bhld, q0, args.iters, "transpose + bhld einsum", flops)


if __name__ == "__main__":
    main()
