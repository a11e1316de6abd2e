"""Block sweep for the Pallas flash-attention BACKWARD kernels on the TPU.

The dq/dkv reverse kernels (ops/attention.py) default to a conservative
14 MB VMEM budget, which caps block_k well below the forward kernel's
single/dual-pass configs. This sweeps (block_q, block_k) at the swan train
shapes with the budget lifted, timing the full bwd impl (both kernels) with
CHAINED inputs so the tunnel cannot serve cached dispatches
(ROUND_NOTES measurement rules: never time repeated identical dispatches).

Run serialized with other TPU jobs:
    python scripts/tests/attn_bwd_tune.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def main():
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    print("backend:", jax.default_backend(), flush=True)

    from vidseg_diffusion_tpu.ops import attention as A

    A._BWD_VMEM_BUDGET = 48 * 1024 * 1024  # let explicit blocks through

    shapes = [
        # (b, l, heads) — swan train spatial attention sites
        (28, 5824, 5),
        (28, 1456, 10),
    ]
    for b, l, h in shapes:
        d, hd = 64, h * 64
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, l, hd), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (b, l, hd), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (b, l, hd), jnp.bfloat16)
        g = jax.random.normal(jax.random.fold_in(key, 3), (b, l, hd), jnp.bfloat16)
        out, lse = A._flash_attention_packed_impl(q, k, v, h, save_lse=True)
        jax.block_until_ready(out)

        configs = [(None, None)]
        if l == 5824:
            configs += [(448, 416), (448, 832), (448, 1456), (448, 2912),
                        (256, 2912), (448, 5824), (224, 5824)]
        else:
            configs += [(208, 728), (208, 1456), (416, 1456), (104, 1456)]

        for bq, bk in configs:
            label = f"bq={bq} bk={bk}" if bq else "default"
            try:
                fn = jax.jit(
                    lambda q_, k_, v_, o_, l_, g_, bq=bq, bk=bk:
                    A._flash_attention_packed_bwd_impl(
                        q_, k_, v_, o_, l_, g_, h, block_q=bq, block_k=bk
                    )
                )
                dq, dk, dv = fn(q, k, v, out, lse, g)
                jax.block_until_ready(dq)
                iters = 6
                t0 = time.perf_counter()
                qc = q
                for _ in range(iters):
                    # chain: perturb q by a dq slice so dispatches differ
                    qc = (qc + dq * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
                    dq, dk, dv = fn(qc, k, v, out, lse, g)
                jax.block_until_ready(dq)
                ms = (time.perf_counter() - t0) / iters * 1e3
                print(f"[{b},{l},{hd}] {label}: {ms:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001 — sweep wants the message
                print(f"[{b},{l},{hd}] {label}: FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
