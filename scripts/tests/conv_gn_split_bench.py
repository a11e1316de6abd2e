"""Does splitting GN stats out of the conv epilogue free the conv emitter?

The swan profile's conv+GN-stats kOutput fusions run at 56-86 TF/s while
stat-free matmul convs hit 150-180 (fusion_attr on PROFILE_UNET's trace) —
the (sum, sumsq) epilogue appears to cost the conv emitter ~2.5x. This
bench chains conv3x3 -> GN+SiLU -> conv3x3 ... in a fori_loop (the real
ResBlock fusion context) and compares:

  xla    group_norm_xla — status quo, stats fuse into the preceding conv
  split  Pallas stats pass + XLA apply (conv stays clean, apply fusable)
  pallas full Pallas GN+SiLU custom call (known to break neighbor fusions)

    python scripts/tests/conv_gn_split_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    print("backend:", jax.default_backend(), flush=True)

    from vidseg_diffusion_tpu.ops.norm import (
        group_norm_silu,
        group_norm_split,
        group_norm_xla,
    )

    iters = 30
    for b, hh, ww, c in [(28, 56, 104, 320), (28, 28, 52, 640)]:
        print(f"== conv3x3+GN chain at [{b},{hh},{ww},{c}] bf16 ==", flush=True)
        k = jax.random.PRNGKey(0)
        x0 = jax.random.normal(k, (b, hh, ww, c), jnp.bfloat16) * 0.1
        w1 = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, c, c),
                               jnp.bfloat16) * 0.02
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        conv_flops = 2 * b * hh * ww * c * c * 9 * iters

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        variants = {
            "xla   ": lambda x: jax.nn.silu(
                group_norm_xla(x, scale, bias, groups=32)
            ),
            "split ": lambda x: group_norm_split(
                x, scale, bias, groups=32, silu=True
            ),
            "pallas": lambda x: group_norm_silu(
                x.reshape(b, hh, ww, c), scale, bias, groups=32, silu=True
            ),
        }
        for name, gn in variants.items():

            @jax.jit
            def loop(x, w):
                def body(i, x):
                    y = conv(gn(x), w)
                    return (0.9 * x + y * 0.1).astype(x.dtype)
                return jax.lax.fori_loop(0, iters, body, x)

            def fetch(t):
                return np.asarray(t.reshape(-1)[:2])  # on-device slice first

            y = loop(x0, w1)
            fetch(y)
            t0 = time.perf_counter()
            reps = 2
            for _ in range(reps):
                y = loop(y, w1)
                fetch(y)
            dt = (time.perf_counter() - t0) / (reps * iters)
            print(f"  {name}: {dt*1e3:7.3f} ms/(gn+conv)  "
                  f"conv-only-equiv {conv_flops/iters/dt/1e12:5.1f} TF/s",
                  flush=True)


if __name__ == "__main__":
    main()
