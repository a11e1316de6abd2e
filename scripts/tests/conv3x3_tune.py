"""3x3 spatial conv lowering tune at the swan ResBlock shapes.

The in-model 3x3 convs run at 56-86 TF/s while the 1-D matmul convs (FFN
projections) hit 150-180 (fusion_attr on PROFILE_UNET's trace). Candidates:

  nhwc    lax.conv NHWC 3x3 (status quo)
  rows1d  sum of 3 h-shifted 1-D width-convs (window-3 NWC) — stays in the
          fast 0bf emitter family
  tapsw   sum of 9 shifted channel matmuls (dx masked at w edges) — the
          all-matmul decomposition (temporal-conv style, no Pallas)

fori_loop chained in one jit, on-device slice fetch (tunnel rules).

    python scripts/tests/conv3x3_tune.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

os.makedirs(".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")


def nhwc(x, w):  # x [B,H,W,C], w [3,3,C,C]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def rows1d(x, w):
    b, h, ww_, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    out = None
    for dy in range(3):
        xs = xp[:, dy:dy + h].reshape(b * h, ww_, c)
        y = jax.lax.conv_general_dilated(
            xs, w[dy], (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
        )
        out = y if out is None else out + y
    return out.reshape(b, h, ww_, c)


def tapsw(x, w):
    b, h, ww_, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + h, dx:dx + ww_].reshape(b * h * ww_, c)
            y = xs @ w[dy, dx]
            out = y if out is None else out + y
    return out.reshape(b, h, ww_, c)


def pallas9(x, w):
    from vidseg_diffusion_tpu.ops.conv3x3 import conv3x3_same
    return conv3x3_same(x, w, jnp.zeros((w.shape[-1],), x.dtype))


VARIANTS = {"nhwc": nhwc, "rows1d": rows1d, "tapsw": tapsw, "pallas9": pallas9}


def main():
    import numpy as np

    print("backend:", jax.default_backend(), flush=True)
    iters = 30
    for b, h, ww_, c in [(28, 56, 104, 320), (28, 28, 52, 640)]:
        print(f"== [{b},{h},{ww_},{c}] bf16 3x3 ==", flush=True)
        k = jax.random.PRNGKey(0)
        x0 = jax.random.normal(k, (b, h, ww_, c), jnp.bfloat16) * 0.1
        w = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, c, c),
                              jnp.bfloat16) * 0.02
        flops = 2 * b * h * ww_ * c * c * 9
        ref = None
        for name, fn in VARIANTS.items():

            @jax.jit
            def loop(x, w, fn=fn):
                def body(i, x):
                    y = fn(x, w)
                    return (0.9 * x + 0.1 * y).astype(x.dtype)
                return jax.lax.fori_loop(0, iters, body, x)

            y1 = jax.jit(fn)(x0, w)
            if ref is None:
                ref, err = y1, 0.0
            else:
                err = float(jnp.max(jnp.abs(
                    y1.astype(jnp.float32) - ref.astype(jnp.float32))))

            def fetch(t):
                return np.asarray(t.reshape(-1)[:2])

            yy = loop(x0, w)
            fetch(yy)
            t0 = time.perf_counter()
            reps = 2
            for _ in range(reps):
                yy = loop(yy, w)
                fetch(yy)
            dt = (time.perf_counter() - t0) / (reps * iters)
            print(f"  {name:7s}: {dt*1e3:7.3f} ms  {flops/dt/1e12:5.1f} TF/s"
                  f"  err={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
