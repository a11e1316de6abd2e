"""Microbenchmark lowering strategies for the (3,1,1) temporal video conv.

PROFILE_UNET.json + fusion_attr.py show the TemporalConv per-tap einsums
(`bhwc,cd->bhwd`) lowered by XLA:TPU as convolutions with
dim_labels=01bf_io01->01bf (EmitAllBatchInSublanes) at ~12% of MXU peak:
30.9 ms x22 @ [28,56,104,320] + 22.3 ms x22 @ [28,28,52,640] = 53 ms of the
529 ms UNet step. This tool times the candidate lowerings at the real
shapes so the model picks the fastest:

  taps      current: kt shifted einsums, summed
  taps2d    same but each tap reshaped to an explicit [M,K]@[K,N] matmul
  stacked   concat the kt shifted slices on channel -> one [M,kt*K]@[kt*K,N]
  convt     lax.conv_general_dilated over [b, t, h*w, c] with a (kt,1) window

Run on the TPU:  python scripts/tests/temporal_conv_tune.py
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

os.makedirs(".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")


def taps(x, w):  # x: [b,t,h,w,c] bf16, w: [kt,cin,cout]
    b, t, hh, ww, cin = x.shape
    kt = w.shape[0]
    pad = kt // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    out = None
    for j in range(kt):
        xj = xp[:, j:j + t].reshape(b * t, hh, ww, cin)
        y = jnp.einsum("bhwc,cd->bhwd", xj, w[j])
        out = y if out is None else out + y
    return out.reshape(b, t, hh, ww, -1)


def taps2d(x, w):
    b, t, hh, ww, cin = x.shape
    kt = w.shape[0]
    cout = w.shape[-1]
    pad = kt // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    out = None
    for j in range(kt):
        xj = xp[:, j:j + t].reshape(b * t * hh * ww, cin)
        y = xj @ w[j]
        out = y if out is None else out + y
    return out.reshape(b, t, hh, ww, cout)


def stacked(x, w):
    b, t, hh, ww, cin = x.shape
    kt = w.shape[0]
    cout = w.shape[-1]
    pad = kt // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    xs = jnp.concatenate(
        [xp[:, j:j + t] for j in range(kt)], axis=-1
    ).reshape(b * t * hh * ww, kt * cin)
    return (xs @ w.reshape(kt * cin, cout)).reshape(b, t, hh, ww, cout)


def convt(x, w):
    b, t, hh, ww, cin = x.shape
    kt = w.shape[0]
    cout = w.shape[-1]
    x2 = x.reshape(b, t, hh * ww, cin)
    y = jax.lax.conv_general_dilated(
        x2, w[:, None], (1, 1), ((kt // 2, kt // 2), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, t, hh, ww, cout)


def pallas(x, w):
    from vidseg_diffusion_tpu.ops.temporal_conv import temporal_conv_1x1

    b, t, hh, ww, cin = x.shape
    cout = w.shape[-1]
    y = temporal_conv_1x1(
        x.reshape(b, t, hh * ww, cin), w, jnp.zeros((cout,), jnp.float32)
    )
    return y.reshape(b, t, hh, ww, cout)


VARIANTS = {"taps": taps, "taps2d": taps2d, "stacked": stacked,
            "convt": convt, "pallas": pallas}

SHAPES = [  # (b, t, h, w, cin, cout) from the swan bench HLO
    (2, 14, 56, 104, 320, 320),
    (2, 14, 28, 52, 640, 640),
    (2, 14, 14, 26, 1280, 1280),
    (2, 14, 7, 13, 1280, 1280),
]


def timeit(fn, x, w, iters=30):
    # fori_loop inside ONE jit: per-call tunnel dispatch latency (~hundreds
    # of ms uncached) would otherwise swamp ms-scale kernels, and identical
    # repeated dispatches get served from the tunnel cache (under-reports).
    import numpy as np

    @jax.jit
    def loop(x0, w):
        def body(i, xx):
            y = fn(xx, w)
            return (0.5 * xx + 0.5 * y).astype(xx.dtype)
        return jax.lax.fori_loop(0, iters, body, x0)

    def fetch(t):
        # slice ON DEVICE before transfer (np.asarray of the full array
        # drags ~100 MB through the ~12 MB/s dev tunnel)
        return np.asarray(t.reshape(-1)[:2])

    y = loop(x, w)
    fetch(y)
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        y = loop(y, w)
        fetch(y)
    return (time.perf_counter() - t0) / (reps * iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kt", type=int, default=3)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()
    variants = {n: VARIANTS[n] for n in args.variants.split(",")}
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].device_kind}")
    for b, t, hh, ww, cin, cout in SHAPES:
        x = jax.random.normal(key, (b, t, hh, ww, cin), jnp.bfloat16) * 0.1
        w = jax.random.normal(key, (args.kt, cin, cout), jnp.bfloat16) * 0.02
        flops = args.kt * b * t * hh * ww * cin * cout * 2
        ref = None
        print(f"[{b},{t},{hh},{ww},{cin}->{cout}]", flush=True)
        for name, fn in variants.items():
            f = jax.jit(fn)
            dt = timeit(fn, x, w)
            y = f(x, w)
            if ref is None:
                ref = y
                err = 0.0
            else:
                err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"  {name}={dt*1e3:7.3f}ms ({flops/dt/1e12:5.1f}TF/s, err={err:.1e})", flush=True)


if __name__ == "__main__":
    main()
