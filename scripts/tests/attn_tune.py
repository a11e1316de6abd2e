"""Flash-attention kernel tuning on the real TPU at the VidSeg hot shapes.

Timing comes from xprof op durations, NOT wall clock: per-dispatch tunnel
latency in this container is tens of ms and poisons wall-clock timing of
sub-100ms programs (ROUND_NOTES r1). Each config runs ITERS dispatches under
one trace; the custom-call's mean duration is reported.

    python scripts/tests/attn_tune.py
"""

import collections
import glob
import math
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from vidseg_diffusion_tpu.ops.attention import flash_attention

os.makedirs(".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")

# (name, B, H, L, D): ds=1 and ds=2 spatial self-attention of the 28-frame
# CFG batch at 832x448 (56x104 latents)
SHAPES = [
    ("ds1_self", 28, 5, 5824, 64),
    ("ds2_self", 28, 10, 1456, 64),
]
BLOCKS = [(512, 1536), (1024, 1536), (512, 3072), (1024, 3072), (256, 1536), (512, 6144), (256, 512), (128, 1536)]
ITERS = 3


def op_time_ms(logdir, match="flash_attention"):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    p = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(p, "rb").read())
    plane = [pl for pl in xs.planes if pl.name == "/device:TPU:0"][0]
    md = plane.event_metadata
    line = [l for l in plane.lines if l.name == "XLA Ops"][0]
    tot, cnt = 0, 0
    for ev in line.events:
        if match in md[ev.metadata_id].name:
            tot += ev.duration_ps
            cnt += 1
    return (tot / cnt / 1e9) if cnt else None


def bench(name, b, h, l, d, block_q, block_k, chain=10):
    """Sustained-clock op time: `chain` back-to-back kernel calls inside ONE
    program (idle gaps between dispatches let the chip boost clocks ~2× and
    made spaced-dispatch numbers unrepresentative of in-model performance)."""
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, l, d), jnp.bfloat16)

    @jax.jit
    def run(q, k, v):
        def body(i, qq):
            o = flash_attention(qq, k, v, block_q=block_q, block_k=block_k)
            return (o * (1.0 / 64.0)).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, chain, body, q)

    o = run(q, k, v)
    o.block_until_ready()
    logdir = f"/tmp/xprof_attn_tune/{name}_q{block_q}_k{block_k}"
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    o = run(o, k, v)
    np.asarray(o[0, 0, 0, :4])
    jax.profiler.stop_trace()
    dt = op_time_ms(logdir)
    if dt is None:
        return None, None
    flops = 4 * b * h * l * l * d
    return dt, flops / (dt / 1e3) / 1e12


def main():
    for name, b, h, l, d in SHAPES:
        for bq, bk in BLOCKS:
            try:
                dt, tf = bench(name, b, h, l, d, bq, bk)
                print(f"{name} [{b},{h},{l},{d}] q{bq}/k{bk}: {dt:7.2f} ms  {tf:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"{name} q{bq}/k{bk}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
