"""GroupNorm strategies microbench at the UNet ds1 hot shape (28, 56, 104, 320)."""
import sys, os, glob, shutil, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn

os.makedirs(".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")

B, H, W, C, G = 28, 56, 104, 320, 32
x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
scale = jnp.ones((C,), jnp.float32)
bias = jnp.zeros((C,), jnp.float32)

def gn_current(x):
    # mirrors GroupNorm32: full f32 cast into flax GroupNorm
    return nn.GroupNorm(num_groups=G, epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="gn").apply(
        {"params": {"scale": scale, "bias": bias}}, x.astype(jnp.float32)
    ).astype(x.dtype)

def gn_fused(x):
    # stats in f32 from bf16 read; apply as one elementwise expr
    xg = x.reshape(B, H * W, G, C // G)
    x32 = xg.astype(jnp.float32)
    m = jnp.mean(x32, axis=(1, 3), keepdims=True)
    v = jnp.mean(jnp.square(x32), axis=(1, 3), keepdims=True) - jnp.square(m)
    inv = jax.lax.rsqrt(v + 1e-5)
    y = (xg.astype(jnp.float32) - m) * inv
    y = y.reshape(B, H, W, C) * scale + bias
    return y.astype(x.dtype)

def gn_silu_fused(x):
    y = gn_fused(x)
    return (y.astype(jnp.float32) * jax.nn.sigmoid(y.astype(jnp.float32))).astype(x.dtype)

def op_times(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    p = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(p, "rb").read())
    plane = [pl for pl in xs.planes if "TPU" in pl.name][0]
    md = plane.event_metadata
    tot = 0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            tot += ev.duration_ps
    return tot / 1e9

CHAIN = 20
for name, fn in [("current", gn_current), ("fused", gn_fused), ("fused_silu", gn_silu_fused)]:
    @jax.jit
    def run(x, fn=fn):
        def body(i, xx):
            return fn(xx)
        return jax.lax.fori_loop(0, CHAIN, body, x)
    o = run(x); o.block_until_ready()
    logdir = f"/tmp/xprof_gn/{name}"
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    o = run(o); np.asarray(o[0, 0, 0, :4])
    jax.profiler.stop_trace()
    dt = op_times(logdir) / CHAIN
    ideal = 2 * x.size * 2 / 819e9 * 1e3  # 1R+1W bf16 at peak BW
    print(f"{name:12s}: {dt:6.3f} ms/op  (1R+1W ideal {ideal:.3f} ms)", flush=True)

from vidseg_diffusion_tpu.ops.norm import group_norm

def gn_pallas(x):
    return group_norm(x, scale, bias, groups=G, silu=True, force_pallas=True)

for name, fn in [("pallas_silu", gn_pallas)]:
    @jax.jit
    def run(x, fn=fn):
        def body(i, xx):
            return fn(xx)
        return jax.lax.fori_loop(0, CHAIN, body, x)
    o = run(x); o.block_until_ready()
    logdir = f"/tmp/xprof_gn/{name}"
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    o = run(o); np.asarray(o[0, 0, 0, :4])
    jax.profiler.stop_trace()
    dt = op_times(logdir) / CHAIN
    ideal = 2 * x.size * 2 / 819e9 * 1e3
    print(f"{name:12s}: {dt:6.3f} ms/op  (1R+1W ideal {ideal:.3f} ms)", flush=True)
