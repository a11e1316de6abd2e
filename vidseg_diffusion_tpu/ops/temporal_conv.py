"""Fused (kt,1,1) temporal-conv Pallas kernel.

The SVD `time_stack` ResBlocks and the temporal VAE decoder run a video
convolution with a (kt, 1, 1) kernel (reference video_model.py:45-58 /
temporal_ae.py:86-108 with video_kernel_size (3,1,1)) — i.e. per output
frame t a sum of kt channel matmuls over time-shifted input frames:

    y[b, t] = sum_j  x[b, t + j - kt//2] @ W[j]  + bias    (zeros off-range)

XLA:TPU lowers each per-tap matmul through a `dim_labels=01bf_io01`
convolution emitter that maps a middle spatial axis to the batch-in-sublanes
dimension and runs at ~12% of MXU peak at the 320/640-channel levels — 53 ms
of the 529 ms swan UNet step across the time_stack sites (see
scripts/tests/fusion_attr.py / PROFILE_UNET.json).

This kernel keeps ALL T frames of a row-block resident in VMEM. Because the
tap shift is exactly one frame (= bm rows of the flattened [T*bm, K] block),
each tap is ONE large [T*bm, K] @ [K, bn] MXU dot over a row-shifted window
of the zero-padded block — frame-edge zeroing comes from the pad rows, no
masking, fp32 accumulation, bias and output cast fused:

- each input element is read from HBM exactly once (the per-tap XLA
  lowering reads x kt times and writes kt-1 intermediate sums),
- dot M = T*bm rows (hundreds-to-thousands), so the MXU runs full tiles,
- T is small on every shipped path (<= 25 denoise frames, <= 14 decode
  frames), so the T-resident block stays inside the 16 MB VMEM scope.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidseg_diffusion_tpu.ops.attention import _KERNEL_VMEM_LIMIT

# Scoped VMEM on v5e faults at 16 MB; leave headroom for Mosaic temporaries.
_VMEM_BUDGET = 13 * 1024 * 1024


def _kernel(x_ref, w_ref, b_ref, o_ref, *, t_frames, kt, bm):
    cin = x_ref.shape[-1]
    bn = o_ref.shape[-1]
    pad = kt // 2
    x = x_ref[0].reshape(t_frames * bm, cin)
    zeros = jnp.zeros((pad * bm, cin), x.dtype)
    xp = jnp.concatenate([zeros, x, zeros], axis=0)
    acc = None
    for j in range(kt):
        y = jax.lax.dot_general(
            xp[j * bm : (j + t_frames) * bm],  # frames t+j-pad for all t
            w_ref[j],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = y if acc is None else acc + y
    acc = acc + b_ref[0].astype(jnp.float32)[None]
    o_ref[0] = acc.astype(o_ref.dtype).reshape(t_frames, bm, bn)


from vidseg_diffusion_tpu.ops.matmul import _pick as _pick_block  # shared picker


def _plan(t_frames, m, cin, cout, kt, itemsize):
    """(bm, bn) sized to the VMEM scope: double-buffered in/out blocks, the
    zero-padded scratch copy, the fp32 accumulator, and the weight slab."""
    bn = cout
    while bn > 640 and bn % 2 == 0:
        bn //= 2
    w_bytes = 2 * kt * cin * bn * itemsize
    pad = kt // 2

    def bytes_at(bm):
        inb = 2 * t_frames * bm * cin * itemsize
        scratch = (t_frames + 2 * pad) * bm * cin * itemsize
        accb = t_frames * bm * bn * 4
        outb = 2 * t_frames * bm * bn * itemsize
        return inb + scratch + accb + outb + w_bytes

    cap = 8
    while bytes_at(cap + 8) <= _VMEM_BUDGET and cap < m:
        cap += 8
    return _pick_block(m, cap, 8), bn


@functools.partial(jax.jit, static_argnames=("interpret",))
def _temporal_conv_impl(
    x: jax.Array,       # [B, T, M, Cin]
    w: jax.Array,       # [kt, Cin, Cout]
    bias: jax.Array,    # [Cout]
    interpret: bool = False,
) -> jax.Array:
    """Fused temporal (kt,1,1) conv: returns [B, T, M, Cout]."""
    b, t_frames, m, cin = x.shape
    kt, _, cout = w.shape
    bm, bn = _plan(t_frames, m, cin, cout, kt, x.dtype.itemsize)
    grid = (b, pl.cdiv(m, bm), pl.cdiv(cout, bn))

    out = pl.pallas_call(
        functools.partial(_kernel, t_frames=t_frames, kt=kt, bm=bm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t_frames, bm, cin), lambda i, mi, ni: (i, 0, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, cin, bn), lambda i, mi, ni: (0, 0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, mi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_frames, bm, bn), lambda i, mi, ni: (i, 0, mi, ni),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_frames, m, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(x, w, bias.reshape(1, cout))
    return out


def temporal_conv_1x1_reference(
    x: jax.Array, w: jax.Array, bias: jax.Array
) -> jax.Array:
    """jnp reference: per-tap shifted matmuls (the pre-kernel lowering)."""
    b, t, m, cin = x.shape
    kt = w.shape[0]
    pad = kt // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    out = None
    for j in range(kt):
        y = jnp.einsum("btmc,cd->btmd", xp[:, j:j + t], w[j])
        out = y if out is None else out + y
    return out + bias.astype(out.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tc(interpret: bool, x, w, bias):
    return _temporal_conv_impl(x, w, bias, interpret=interpret)


def _tc_fwd(interpret, x, w, bias):
    return _tc(interpret, x, w, bias), (x, w, bias)


def _tc_bwd(interpret, res, g):
    x, w, bias = res
    _, vjp = jax.vjp(temporal_conv_1x1_reference, x, w, bias)
    return vjp(g)


_tc.defvjp(_tc_fwd, _tc_bwd)


def temporal_conv_1x1(
    x: jax.Array,       # [B, T, M, Cin]
    w: jax.Array,       # [kt, Cin, Cout]
    bias: jax.Array,    # [Cout]
    interpret: bool = False,
) -> jax.Array:
    """Pallas forward; reverse-mode AD via the shifted-matmul reference's
    VJP (pallas_call alone does not support reverse-mode — this op is on
    the training path of every video ResBlock)."""
    from vidseg_diffusion_tpu.ops.attention import _log_dispatch

    _log_dispatch(
        "temporal_conv", b=x.shape[0], t=x.shape[1], m=x.shape[2],
        cin=x.shape[3], kt=w.shape[0], cout=w.shape[2], dtype=str(x.dtype),
    )
    return _tc(bool(interpret), x, w, bias)


def use_pallas_temporal_conv(
    kernel_shape, cin: int, cout: int, t_frames: int,
    force: Optional[bool] = None,
) -> bool:
    """Dispatcher predicate. The kernel pays off at the shallow/mid UNet
    levels (C <= 640) where XLA's per-tap conv emitter runs at ~12% of MXU
    peak; at C = 1280 the T-resident block forces tiny row tiles while XLA
    already lowers those levels near the HBM floor (measured,
    PROFILE_UNET.json) — keep the jnp path there."""
    if force is not None:
        return bool(force)
    kt, kh, kw = kernel_shape
    return (
        jax.default_backend() == "tpu"
        and kh == 1 and kw == 1
        and 64 <= cin <= 640 and 64 <= cout <= 640
        and t_frames <= 32
    )
