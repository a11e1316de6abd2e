"""Pallas 3x3 SAME conv as 9 shifted MXU dots (experimental).

XLA:TPU's NHWC 3x3 emitter tops out at ~81 TF/s at the swan ResBlock
shapes ([28,56,104,320]) while plain matmuls on the same operands run at
~150 (scripts/tests/conv3x3_tune.py / temporal-conv kernel measurements).
This kernel expresses the 3x3 conv the way the temporal-conv kernel
expresses (3,1,1): flatten rows, then every tap is ONE [k·W, C] @ [C, bn]
dot over a shifted window of the zero-padded block:

    y[h, w] += x[h+dy-1, w+dx-1] @ W[dy, dx]
    flat:  y_flat[r·W+w] += xflat[(r+dy)·W + (w+dx-1)] @ W[dy, dx]

- the h halo (1 row each side) comes from an overlap-materialized view
  [B, H/k, k+2, W, C] built with XLA slices (+2/k read amplification),
- the w edge wrap (w+dx-1 crossing row boundaries) is handled by masked
  input variants: dx=0 taps read a copy with w==W-1 elements zeroed,
  dx=2 taps one with w==0 zeroed — built once per block in VMEM,
- fp32 accumulation, fused bias.

Not yet dispatched from the model: wire-in follows an in-model profile
(scripts/tests/conv3x3_tune.py has the chain bench; XLA fuses GN stats
into its own convs for free, so the win must beat that too).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidseg_diffusion_tpu.ops.attention import _KERNEL_VMEM_LIMIT

_VMEM_BUDGET = 12 * 1024 * 1024


def _kernel(x_ref, w_ref, b_ref, o_ref, *, k_rows, width):
    c = x_ref.shape[-1]
    bn = o_ref.shape[-1]
    kw = k_rows * width
    xf = x_ref[0, 0].reshape((k_rows + 2) * width, c)
    zero = jnp.zeros((1, c), xf.dtype)
    xp = jnp.concatenate([zero, xf, zero], axis=0)  # flat pad 1 elem/side

    # w-position of each padded row: (i - 1) mod width (pads are zero anyway)
    idx = jax.lax.broadcasted_iota(jnp.int32, (xp.shape[0], 1), 0) - 1
    wpos = jax.lax.rem(idx, width)
    xm_l = xp * (wpos != width - 1).astype(xp.dtype)  # for dx=0 taps
    xm_r = xp * (wpos != 0).astype(xp.dtype)          # for dx=2 taps
    variants = (xm_l, xp, xm_r)

    acc = None
    for dy in range(3):
        for dx in range(3):
            start = dy * width + dx
            y = jax.lax.dot_general(
                variants[dx][start:start + kw],
                w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    acc = acc + b_ref[0].astype(jnp.float32)[None]
    o_ref[0] = acc.astype(o_ref.dtype).reshape(k_rows, width, bn)


from vidseg_diffusion_tpu.ops.matmul import _pick  # shared block-divisor pick


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_impl(
    x: jax.Array,       # [B, H, W, Cin]
    w: jax.Array,       # [3, 3, Cin, Cout]
    bias: jax.Array,    # [Cout]
    interpret: bool = False,
) -> jax.Array:
    b, h, width, cin = x.shape
    cout = w.shape[-1]
    itemsize = x.dtype.itemsize

    def bytes_at(k, bn):
        inb = 2 * (k + 2) * width * cin * itemsize          # io double-buf
        varb = 3 * ((k + 2) * width + 2) * cin * itemsize   # masked variants
        accb = k * width * bn * 4
        outb = 2 * k * width * bn * itemsize
        w_bytes = 2 * 9 * cin * bn * itemsize
        return inb + varb + accb + outb + w_bytes

    # joint (bn, k_rows) fit: wide-C blocks (e.g. 1280→1280, 9·C·bn weights
    # alone = 14.7 MB at bn=640) must shrink the n block before growing
    # rows; prefer exact lane-multiple divisors, then whole-cout (320 has
    # no 128-multiple divisor; padded 2×256 would compute 1.6× the FLOPs)
    from vidseg_diffusion_tpu.ops.matmul import pick_block_n

    if cout >= 128:
        bn = pick_block_n(cout, lambda bn_: bytes_at(1, bn_) <= _VMEM_BUDGET)
    else:
        bn = cout

    cap = 1
    while cap < h and bytes_at(cap + 1, bn) <= _VMEM_BUDGET:
        cap += 1
    k_rows = _pick(h, cap, 1)

    # overlap-materialized h-halo view [B, H/k, k+2, W, C]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    nb = h // k_rows
    x_ov = jnp.stack(
        [xp[:, i * k_rows:i * k_rows + k_rows + 2] for i in range(nb)], axis=1
    )

    grid = (b, nb, pl.cdiv(cout, bn))
    out = pl.pallas_call(
        functools.partial(_kernel, k_rows=k_rows, width=width),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, k_rows + 2, width, cin),
                         lambda bb, hb, ni: (bb, hb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, bn), lambda bb, hb, ni: (0, 0, 0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda bb, hb, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, k_rows, width, bn), lambda bb, hb, ni: (bb, hb, 0, ni),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, width, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(x_ov, w, bias.reshape(1, cout))
    return out


def conv3x3_reference(x, w, bias):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _c3(interpret: bool, x, w, bias):
    return _conv3x3_impl(x, w, bias, interpret=interpret)


def _c3_fwd(interpret, x, w, bias):
    return _c3(interpret, x, w, bias), (x, w, bias)


def _c3_bwd(interpret, res, g):
    x, w, bias = res
    _, vjp = jax.vjp(conv3x3_reference, x, w, bias)
    return vjp(g)


_c3.defvjp(_c3_fwd, _c3_bwd)


def conv3x3_same(
    x: jax.Array,       # [B, H, W, Cin]
    w: jax.Array,       # [3, 3, Cin, Cout]
    bias: jax.Array,    # [Cout]
    interpret: bool = False,
) -> jax.Array:
    """Pallas forward; reverse-mode AD via the XLA reference conv's VJP
    (pallas_call alone does not support reverse-mode)."""
    return _c3(bool(interpret), x, w, bias)


def use_pallas_conv3x3(h: int, w: int, cin: int, cout: int,
                       force: Optional[bool] = None) -> bool:
    """Off by default until the in-model profile proves a win over XLA's
    NHWC emitter (which gets GN-stats fusion for free). The env knob lets
    the tune session A/B in-model without code edits (trace-time only)."""
    if force is not None:
        return bool(force)
    import os

    env = os.environ.get("VIDSEG_PALLAS_CONV3X3")
    if env is not None:
        return env == "1" and jax.default_backend() == "tpu"
    return False
