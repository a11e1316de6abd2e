"""Pallas matmul(+bias) for projection sites XLA lowers badly.

The attention out-projections ([B·L, H·D] @ [H·D, C] + bias, then residual
add / AlphaBlender mix) land in XLA:TPU's batch-in-sublanes conv emitter at
~21 TF/s once the elementwise epilogues fuse in — 30 ms of the swan UNet
step across the 10 spatial + 10 temporal sites (fusion_attr:
%broadcast_add_fusion / %add_multiply_fusion). A plain Pallas dot with fp32
accumulation runs the same shapes at ~150 TF/s standalone.

NEGATIVE RESULT (measured in-model, round 4, swan bench on v5e): routing the
CrossAttention projections through this kernel made the full UNet step
**31 ms SLOWER** (537.6 ms vs 506.7 ms with VIDSEG_PALLAS_MATMUL=0). The
standalone 21 TF/s emitters were not idle time XLA could not recover: with
the projection inside a custom call, XLA loses the surrounding elementwise
fusions (residual add / AlphaBlender mix / bias epilogues become standalone
bandwidth passes) and pays extra HBM round-trips that exceed the MXU win —
the same failure mode as the fused GN+SiLU experiment (round 3 notes).
Hence `use_pallas_matmul` defaults OFF; VIDSEG_PALLAS_MATMUL=1 re-enables
for A/B runs. The kernel stays: it is tested, AD-capable, and the right
building block if a future refactor hoists the epilogues into the kernel.
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


def _kernel(x_ref, w_ref, b_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc + b_ref[0].astype(jnp.float32)[None]).astype(o_ref.dtype)


def _pick(dim: int, cap: int, step: int) -> int:
    cap = min(cap, dim)
    for b in range(cap - cap % step, 0, -step):
        if dim % b == 0:
            return b
    return max(step, cap - cap % step)


def pick_block_n(n: int, fits, lane: int = 128, cap: int = 640) -> int:
    """N-block choice for matmul-family kernels: exact 128-lane-multiple
    divisors first (every lane pass full AND no cdiv padding), then the
    whole axis (n=320 has no lane-multiple divisor; a padded 2×256 grid
    would compute 1.6× the FLOPs — whole-320 wastes only the last
    64-lane tail), then padded cdiv blocks as the last resort.
    `fits(bn)` is the caller's VMEM predicate."""
    for bn in range(min(cap, n) - min(cap, n) % lane, 0, -lane):
        if n % bn == 0 and fits(bn):
            return bn
    if n <= 2 * cap and fits(n):
        return n
    bn = _pick(n, cap, lane)
    while bn > lane and not fits(bn):
        bn -= lane
    return bn


@functools.partial(jax.jit, static_argnames=("interpret",))
def _matmul_bias_impl(
    x: jax.Array,       # [M, K]
    w: jax.Array,       # [K, N]
    bias: jax.Array,    # [N]
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    _, n = w.shape
    itemsize = x.dtype.itemsize

    def fits(bn_):
        # one 8-row m block + double-buffered weights must leave room
        return 2 * k * bn_ * itemsize + 8 * (
            2 * (k + bn_) * itemsize + bn_ * 4
        ) <= _VMEM_BUDGET

    bn = pick_block_n(n, fits) if n >= 128 else n
    per_row = 2 * (k + bn) * itemsize + bn * 4
    w_bytes = 2 * k * bn * itemsize
    bm = _pick(m, max(8, (_VMEM_BUDGET - w_bytes) // per_row), 8)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda mi, ni: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda mi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda mi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni: (mi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x, w, bias.reshape(1, n))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mb(interpret: bool, x, w, bias):
    return _matmul_bias_impl(x, w, bias, interpret=interpret)


def _mb_fwd(interpret, x, w, bias):
    return _mb(interpret, x, w, bias), (x, w, bias)


def _mb_bwd(interpret, res, g):
    # closed-form: y = x @ w + b (fp32 accumulation like the kernel)
    x, w, bias = res
    gf = g.astype(jnp.float32)
    dx = (gf @ w.astype(jnp.float32).T).astype(x.dtype)
    dw = (x.astype(jnp.float32).T @ gf).astype(w.dtype)
    db = jnp.sum(gf, axis=0).astype(bias.dtype)
    return dx, dw, db


_mb.defvjp(_mb_fwd, _mb_bwd)


def matmul_bias(
    x: jax.Array,       # [M, K]
    w: jax.Array,       # [K, N]
    bias: jax.Array,    # [N]
    interpret: bool = False,
) -> jax.Array:
    """Pallas forward + closed-form reverse (pallas_call alone does not
    support reverse-mode AD, and this op sits on the training path through
    every CrossAttention projection)."""
    from vidseg_diffusion_tpu.ops.attention import _log_dispatch

    _log_dispatch(
        "matmul_bias", m=x.shape[0], k=x.shape[1], n=w.shape[1],
        dtype=str(x.dtype),
    )
    return _mb(bool(interpret), x, w, bias)


def use_pallas_matmul(m: int, k: int, n: int,
                      force: Optional[bool] = None) -> bool:
    """Dispatcher predicate. Default OFF: the round-4 in-model A/B measured
    the Pallas projection path 31 ms/step SLOWER at swan scale (see module
    docstring) — XLA's epilogue fusions beat the standalone-TF/s win.
    VIDSEG_PALLAS_MATMUL=1 re-enables (big-M projections only) for A/B."""
    if force is not None:
        return bool(force)
    import os

    if os.environ.get("VIDSEG_PALLAS_MATMUL") != "1":
        return False
    return (
        jax.default_backend() == "tpu"
        and m >= 4096 and 64 <= k <= 2048 and 64 <= n <= 2048
    )
