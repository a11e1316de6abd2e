"""Fused GroupNorm(+SiLU) Pallas kernels.

The reference normalizes in fp32 (sgm/modules/diffusionmodules/util.py:
261-278 GroupNorm32; model.py:52-55 VAE Normalize) — on TPU the naive
XLA lowering materializes fp32 intermediates and runs separate mean/var
reduction passes, ~4.4x off the 1R+1W HBM bound at UNet activation sizes
(measured 1.12 ms vs 0.255 ms ideal at [28, 56, 104, 320]; see
scripts/tests/gn_tune.py). These kernels keep the activation in its
storage dtype end to end and accumulate statistics in fp32:

- stats kernel: one read; per-CHANNEL sum/sum-of-squares accumulated
  across row tiles (channel sums sidestep lane-dimension reshapes; the
  group aggregation over C//G channels is a [B, C] -> [B, G] host-side
  reduction on tiny data)
- apply kernel: one read + one write; the group mean / inv-std fold into a
  per-channel scale+shift, with optional fused SiLU

Both kernels block the activation in its NATIVE [B, ..., W, C] layout
(middle dims flattened to row tiles, W and C untouched) so no relayout
copies appear around the surrounding convs. Zero-padding of the row axis
is statistically neutral (pads contribute 0 to both sums; divisors use the
true element count), so no masking is needed when no aligned tile divides
the row count.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidseg_diffusion_tpu.ops.attention import _KERNEL_VMEM_LIMIT

# block bytes; the kernels hold ~4 fp32-sized temporaries of the block
# plus double-buffered in/out, so 1 MB blocks keep the stack under ~10 MB
_TILE_BYTES = 1024 * 1024


def _stats_kernel(x_ref, o_ref):
    mb = pl.program_id(1)

    @pl.when(mb == 0)
    def _init():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    x = x_ref[0].astype(jnp.float32)               # [tm, W, C]
    s = jnp.sum(x, axis=(0, 1))                    # [C]
    ss = jnp.sum(x * x, axis=(0, 1))               # [C]
    o_ref[0] += jnp.stack([s, ss])                 # [2, C]


def _apply_kernel(x_ref, a_ref, b_ref, o_ref, *, silu):
    x = x_ref[0].astype(jnp.float32)               # [tm, W, C]
    y = x * a_ref[0, 0][None] + b_ref[0, 0][None]  # broadcast [1, 1, C]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_tile(m: int, w: int, c: int, itemsize: int) -> int:
    """Largest row tile that divides m with block bytes <= _TILE_BYTES (a
    full pad + slice of the activation costs more than the kernels
    themselves — measured 0.78 ms vs 0.65 ms at [28, 5824, 320])."""
    cap = max(1, _TILE_BYTES // (w * c * itemsize))
    best = 0
    for tm in range(1, min(cap, m) + 1):
        if m % tm == 0:
            best = tm
    return best


def _pad_to_tiles(x4):
    """Pad the row axis to an aligned tile (stats-neutral: pads contribute 0
    to both sums; divisors use the true element count)."""
    b, m, w, c = x4.shape
    tm = _pick_tile(m, w, c, x4.dtype.itemsize)
    if tm == 0:
        tm = max(1, _TILE_BYTES // (w * c * x4.dtype.itemsize))
        pad = (-m) % tm
        x4 = jnp.pad(x4, ((0, 0), (0, pad), (0, 0), (0, 0)))
    return x4, tm, x4.shape[1] // tm


def _stats_pallas(x4, tm, nm, interpret=False):
    """One-read per-channel (sum, sum-of-squares) over [B, M, W, C] rows."""
    b, _, w, c = x4.shape
    return pl.pallas_call(
        _stats_kernel,
        grid=(b, nm),
        in_specs=[
            pl.BlockSpec((1, tm, w, c), lambda bb, mb: (bb, mb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda bb, mb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x4)


def _affine_from_stats(stats, scale, bias, groups, eps, n_spatial):
    """Fold per-group stats into a per-channel affine (tiny [B, C] math)."""
    b, _, c = stats.shape
    n = n_spatial * (c // groups)
    gsum = stats[:, 0].reshape(b, groups, c // groups).sum(-1)   # [B, G]
    gss = stats[:, 1].reshape(b, groups, c // groups).sum(-1)
    mean = gsum / n
    # clamp: E[x^2]-E[x]^2 can go negative from f32 roundoff on
    # near-constant groups (flax nn.GroupNorm clamps identically)
    var = jnp.maximum(0.0, gss / n - mean * mean)
    inv = jax.lax.rsqrt(var + eps)                                # [B, G]
    per_ch = lambda g: jnp.repeat(g, c // groups, axis=1)         # [B, C]
    a = per_ch(inv) * scale[None, :].astype(jnp.float32)
    bsh = (
        bias[None, :].astype(jnp.float32)
        - per_ch(mean * inv) * scale[None, :].astype(jnp.float32)
    )
    return a, bsh


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "silu", "interpret")
)
def group_norm_split(
    x: jax.Array,            # [B, ..., C]
    scale: jax.Array,
    bias: jax.Array,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Pallas STATS pass + plain-XLA normalize(+SiLU).

    Rationale: XLA fuses the (sum, sumsq) reduction into the PRECEDING
    convolution's output stage, and that epilogue costs the conv emitter
    ~2.5x — the swan profile's conv+stats kOutput fusions run at 56-86
    TF/s while stat-free matmul convs hit 150-180. Computing the stats in
    a one-read Pallas pass leaves the conv clean, while the apply stays an
    XLA elementwise fusion free to merge with its neighbors (unlike the
    full group_norm_silu custom call, which measurably breaks them)."""
    shape = x.shape
    b, w, c = shape[0], shape[-2], shape[-1]
    m = x.size // (b * w * c)
    x4, tm, nm = _pad_to_tiles(x.reshape(b, m, w, c))
    stats = _stats_pallas(x4, tm, nm, interpret=interpret)
    a, bsh = _affine_from_stats(stats, scale, bias, groups, eps, m * w)
    bcast = (b,) + (1,) * (x.ndim - 2) + (c,)
    y = x.astype(jnp.float32) * a.reshape(bcast) + bsh.reshape(bcast)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "silu", "interpret")
)
def group_norm_silu(
    x: jax.Array,            # [B, M, W, C]; stats per (batch, group)
    scale: jax.Array,        # [C]
    bias: jax.Array,         # [C]
    *,
    groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
    interpret: bool = False,
) -> jax.Array:
    b, m, w, c = x.shape
    assert c % groups == 0, (c, groups)
    x, tm, nm = _pad_to_tiles(x)
    stats = _stats_pallas(x, tm, nm, interpret=interpret)
    a, bsh = _affine_from_stats(stats, scale, bias, groups, eps, m * w)

    out = pl.pallas_call(
        functools.partial(_apply_kernel, silu=silu),
        grid=(b, nm),
        in_specs=[
            pl.BlockSpec((1, tm, w, c), lambda bb, mb: (bb, mb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bb, mb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bb, mb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, w, c), lambda bb, mb: (bb, mb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x, a[:, None], bsh[:, None])
    return out[:, :m]


def group_norm_xla(
    x: jax.Array, scale: jax.Array, bias: jax.Array,
    *, groups: int = 32, eps: float = 1e-5, silu: bool = False,
) -> jax.Array:
    """Lane-layout-preserving GroupNorm(+SiLU) in pure XLA.

    flax's nn.GroupNorm reshapes the ACTIVATION to split channels into
    (groups, C//G) for the stats reduce; with C//G = 10..40 that breaks the
    128-lane channel tiling and XLA materializes full-size fp32 relayout
    copies around every GN site (measured ~6 GB of f32 %copy per UNet step
    at swan scale — the largest single copy family in the r2 HLO dump).
    Here the big tensor is only ever touched by (a) a spatial-axis reduce
    to per-channel sums [B, C] — lane-aligned, and fusable into a
    preceding convolution's output stage — and (b) one elementwise
    normalize(+SiLU) fusion in the storage dtype. The channel→group
    aggregation happens on the tiny [B, C] stats array. Statistics are
    fp32 (GroupNorm32 semantics, diffusionmodules/util.py:261-278); no
    fp32 copy of the activation is ever materialized."""
    b, c = x.shape[0], x.shape[-1]
    assert c % groups == 0, (c, groups)
    red = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=red)          # [B, C]
    ss = jnp.sum(xf * xf, axis=red)    # [B, C]
    n = (x.size // (b * c)) * (c // groups)
    gs = s.reshape(b, groups, -1).sum(-1)    # [B, G]
    gss = ss.reshape(b, groups, -1).sum(-1)
    mean = gs / n
    var = jnp.maximum(0.0, gss / n - mean * mean)  # roundoff clamp (see above)
    inv = jax.lax.rsqrt(var + eps)
    rep = lambda g: jnp.repeat(g, c // groups, axis=1)  # [B, G] -> [B, C]
    a = rep(inv) * scale[None].astype(jnp.float32)
    bsh = (
        bias[None].astype(jnp.float32)
        - rep(mean * inv) * scale[None].astype(jnp.float32)
    )
    bcast = (b,) + (1,) * (x.ndim - 2) + (c,)
    y = xf * a.reshape(bcast) + bsh.reshape(bcast)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def group_norm_reference(
    x: jax.Array, scale: jax.Array, bias: jax.Array,
    *, groups: int = 32, eps: float = 1e-5, silu: bool = False,
) -> jax.Array:
    """fp32-stats GroupNorm in plain jnp (the torch-parity semantics)."""
    b, c = x.shape[0], x.shape[-1]
    xg = x.reshape(b, -1, groups, c // groups).astype(jnp.float32)
    m = jnp.mean(xg, axis=(1, 3), keepdims=True)
    v = jnp.maximum(
        0.0, jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True) - jnp.square(m)
    )
    y = (xg - m) * jax.lax.rsqrt(v + eps)
    y = y.reshape(x.shape) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def group_norm(
    x: jax.Array,            # [B, ..., C], stats over all non-batch/channel dims
    scale: jax.Array,
    bias: jax.Array,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
    force_pallas: Optional[bool] = None,
) -> jax.Array:
    """GroupNorm(+SiLU) dispatcher: fused Pallas kernels on TPU, jnp
    reference elsewhere. Accepts [B, spatial..., C]; stats are computed per
    (batch, group) over all spatial positions (torch GroupNorm semantics)."""
    shape = x.shape
    # Default OFF even on TPU: in the UNet, XLA fuses the GN statistics into
    # the PRECEDING convolution (kOutput conv fusions emitting (sum, sumsq)
    # alongside the conv result — see PROFILE_UNET notes), so the fused
    # kernels only tie XLA's lowering while breaking that fusion. Measured
    # at [28, 56, 104, 320]: kernels 0.56 ms vs XLA 0.55 ms per GN+SiLU.
    # Use force_pallas=True for standalone GN outside conv chains.
    use_pallas = bool(force_pallas)
    if force_pallas is None and jax.default_backend() != "tpu":
        use_pallas = False
    if use_pallas:
        use_pallas = shape[-1] % groups == 0 and len(shape) >= 3
    if not use_pallas:
        return group_norm_reference(
            x, scale, bias, groups=groups, eps=eps, silu=silu
        )
    b, w, c = shape[0], shape[-2], shape[-1]
    x4 = x.reshape(b, -1, w, c)  # middle dims -> row axis (layout-free)
    out = group_norm_silu(x4, scale, bias, groups=groups, eps=eps, silu=silu)
    return out.reshape(shape)
