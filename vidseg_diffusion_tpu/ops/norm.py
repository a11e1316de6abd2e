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


# ---------------------------------------------------------------------------
# GroupNorm backward (Pallas). The train-step profile (PROFILE_TRAIN r4)
# shows the XLA-AD GroupNorm reverse ops running at ~50-150 GB/s: the
# per-(B,C) stats-grad reductions and the dx recombination land in generic
# loop fusions far off the HBM bound. The reverse pass factors exactly like
# the forward split-GN: one two-input stats pass (per-channel Σdy, Σdy·x —
# lane-aligned, no activation reshape), tiny [B, C]/[B, G] coefficient math,
# and one coefficient-form apply pass dx = a·dy + b·x + c. dγ/dβ fall out of
# the same per-channel sums.
# ---------------------------------------------------------------------------


def _gn_bwd_stats_kernel(x_ref, g_ref, o_ref):
    mb = pl.program_id(1)

    @pl.when(mb == 0)
    def _init():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    x = x_ref[0].astype(jnp.float32)               # [tm, W, C]
    g = g_ref[0].astype(jnp.float32)
    r1 = jnp.sum(g, axis=(0, 1))                   # [C]  Σ dy
    rx = jnp.sum(g * x, axis=(0, 1))               # [C]  Σ dy·x
    o_ref[0] += jnp.stack([r1, rx])                # [2, C]


def _gn_bwd_apply_kernel(x_ref, g_ref, a_ref, b_ref, c_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    y = (
        g * a_ref[0, 0][None]
        + x * b_ref[0, 0][None]
        + c_ref[0, 0][None]
    )
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_bwd_pallas(x, gy, scale, mean, inv, groups, interpret=False):
    """Pallas GroupNorm reverse: returns (dx, dscale, dbias).

    x/gy: [B, ..., C]; mean/inv: [B, G] f32 residuals from the forward.
    Standard GN backward in coefficient form: with u = dy·γ and
    x̂ = (x − μ)·inv,  dx = inv·(u − mean_g(u) − x̂·mean_g(u·x̂)), which is
    per-(b, c) affine in (dy, x):  dx = a·dy + b·x + c."""
    shape = x.shape
    b, w, c = shape[0], shape[-2], shape[-1]
    m = x.size // (b * w * c)
    x4, tm, nm = _pad_to_tiles(x.reshape(b, m, w, c))
    g4 = gy.reshape(b, m, w, c)
    if x4.shape[1] != m:
        g4 = jnp.pad(g4, ((0, 0), (0, x4.shape[1] - m), (0, 0), (0, 0)))

    sums = pl.pallas_call(
        _gn_bwd_stats_kernel,
        grid=(b, nm),
        in_specs=[
            pl.BlockSpec((1, tm, w, c), lambda bb, mb: (bb, mb, 0, 0),
                         memory_space=pltpu.VMEM),
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
    )(x4, g4)
    r1, rx = sums[:, 0], sums[:, 1]                       # [B, C] f32
    cg = c // groups
    n = m * w * cg                                        # elems per group
    sf = scale[None].astype(jnp.float32)                  # [1, C]
    grp = lambda t: t.reshape(b, groups, cg).sum(-1)      # [B, C] -> [B, G]
    s_u = grp(r1 * sf)                                    # Σ u
    s_ux = inv * (grp(rx * sf) - mean * grp(r1 * sf))     # Σ u·x̂
    m1, m2 = s_u / n, s_ux / n                            # [B, G]
    rep = lambda t: jnp.repeat(t, cg, axis=1)             # [B, G] -> [B, C]
    a2 = rep(inv) * sf                                    # dy coeff
    b2 = rep(-inv * inv * m2)                             # x coeff
    c2 = rep(inv * (mean * inv * m2 - m1))                # constant
    # parameter grads from the same per-channel sums
    dbias = jnp.sum(r1, axis=0).astype(scale.dtype)
    dscale = jnp.sum(
        rep(inv) * (rx - rep(mean) * r1), axis=0
    ).astype(scale.dtype)

    dx = pl.pallas_call(
        _gn_bwd_apply_kernel,
        grid=(b, nm),
        in_specs=[
            pl.BlockSpec((1, tm, w, c), lambda bb, mb: (bb, mb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, w, c), lambda bb, mb: (bb, mb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bb, mb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bb, mb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bb, mb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, w, c), lambda bb, mb: (bb, mb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x4.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x4, g4, a2[:, None], b2[:, None], c2[:, None])
    return dx[:, :m].reshape(shape), dscale, dbias


def _gn_stats_mode() -> str:
    """'two_pass' (default), 'variadic', or 'barrier'. Read per trace.

    'variadic' (one lax.reduce emitting Σx and Σx² together) MEASURED
    LOSS (r5 swan bench A/B, serialized): 506.9 ms / 27.62 f/s vs
    two-pass 494.2 / 28.33 — XLA already pairs the two jnp.sum reduces
    where profitable, and the explicit variadic form blocks the
    convert_reduce fusion patterns it otherwise picks.

    'barrier' puts an optimization_barrier between x and the stats
    reduces so XLA CANNOT fuse (Σx, Σx²) into the PRECEDING convolution:
    the r5 fusion attribution (fusion_attr.py) showed those conv+stats
    kOutput kernels run at ~57 TF/s vs 78.6 for the same conv standalone
    (conv3x3_tune) — the f32 stats output stage drags the conv, and a
    standalone stats pass costs only one extra bf16 read (~0.3 ms at
    335 GB/s vs the ~1.5 ms the conv loses). A/B'd on hardware."""
    import os

    return os.environ.get("VIDSEG_GN_STATS", "two_pass")


def _gn_core(x, scale, bias, groups, eps, silu):
    """group_norm_xla math, also returning the (mean, inv) [B, G] stats."""
    b, c = x.shape[0], x.shape[-1]
    red = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    mode = _gn_stats_mode()
    if mode == "variadic":
        s, ss = jax.lax.reduce(
            (xf, xf * xf), (jnp.float32(0), jnp.float32(0)),
            lambda a, v: (a[0] + v[0], a[1] + v[1]), red,
        )                              # [B, C] each, one pass over x
    elif mode == "barrier":
        # barrier on the bf16 input (NOT on xf — that would materialize a
        # full f32 copy); the converts then live inside the stats kernel
        xbf = jax.lax.optimization_barrier(x).astype(jnp.float32)
        s = jnp.sum(xbf, axis=red)
        ss = jnp.sum(xbf * xbf, axis=red)
    else:
        # NOTE (measured r5, don't redo): reducing 5-D video GN stats on
        # the flattened [(b t), h, w, c] view (to dodge the f32 relayout
        # copies the HLO shows at the time_stack in_norm sites) benches
        # EXACTLY EVEN with the direct 5-D reduce (494.3 vs 494.4 ms) —
        # XLA's layout assignment just moves the same relayout elsewhere.
        s = jnp.sum(xf, axis=red)          # [B, C]
        ss = jnp.sum(xf * xf, axis=red)    # [B, C]
    n = (x.size // (b * c)) * (c // groups)
    gs = s.reshape(b, groups, -1).sum(-1)    # [B, G]
    gss = ss.reshape(b, groups, -1).sum(-1)
    mean = gs / n
    var = jnp.maximum(0.0, gss / n - mean * mean)  # roundoff clamp (see below)
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
    return y.astype(x.dtype), (mean, inv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gn(groups, eps, interpret, x, scale, bias):
    return _gn_core(x, scale, bias, groups, eps, False)[0]


def _gn_fwd(groups, eps, interpret, x, scale, bias):
    y, (mean, inv) = _gn_core(x, scale, bias, groups, eps, False)
    return y, (x, scale, mean, inv)


def _gn_bwd(groups, eps, interpret, res, gy):
    x, scale, mean, inv = res
    dx, dscale, dbias = _gn_bwd_pallas(
        x, gy, scale, mean, inv, groups, interpret=interpret
    )
    return dx, dscale, dbias


_gn.defvjp(_gn_fwd, _gn_bwd)


def _use_pallas_gn_bwd() -> bool:
    """GroupNorm Pallas-backward switch (read per trace). Default OFF —
    MEASURED LOSS in-model (r4, swan b=28 remat'd train step: 2303.4 ms vs
    2219.6 with XLA's AD): the standalone reverse custom calls break the
    fusions XLA otherwise forms between the GN backward and the surrounding
    conv/elementwise chains — the same result as the fused GN *forward*
    (group_norm docstring). Kernels stay for standalone-GN training paths
    outside conv chains; parity-tested in tests/test_ops_norm.py."""
    import os

    return os.environ.get("VIDSEG_PALLAS_GN_BWD", "0") == "1"


def group_norm_xla(
    x: jax.Array, scale: jax.Array, bias: jax.Array,
    *, groups: int = 32, eps: float = 1e-5, silu: bool = False,
) -> jax.Array:
    """Lane-layout-preserving GroupNorm(+SiLU); Pallas reverse pass on TPU.

    Forward is the pure-XLA formulation below (unchanged — its statistics
    reduce fuses into the preceding convolution). When differentiated on
    TPU with VIDSEG_PALLAS_GN_BWD=1, the custom_vjp routes the backward
    through the two Pallas passes above instead of XLA's AD fusions."""
    if (
        not silu
        and x.ndim >= 3
        and x.shape[-1] % groups == 0
        and jax.default_backend() == "tpu"
        and _use_pallas_gn_bwd()
    ):
        return _gn(groups, eps, False, x, scale, bias)
    return _group_norm_xla_plain(
        x, scale, bias, groups=groups, eps=eps, silu=silu
    )


def _group_norm_xla_plain(
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
    assert x.shape[-1] % groups == 0, (x.shape[-1], groups)
    return _gn_core(x, scale, bias, groups, eps, silu)[0]


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
