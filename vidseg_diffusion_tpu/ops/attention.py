"""Scaled-dot-product attention for TPU.

Replaces the reference's two CUDA attention surfaces — PyTorch SDPA
(sgm/modules/attention.py:352-356) and xformers `memory_efficient_attention`
(attention.py:463-485) — with a Pallas TPU flash-attention kernel plus a jnp
reference path.

Design notes (TPU-first, not a port):
- Q/K "feature harvesting" needs no kernel support: the harvested tensors are
  the Q/K *projections* (attention.py:330-331 caches them before head-split),
  which are plain matmul outputs at module level. The kernel is pure
  attention; harvest/injection/λ·mask-modulation are functional module logic
  that XLA fuses into neighboring ops.
- The kernel uses the standard online-softmax block algorithm: grid over
  (batch·heads, q-blocks, k-blocks) with fp32 VMEM accumulators; the k axis
  is innermost so accumulators live in scratch across k steps.
- Small sequences (temporal attention L=14, CLIP-image context L=1, text
  context L=77) go to the jnp path — XLA already compiles those to fused
  MXU code; a flash kernel would only add padding waste.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2_E = math.log2(math.e)

import os as _os  # noqa: E402


def _fused_psum_enabled() -> bool:
    """A/B knob: fold the softmax denominator into the P·V dot in the packed
    flash kernel (ones-column on v) — see _flash_kernel_packed. Default ON
    from the round-4 in-model A/B: 28.23 f/s vs 28.18 without, on top of
    outproj=flat (505.0 ms -> 496 ms for the two knobs together). Read per
    TRACE (like _use_pallas_attn_bwd) so VIDSEG_FLASH_FUSED_PSUM=0 works
    after import and tests can monkeypatch both A/B arms in one process —
    the product call sites (_fap/_fap_fwd/_fa_fwd) resolve it and pass the
    bool as a static arg, so the jitted impl re-traces on a flip. Direct
    _flash_attention_packed_impl calls without fused_psum= freeze the value
    at their first trace (jit cache keys on the None default)."""
    return _os.environ.get("VIDSEG_FLASH_FUSED_PSUM", "1") == "1"

# Trace-time kernel-dispatch log. When set to a list (tests/tpu smoke test),
# every Pallas-kernel dispatch appends {"kind", shape/params} as it is traced,
# so the exact kernel set of a program (e.g. the bench step) can be
# enumerated and compile-checked standalone before the driver runs it.
DISPATCH_LOG: Optional[list] = None


def _log_dispatch(kind: str, **info) -> None:
    if DISPATCH_LOG is not None:
        DISPATCH_LOG.append(dict(kind=kind, **info))


# Per-kernel scoped-VMEM limit (pltpu.CompilerParams.vmem_limit_bytes).
# BENCH_r03 lesson: XLA's *default* scoped-vmem limit for a custom call is
# context-dependent — the small-batched kernel at bf16[26,392,1280] compiled
# standalone but hit "Scoped allocation 16.50M > 16.00M limit" inside the
# full bench program (scripts/tests/sba_vmem_probe.py reproduces the
# standalone PASS). Raising the per-kernel limit removes the context
# dependence; the block/fold choosers below still budget well under this so
# plenty of VMEM remains for XLA's own buffers (v5e has 128 MB VMEM total).
_KERNEL_VMEM_LIMIT = 64 * 1024 * 1024


def mha_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None,
    layout: str = "bhld",
) -> jax.Array:
    """Reference attention. layout='bhld': [B, H, L, D] (torch SDPA order);
    layout='blhd': [B, L, H, D] — the natural projection-matmul output
    order, consumed without any transposition."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if layout == "blhd":
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        weights = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, kv_len,
                  block_k):
    """One (q-block, k-block) tile of online-softmax attention.

    VPU-lean formulation (the kernel is VPU/MXU mixed-bound at the VidSeg
    d=64 sizes — see scripts/tests/attn_tune.py):
    - the 1/√d scale is folded into q by the caller, not applied to the
      [bq, bk] logits
    - key-padding masking (iota + compare + select on l² elements) runs only
      on the tail block that actually contains padding
    - the single-k-block grid skips the online-rescaling machinery entirely
    """
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    # dots run in the input dtype (bf16 on the model path) with fp32
    # accumulation — the MXU's native mode; upcasting the inputs to f32
    # first would force the much slower multi-pass f32 matmul
    q = q_ref[0]  # [bq, d] (pre-scaled)
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]  # [bk, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk] fp32

    if kv_len % block_k != 0:  # static: padding exists only in the tail block
        k_ids = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(
            jnp.logical_or(kb != nkb - 1, k_ids < kv_len), s, DEFAULT_MASK_VALUE
        )

    m_prev = m_ref[:]  # [bq, 1]
    l_prev = l_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    # base-2 softmax: the caller folds log2(e) into the q pre-scale, so
    # softmax2(s·log2e) == softmax(s) and the VPU runs its native exp2
    # instead of exp's extra multiply per element
    p = jnp.exp2(s - m_next)
    psum = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if nkb == 1:
        # single pass: no rescaling, no accumulator round-trip
        o_ref[0] = (pv / psum).astype(o_ref.dtype)
    else:
        alpha = jnp.exp2(m_prev - m_next)
        l_next = alpha * l_prev + psum
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_next
        l_ref[:] = l_next

        @pl.when(kb == nkb - 1)
        def _finalize():
            o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret", "layout")
)
def _flash_attention_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    layout: str = "bhld",
) -> jax.Array:
    """Pallas TPU flash attention.

    layout='bhld': [B, H, Lq, D] / [B, H, Lk, D] (torch SDPA order).
    layout='blhd': [B, Lq, H, D] — the projection matmul's NATIVE output
    order, consumed in place. The kernel grid slices one (batch, head)
    [L, D] plane per program either way; with blhd no relayout copy is ever
    materialized between the q/k/v projections and the kernel (the
    [B, L, H·D]→[B, H, L, D] copies cost ~3.9 GB/step in the r2 HLO dump).

    Handles non-aligned Lq/Lk/D by zero-padding (D to 128 lanes, L to block
    multiples) with in-kernel masking of padded keys; padded queries compute
    garbage rows that are sliced away on return.

    Default blocks are tuned on v5e for the VidSeg spatial sizes
    (L≈1.5-6k, D=64, bf16): large q blocks and a k block covering the whole
    kv length when it fits VMEM (single-pass, no online-softmax rescaling),
    ~2× faster than XLA's materialized-logits attention at [28,10,1456,64].
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])

    blhd = layout == "blhd"
    if blhd:
        b, lq, h, d = q.shape
        lk = k.shape[1]
    else:
        b, h, lq, d = q.shape
        lk = k.shape[2]

    # Auto blocks (v5e-tuned at the VidSeg spatial shapes, see
    # scripts/tests/attn_tune.py): prefer a block_q that divides Lq exactly
    # (a padded Lq costs a full q AND out relayout pass); block_k as large
    # as the VMEM budget allows — fewer online-softmax passes measured ~10%
    # faster (18.7 vs 20.6 ms at [140, 5824, 64]) and a single pass skips
    # the rescale machinery entirely.
    if block_q is None:
        block_q = max(
            (c for c in range(256, 520, 8) if lq % c == 0), default=512
        )
    if block_k is None:
        block_k = max(
            (c for c in range(1024, 3080, 8) if lk % c == 0), default=2944
        )

    # Never pad the head dim: a full-dim (last) block is legal at any D, and
    # physically padding 64->128 would double the MXU depth of BOTH dots
    # with zeros (measured ~2x kernel time at the VidSeg D=64 shapes). For
    # non-tile-aligned D (not mult of 128) Mosaic pads lanes in VMEM only.
    d_pad = d
    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))

    # Shrink blocks until the working set fits VMEM (q/k/v/out blocks in the
    # input dtype, logits/accumulator in fp32, double-buffered). Matters for
    # wide heads — e.g. the VAE mid-attention runs a single 512-dim head
    # over ~6k tokens.
    in_bytes = q.dtype.itemsize

    def vmem_bytes(bq, bk):
        io = (2 * bq + 2 * bk) * d_pad * in_bytes  # q + out, k + v blocks
        work = (bq * bk + bq * d_pad + 2 * bq) * 4  # logits, acc, m/l
        return (io + work) * 2  # double-buffered

    # 13 MB of the 16 MB scoped VMEM (the tuned ds1 config q448/k2912
    # needs 12.4 MB; leave headroom for Mosaic temporaries)
    budget = 13 * 1024 * 1024
    while vmem_bytes(block_q, block_k) > budget and block_k > 128:
        block_k = max(128, block_k // 2)
    while vmem_bytes(block_q, block_k) > budget and block_q > 128:
        block_q = max(128, block_q // 2)

    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)

    scratch = [
        pltpu.VMEM((block_q, d_pad), jnp.float32),
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, 1), jnp.float32),
    ]

    if blhd:
        # Mosaic requires the last-two block dims be (mult-of-8, mult-of-128)
        # or full — a (1, bq, 1, d) block over [B, L, H, D] is illegal, so
        # the kernel cannot slice per-head planes of the projection-native
        # layout directly. Relayout to head-major here and run the 3-D
        # kernel (the copy XLA emits is the same one the old bhld module
        # code paid; the blhd module layout still saves the copies at every
        # jnp-path site).
        q = jnp.moveaxis(q, 2, 1)
        k = jnp.moveaxis(k, 2, 1)
        v = jnp.moveaxis(v, 2, 1)
        out = _flash_attention_impl(
            q, k, v, scale=scale, block_q=block_q, block_k=block_k,
            interpret=interpret, layout="bhld",
        )
        return jnp.moveaxis(out, 1, 2)

    # fold the softmax scale into q: bq·d multiplies instead of bq·bk.
    # log2(e) rides along so the kernel's softmax runs in base 2 (exp2 is
    # the VPU-native transcendental; see _flash_kernel).
    qf = (q * jnp.asarray(scale * _LOG2_E, q.dtype)).reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    if lq_pad != lq:
        qf = jnp.pad(qf, ((0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        kf = jnp.pad(kf, ((0, 0), (0, lk_pad - lk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, lk_pad - lk), (0, 0)))

    grid = (b * h, lq_pad // block_q, lk_pad // block_k)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=lk, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d_pad), lambda bh, qb, kb: (bh, qb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, d_pad), lambda bh, qb, kb: (bh, kb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, d_pad), lambda bh, qb, kb: (bh, kb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_pad), lambda bh, qb, kb: (bh, qb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    return out[:, :lq, :d].reshape(b, h, lq, d)


def _flash_kernel_packed(q_ref, k_ref, v_ref, o_ref, *rest, kv_len, block_k,
                         heads, d, save_lse=False, fused_psum=True):
    """All-heads flash tile on PACKED [bq, H·D] blocks.

    Consumes the q/k/v projections in their matmul-native [B, L, H·D]
    packing (a bitcast of [B, L, H, D]) — no relayout copy between the
    projections and the kernel. Each program processes every head of one
    (q-block, k-block) tile: per head, a 64-lane slice of the packed block
    feeds the usual online-softmax update; accumulators pack the same way.
    m/l scratch is [bq, heads].

    save_lse (training forward): also writes the per-row base-2 logsumexp
    `m + log2(l)` of the PRESCALED logits to a second [bq, heads] f32
    output — the Pallas backward kernels recompute p = exp2(s2 - lse) from
    it without re-running the online softmax."""
    if save_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        acc_ref, m_ref, l_ref = rest
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # [bq, H*D] (pre-scaled)
    k = k_ref[0]  # [bk, H*D]
    v = v_ref[0]  # [bk, H*D]

    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk] fp32
        if kv_len % block_k != 0:
            k_ids = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(
                jnp.logical_or(kb != nkb - 1, k_ids < kv_len),
                s, DEFAULT_MASK_VALUE,
            )
        m_prev = m_ref[:, hh:hh + 1]
        l_prev = l_ref[:, hh:hh + 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        if fused_psum:
            # fold the softmax denominator into the P·V dot: append a ones
            # column to the head's v slice, so the MXU pass emits [pv | Σp]
            # in one shot and the VPU sum-reduce over the [bq, bk] logits
            # disappears (this kernel is VPU-softmax-bound — ROUND_NOTES
            # r2). The d=64 output already pads to 128 lanes, so the extra
            # column is MXU-free. Σp accumulates the bf16-ROUNDED p in f32
            # — the same weights the numerator uses.
            vs = v[:, sl]
            ve = jnp.concatenate(
                [vs, jnp.ones((vs.shape[0], 1), vs.dtype)], axis=1
            )
        if nkb == 1:
            p = jnp.exp2(s - m_cur)
            if fused_psum:
                pv_ext = jax.lax.dot_general(
                    p.astype(v.dtype), ve, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                pv, psum = pv_ext[:, :d], pv_ext[:, d:]
            else:
                psum = jnp.sum(p, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            o_ref[0, :, sl] = (pv / psum).astype(o_ref.dtype)
            if save_lse:
                lse_ref[0, :, hh:hh + 1] = m_cur + jnp.log2(psum)
        else:
            m_next = jnp.maximum(m_prev, m_cur)
            p = jnp.exp2(s - m_next)
            if fused_psum:
                pv_ext = jax.lax.dot_general(
                    p.astype(v.dtype), ve, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                pv, psum = pv_ext[:, :d], pv_ext[:, d:]
            else:
                psum = jnp.sum(p, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            alpha = jnp.exp2(m_prev - m_next)
            acc_ref[:, sl] = acc_ref[:, sl] * alpha + pv
            m_ref[:, hh:hh + 1] = m_next
            l_ref[:, hh:hh + 1] = alpha * l_prev + psum

            @pl.when(kb == nkb - 1)
            def _finalize(sl=sl, hh=hh):
                o_ref[0, :, sl] = (
                    acc_ref[:, sl] / l_ref[:, hh:hh + 1]
                ).astype(o_ref.dtype)
                if save_lse:
                    lse_ref[0, :, hh:hh + 1] = (
                        m_ref[:, hh:hh + 1] + jnp.log2(l_ref[:, hh:hh + 1])
                    )


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "block_q", "block_k", "interpret",
                     "save_lse", "fused_psum"),
)
def _flash_attention_packed_impl(
    q: jax.Array,   # [B, L, H*D]
    k: jax.Array,
    v: jax.Array,
    heads: int,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    save_lse: bool = False,
    fused_psum: Optional[bool] = None,
) -> jax.Array:
    """Flash attention on packed [B, L, H·D] projections (zero relayout).

    Equivalent math to flash_attention; the packed layout is the bitcast of
    the projection einsum's [B, L, H, D] output, so q/k/v flow from matmul
    to kernel without the per-tensor l↔h transpose copies (~3.9 GB/step in
    the r2 swan HLO dump)."""
    b, lq, hd = q.shape
    lk = k.shape[1]
    d = hd // heads
    assert heads * d == hd, (heads, hd)
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if fused_psum is None:
        fused_psum = _fused_psum_enabled()

    if block_q is None:
        block_q = max(
            (c for c in range(256, 520, 8) if lq % c == 0), default=512
        )
    if block_k is None:
        block_k = max(
            (c for c in range(1024, 3080, 8) if lk % c == 0), default=2944
        )
    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))

    in_bytes = q.dtype.itemsize
    lanes = _round_up(hd, 128)

    def vmem_bytes(bq, bk):
        io = (2 * bq + 2 * bk) * lanes * in_bytes   # q+out, k+v packed blocks
        work = bq * bk * 4 + bq * lanes * 4         # one head's logits + acc
        return io * 2 + work                        # io double-buffered

    budget = 13 * 1024 * 1024
    if vmem_bytes(block_q, block_k) > budget:
        # largest VMEM-fitting block_k, preferring exact divisors of lk
        # (non-divisor blocks turn on tail masking, an iota+select over
        # every logits block in this VPU-bound kernel)
        fits = [
            c for c in range(128, block_k + 1, 8)
            if vmem_bytes(block_q, c) <= budget
        ]
        divs = [c for c in fits if lk % c == 0]
        block_k = max(divs or fits or [128])
    while vmem_bytes(block_q, block_k) > budget and block_q > 128:
        block_q = max(128, block_q // 2)

    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)

    qf = q * jnp.asarray(scale * _LOG2_E, q.dtype)  # base-2 softmax prescale
    if lq_pad != lq:
        qf = jnp.pad(qf, ((0, 0), (0, lq_pad - lq), (0, 0)))
    kf, vf = k, v
    if lk_pad != lk:
        kf = jnp.pad(kf, ((0, 0), (0, lk_pad - lk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, lk_pad - lk), (0, 0)))

    grid = (b, lq_pad // block_q, lk_pad // block_k)
    out_shape = [jax.ShapeDtypeStruct((b, lq_pad, hd), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, block_q, hd), lambda bb, qb, kb: (bb, qb, 0),
                     memory_space=pltpu.VMEM),
    ]
    if save_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((b, lq_pad, heads), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, block_q, heads), lambda bb, qb, kb: (bb, qb, 0),
                         memory_space=pltpu.VMEM)
        )
    res = pl.pallas_call(
        functools.partial(
            _flash_kernel_packed, kv_len=lk, block_k=block_k, heads=heads,
            d=d, save_lse=save_lse, fused_psum=fused_psum,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bb, qb, kb: (bb, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda bb, qb, kb: (bb, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda bb, qb, kb: (bb, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if save_lse else out_specs[0],
        out_shape=out_shape if save_lse else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, hd), jnp.float32),
            pltpu.VMEM((block_q, heads), jnp.float32),
            pltpu.VMEM((block_q, heads), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    if save_lse:
        out, lse = res
        return out[:, :lq], lse[:, :lq]
    return res[:, :lq]


def _small_seq_kernel(q_ref, k_ref, v_ref, o_ref, *, lq, lk, heads, d, fold):
    """All heads of `fold` independent tiny attention problems in one tile.

    Blocks are [1, fold·lq, H·D] / [1, fold·lk, H·D] row-major foldings of
    [B, L, H·D] (pure reshape — no relayout). Per head, ONE [fold·lq, fold·lk]
    MXU dot computes every problem's logits at once; the off-block-diagonal
    cross-problem entries are masked to -inf, so they underflow to exactly 0
    in the softmax and the P·V dot stays exact. The fold× extra MXU work is
    far cheaper than the HBM inflation the unfolded XLA path pays (a
    [*, t, t] f32 logits tensor tiles t=14 → 128 lanes: 10× traffic)."""
    q = q_ref[0]  # [fold·lq, H·D] (pre-scaled by scale·log2e)
    k = k_ref[0]  # [fold·lk, H·D]
    v = v_ref[0]
    rows, cols = fold * lq, fold * lk
    # ONE additive [rows, cols] f32 penalty buffer shared across the heads
    # loop, built from skinny (rows,1)/(1,cols) iotas. The previous version
    # kept two full-size i32 iota masks live for the whole kernel plus a
    # per-head select — part of the scoped-vmem blowout that crashed
    # BENCH_r03 (16.5 MB observed vs the 8.6 MB the old model predicted).
    qg = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // lq
    kg = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1) // lk
    pen = jnp.where(qg == kg, 0.0, DEFAULT_MASK_VALUE)  # [rows, cols] f32
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, cols] f32, cross-problem entries garbage
        s = s + pen  # bounded logits + (-0.7·f32max) → cross-problem -huge
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)  # masked entries underflow to exactly 0
        psum = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (pv / psum).astype(o_ref.dtype)


def _sba_vmem_bytes(fold: int, lq: int, lk: int, hd: int,
                    itemsize: int = 2) -> int:
    """Modeled scoped-VMEM demand of one `_small_seq_kernel` program.

    Full inventory (the BENCH_r03 crash was this model omitting most of it):
    - q/out row blocks + k/v col blocks, double-buffered, lane-padded
    - the shared [rows, cols] f32 penalty buffer (live across the heads loop)
    - per-head f32 logits `s`, f32 `p = exp2`, and p's v-dtype cast, counted
      twice for Mosaic's software pipelining of the unrolled heads loop
    Calibrated against the observed in-context allocation at the r3 crash
    site (bf16[26,392,1280]: 16.5 MB actual for the pre-r4 kernel whose
    inventory also held two full-size i32 iota masks + a select)."""
    rows, cols = fold * lq, fold * lk
    lanes = _round_up(hd, 128)
    io = 2 * (2 * rows + 2 * cols) * lanes * itemsize
    cell = rows * cols * 4
    pen = cell
    per_head = cell + cell + cell // 2   # s, p, p.astype(v.dtype)
    return io + pen + 2 * per_head


def _sba_bwd_vmem_bytes(fold: int, lq: int, lk: int, hd: int,
                        itemsize: int = 2) -> int:
    """Modeled scoped-VMEM demand of one `_small_seq_bwd_kernel` program.

    The backward's live set exceeds the forward's (`_sba_vmem_bytes`): five
    input row/col blocks (q, k, v, g, out) and three output blocks (dq, dk,
    dv), all double-buffered and lane-padded, the shared f32 penalty buffer,
    and per-head f32 s2/e/p, dp, ds, delta plus the p/ds dtype casts feeding
    the MXU dots — counted twice for Mosaic's pipelining of the unrolled
    heads loop. Using the forward model here (the pre-r5 behavior) under-
    counted this inventory, the same failure mode that caused the BENCH_r03
    in-context VMEM crash on the forward kernel."""
    rows, cols = fold * lq, fold * lk
    lanes = _round_up(hd, 128)
    io = 2 * (4 * rows + 4 * cols) * lanes * itemsize
    cell = rows * cols * 4
    pen = cell
    # s2, e/p (reused), dp, ds in f32 + p/ds casts to the input dtype
    per_head = 4 * cell + 2 * (cell // 2)
    return io + pen + 2 * per_head


def _best_fold(b: int, lq: int, lk: int, hd: int, itemsize: int = 2,
               rows_cap: int = 512, model=None) -> int:
    """Largest divisor of B whose folded tile fits the rows cap AND the
    scoped-VMEM budget per `model` (default `_sba_vmem_bytes`; the backward
    dispatcher passes `_sba_bwd_vmem_bytes` — full allocation inventory,
    ≥25% margin under the kernel's explicit vmem_limit_bytes)."""
    cap = max(1, rows_cap // max(lq, lk))
    budget = (_KERNEL_VMEM_LIMIT * 3) // 4
    model = model or _sba_vmem_bytes
    for f in range(cap, 0, -1):
        if b % f:
            continue
        if model(f, lq, lk, hd, itemsize) <= budget:
            return f
    return 1


@functools.partial(
    jax.jit, static_argnames=("scale", "fold", "interpret")
)
def _small_batched_attention_impl(
    q: jax.Array,  # [B, Lq, H, D]
    k: jax.Array,  # [B, Lk, H, D]
    v: jax.Array,
    scale: Optional[float] = None,
    fold: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Batched tiny-sequence attention (temporal attention: L=t=14, B=2·s up
    to ~12k). Folds `fold` problems into each Pallas program so the MXU sees
    ~512-row tiles instead of 14-row ones, and the f32 logits never leave
    VMEM (the XLA path materializes them to HBM with 14→128 lane padding)."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if fold is None:
        fold = _best_fold(b, lq, lk, h * d, q.dtype.itemsize)
    assert b % fold == 0, (b, fold)
    hd = h * d
    qf = (q * jnp.asarray(scale * _LOG2_E, q.dtype)).reshape(
        b // fold, fold * lq, hd
    )
    kf = k.reshape(b // fold, fold * lk, hd)
    vf = v.reshape(b // fold, fold * lk, hd)
    out = pl.pallas_call(
        functools.partial(
            _small_seq_kernel, lq=lq, lk=lk, heads=h, d=d, fold=fold
        ),
        grid=(b // fold,),
        in_specs=[
            pl.BlockSpec((1, fold * lq, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fold * lk, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fold * lk, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, fold * lq, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b // fold, fold * lq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, lq, h, d)


# Below this sequence length the jnp path is both faster (no padding waste)
# and exactly what XLA fuses best; the kernel wins on long spatial sequences.
_FLASH_MIN_SEQ = 512
# Minimum folded tile rows for the small-seq kernel to beat the jnp path
# (tiny folds leave the MXU idle and the grid overhead dominant).
_SMALL_MIN_ROWS = 112



# ---------------------------------------------------------------------------
# Reverse-mode AD for the Pallas kernels. pallas_call supports only forward
# evaluation; these custom_vjp wrappers run the kernel forward and use either
# the memory-efficient chunked jnp backward (_attention_bwd_chunked) or, for
# the packed kernel, the fused Pallas backward below — in both, the [Lq, Lk]
# logits are never materialized, so training fits HBM at the same shapes
# the forward kernel exists for.
# ---------------------------------------------------------------------------


def _attention_bwd_chunked(q, k, v, out, g, scale,
                           block_k: int = 1024):
    """Memory-efficient attention backward (flash-style two-pass) in jnp.

    q/k/v/out/g are [N, L, D] (batch·heads flattened). Never materializes
    the [Lq, Lk] logits — a lax.scan over k-blocks streams a [N, Lq, bk]
    chunk (pass 1: logsumexp; pass 2: dq/dk/dv via
    ds = p ∘ (dp − rowsum(g∘out))). At swan ds=1 the naive reference VJP's
    f32 logits are ~19 GB > HBM; this is O(N·Lq·bk)."""
    n, lq, d = q.shape
    lk = k.shape[1]
    bk = min(block_k, lk)
    nb = -(-lk // bk)
    pad = nb * bk - lk
    f32 = jnp.float32
    qs = q.astype(f32) * scale
    kp = jnp.pad(k.astype(f32), ((0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v.astype(f32), ((0, 0), (0, pad), (0, 0)))
    gf = g.astype(f32)
    kb = kp.reshape(n, nb, bk, d).transpose(1, 0, 2, 3)   # [nb, N, bk, D]
    vb = vp.reshape(n, nb, bk, d).transpose(1, 0, 2, 3)
    valid = (
        jnp.arange(bk).reshape(1, 1, 1, bk)
        + jnp.arange(nb).reshape(nb, 1, 1, 1) * bk
    ) < lk                                                 # [nb, 1, 1, bk]

    def lse_step(carry, inp):
        m, l = carry                                       # [N, Lq]
        kblk, msk = inp
        s = jnp.einsum("nqd,nkd->nqk", qs, kblk)
        s = jnp.where(msk, s, -jnp.inf)
        m_new = jnp.maximum(m, s.max(-1))
        l_new = l * jnp.exp(m - m_new) + jnp.exp(s - m_new[..., None]).sum(-1)
        return (m_new, l_new), None

    # block 0 always holds valid keys (padding is a tail), so m is finite
    # after the first step and exp(m - m_new) never hits inf-inf
    (m, l), _ = jax.lax.scan(
        lse_step,
        (jnp.full((n, lq), -jnp.inf, f32), jnp.zeros((n, lq), f32)),
        (kb, valid),
    )
    lse = m + jnp.log(l)
    d_row = jnp.sum(gf * out.astype(f32), axis=-1)         # [N, Lq]

    def bwd_step(dq_acc, inp):
        kblk, vblk, msk = inp
        s = jnp.einsum("nqd,nkd->nqk", qs, kblk)
        s = jnp.where(msk, s, -jnp.inf)
        pblk = jnp.exp(s - lse[..., None])
        dp = jnp.einsum("nqd,nkd->nqk", gf, vblk)
        ds = pblk * (dp - d_row[..., None])
        dq_acc = dq_acc + jnp.einsum("nqk,nkd->nqd", ds, kblk)
        dkb = jnp.einsum("nqk,nqd->nkd", ds, qs)
        dvb = jnp.einsum("nqk,nqd->nkd", pblk, gf)
        return dq_acc, (dkb, dvb)

    dq, (dkb, dvb) = jax.lax.scan(
        bwd_step, jnp.zeros((n, lq, d), f32), (kb, vb, valid)
    )
    dq = (dq * scale).astype(q.dtype)
    dk = dkb.transpose(1, 0, 2, 3).reshape(n, nb * bk, d)[:, :lk].astype(k.dtype)
    dv = dvb.transpose(1, 0, 2, 3).reshape(n, nb * bk, d)[:, :lk].astype(v.dtype)
    return dq, dk, dv


# Backward-kernel block budget (scripts/tests/attn_bwd_tune.py sweeps this
# together with explicit blocks; the default keeps the heavier dkv program's
# working set comfortably under the 64 MB per-kernel scoped-vmem limit).
_BWD_VMEM_BUDGET = 14 * 1024 * 1024

# ---------------------------------------------------------------------------
# Pallas flash backward (packed layout). Standard flash-attention reverse
# pass split into two kernels so every output has exactly one writer program
# (no cross-program accumulation): dq iterates k-blocks innermost, dk/dv
# iterates q-blocks innermost. Both recompute one [bq, bk] logits tile at a
# time from the saved base-2 LSE — p = exp2(s2 - lse) — so the [Lq, Lk]
# weights never touch HBM, and q/k/v/g stream in their packed [B, L, H·D]
# projection layout (zero relayout, same as the forward kernel).
# ---------------------------------------------------------------------------


def _flash_packed_bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                                dq_ref, acc_ref, *, kv_len, block_k, heads, d,
                                scale):
    """dq = scale · Σ_k ds·k, ds = p ∘ (g·vᵀ − delta), p = exp2(s2 − lse).

    q_ref holds the PRESCALED qf = q·scale·log2e (same prescale as the
    forward), so s2 = qf·kᵀ matches the saved lse's logit space exactly."""
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qf = q_ref[0]   # [bq, H·D] prescaled
    kk = k_ref[0]   # [bk, H·D]
    vv = v_ref[0]
    gg = g_ref[0]   # [bq, H·D]
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        s2 = jax.lax.dot_general(
            qf[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk] f32, base-2 logit space
        if kv_len % block_k != 0:
            # padded tail keys would otherwise contribute p=exp2(0-lse)>0
            k_ids = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s2.shape, 1
            )
            s2 = jnp.where(
                jnp.logical_or(kb != nkb - 1, k_ids < kv_len),
                s2, DEFAULT_MASK_VALUE,
            )
        p = jnp.exp2(s2 - lse_ref[0, :, hh:hh + 1])
        dp = jax.lax.dot_general(
            gg[:, sl], vv[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, :, hh:hh + 1])
        acc_ref[:, sl] = acc_ref[:, sl] + jax.lax.dot_general(
            ds.astype(kk.dtype), kk[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kb == nkb - 1)
    def _finalize():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _flash_packed_bwd_dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref,
                                 delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                                 heads, d):
    """dv = Σ_q pᵀ·g; dk = (Σ_q dsᵀ·qf) / log2e (qf carries scale·log2e).

    No key-tail masking: padded key rows only produce dk/dv rows that the
    caller slices away; padded q rows carry zero g (and finite lse, since
    padded q is zero not -inf), so ds and the dv contribution vanish."""
    qb = pl.program_id(2)
    nqb = pl.num_programs(2)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    qf = q_ref[0]
    kk = k_ref[0]
    vv = v_ref[0]
    gg = g_ref[0]
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        s2 = jax.lax.dot_general(
            qf[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk]
        p = jnp.exp2(s2 - lse_ref[0, :, hh:hh + 1])
        dv_acc[:, sl] = dv_acc[:, sl] + jax.lax.dot_general(
            p.astype(gg.dtype), gg[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, d]
        dp = jax.lax.dot_general(
            gg[:, sl], vv[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, :, hh:hh + 1])
        dk_acc[:, sl] = dk_acc[:, sl] + jax.lax.dot_general(
            ds.astype(qf.dtype), qf[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qb == nqb - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[:] * (1.0 / _LOG2_E)).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "block_q", "block_k", "interpret"),
)
def _flash_attention_packed_bwd_impl(
    q: jax.Array,    # [B, Lq, H·D]
    k: jax.Array,    # [B, Lk, H·D]
    v: jax.Array,
    out: jax.Array,  # [B, Lq, H·D]
    lse: jax.Array,  # [B, Lq, H] f32, base-2 (from the save_lse forward)
    g: jax.Array,    # [B, Lq, H·D]
    heads: int,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
):
    """Launch the dq and dkv Pallas kernels; returns (dq, dk, dv) in the
    packed layout. delta = rowsum(g ∘ out) per head is a cheap fused jnp
    reduce; everything else runs in VMEM."""
    b, lq, hd = q.shape
    lk = k.shape[1]
    d = hd // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    if block_q is None:
        block_q = max(
            (c for c in range(256, 520, 8) if lq % c == 0), default=512
        )
    if block_k is None:
        block_k = max(
            (c for c in range(256, 1032, 8) if lk % c == 0), default=512
        )
    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))

    in_bytes = q.dtype.itemsize
    lanes = _round_up(hd, 128)

    def vmem_bytes(bq, bk):
        # dkv is the heavier program: qf/g [bq] + k/v [bk] + dk/dv out [bk]
        # blocks double-buffered, lse/delta [bq, lanes-padded-H] f32, two
        # [bk, H·D] f32 accumulators, and per-head f32 s2/p/dp/ds tiles
        # (+ their bf16 casts), ×1.5 for Mosaic pipelining of the heads loop
        io = 2 * (
            (2 * bq + 4 * bk) * lanes * in_bytes + 2 * bq * 128 * 4
        )
        accs = 2 * bk * lanes * 4
        cells = bq * bk * (4 * 4 + 2 * in_bytes)
        return io + accs + int(cells * 1.5)

    budget = _BWD_VMEM_BUDGET
    if vmem_bytes(block_q, block_k) > budget:
        fits = [
            c for c in range(128, block_k + 1, 8)
            if vmem_bytes(block_q, c) <= budget
        ]
        divs = [c for c in fits if lk % c == 0]
        block_k = max(divs or fits or [128])
    while vmem_bytes(block_q, block_k) > budget and block_q > 128:
        block_q = max(128, block_q // 2)

    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)

    f32 = jnp.float32
    delta = (g.astype(f32) * out.astype(f32)).reshape(
        b, lq, heads, d
    ).sum(-1)                                           # [B, Lq, H]
    qf = q * jnp.asarray(scale * _LOG2_E, q.dtype)      # forward's prescale
    gf = g.astype(q.dtype)
    lsef = lse
    if lq_pad != lq:
        pad = ((0, 0), (0, lq_pad - lq), (0, 0))
        qf, gf = jnp.pad(qf, pad), jnp.pad(gf, pad)
        lsef, delta = jnp.pad(lsef, pad), jnp.pad(delta, pad)
    kf, vf = k, v
    if lk_pad != lk:
        pad = ((0, 0), (0, lk_pad - lk), (0, 0))
        kf, vf = jnp.pad(k, pad), jnp.pad(v, pad)

    nqb, nkb = lq_pad // block_q, lk_pad // block_k

    dq = pl.pallas_call(
        functools.partial(
            _flash_packed_bwd_dq_kernel, kv_len=lk, block_k=block_k,
            heads=heads, d=d, scale=scale,
        ),
        grid=(b, nqb, nkb),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bb, qb, kb: (bb, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda bb, qb, kb: (bb, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda bb, qb, kb: (bb, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, hd), lambda bb, qb, kb: (bb, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, heads), lambda bb, qb, kb: (bb, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, heads), lambda bb, qb, kb: (bb, qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd),
                               lambda bb, qb, kb: (bb, qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lq_pad, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lsef, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_packed_bwd_dkv_kernel, heads=heads, d=d,
        ),
        grid=(b, nkb, nqb),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bb, kb, qb: (bb, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda bb, kb, qb: (bb, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda bb, kb, qb: (bb, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, hd), lambda bb, kb, qb: (bb, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, heads), lambda bb, kb, qb: (bb, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, heads), lambda bb, kb, qb: (bb, qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, hd), lambda bb, kb, qb: (bb, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda bb, kb, qb: (bb, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lk_pad, hd), k.dtype),
            jax.ShapeDtypeStruct((b, lk_pad, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, hd), jnp.float32),
            pltpu.VMEM((block_k, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lsef, delta)

    return dq[:, :lq], dk[:, :lk], dv[:, :lk]


def _small_seq_bwd_kernel(q_ref, k_ref, v_ref, g_ref, o_ref,
                          dq_ref, dk_ref, dv_ref, *, lq, lk, heads, d, fold,
                          scale):
    """Fused dq/dk/dv for `fold` tiny attention problems in one tile.

    Each program owns its problems outright (no cross-program accumulation),
    so the whole backward is a single kernel: recompute the block-diagonal
    softmax exactly as the forward does (penalty mask → cross-problem p
    underflows to 0, hence ds = 0 there and the three grads stay exact),
    then the standard ds = p ∘ (g·vᵀ − rowsum(g∘out)) reverse pass. The jnp
    chunked backward at these shapes materializes [B·H, t, t] f32 logits
    lane-padded t=14 → 128 in HBM (~10× traffic); here they never leave
    VMEM. q_ref is PRESCALED by scale·log2e (forward convention)."""
    qf = q_ref[0]   # [fold·lq, H·D]
    kk = k_ref[0]   # [fold·lk, H·D]
    vv = v_ref[0]
    gg = g_ref[0]   # [fold·lq, H·D]
    oo = o_ref[0]
    rows, cols = fold * lq, fold * lk
    qg = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // lq
    kg = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1) // lk
    pen = jnp.where(qg == kg, 0.0, DEFAULT_MASK_VALUE)
    f32 = jnp.float32
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        s2 = jax.lax.dot_general(
            qf[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) + pen
        m = jnp.max(s2, axis=-1, keepdims=True)
        e = jnp.exp2(s2 - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)   # true softmax weights
        delta = jnp.sum(
            gg[:, sl].astype(f32) * oo[:, sl].astype(f32),
            axis=-1, keepdims=True,
        )
        dp = jax.lax.dot_general(
            gg[:, sl], vv[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        ds = p * (dp - delta)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            p.astype(gg.dtype), gg[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dv_ref.dtype)
        dk_ref[0, :, sl] = (jax.lax.dot_general(
            ds.astype(qf.dtype), qf[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) * (1.0 / _LOG2_E)).astype(dk_ref.dtype)
        dq_ref[0, :, sl] = (jax.lax.dot_general(
            ds.astype(kk.dtype), kk[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) * scale).astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "fold", "interpret"))
def _small_batched_attention_bwd_impl(
    q: jax.Array,    # [B, Lq, H, D]
    k: jax.Array,    # [B, Lk, H, D]
    v: jax.Array,
    out: jax.Array,  # [B, Lq, H, D]
    g: jax.Array,
    scale: Optional[float] = None,
    fold: Optional[int] = None,
    interpret: bool = False,
):
    """Single-kernel folded backward for the tiny-seq batched kernel."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    hd = h * d
    if fold is None:
        fold = _best_fold(b, lq, lk, hd, q.dtype.itemsize,
                          model=_sba_bwd_vmem_bytes)
    else:
        # the caller's fold came from the FORWARD vmem model (the vjp reuses
        # the forward dispatch's fold); shrink to the largest divisor of B
        # whose backward live set fits — on the compile-smoked swan train
        # shapes the two budgets admit the same fold, but shapes outside
        # them must not exceed scoped VMEM here
        budget = (_KERNEL_VMEM_LIMIT * 3) // 4
        while fold > 1 and (
            b % fold
            or _sba_bwd_vmem_bytes(fold, lq, lk, hd, q.dtype.itemsize) > budget
        ):
            fold -= 1
    assert b % fold == 0, (b, fold)
    qf = (q * jnp.asarray(scale * _LOG2_E, q.dtype)).reshape(
        b // fold, fold * lq, hd
    )
    kf = k.reshape(b // fold, fold * lk, hd)
    vf = v.reshape(b // fold, fold * lk, hd)
    gf = g.astype(q.dtype).reshape(b // fold, fold * lq, hd)
    of = out.reshape(b // fold, fold * lq, hd)
    row_spec = pl.BlockSpec((1, fold * lq, hd), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, fold * lk, hd), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _small_seq_bwd_kernel, lq=lq, lk=lk, heads=h, d=d, fold=fold,
            scale=scale,
        ),
        grid=(b // fold,),
        in_specs=[row_spec, col_spec, col_spec, row_spec, row_spec],
        out_specs=[row_spec, col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b // fold, fold * lq, hd), q.dtype),
            jax.ShapeDtypeStruct((b // fold, fold * lk, hd), k.dtype),
            jax.ShapeDtypeStruct((b // fold, fold * lk, hd), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, of)
    return (
        dq.reshape(b, lq, h, d),
        dk.reshape(b, lk, h, d),
        dv.reshape(b, lk, h, d),
    )


def _use_pallas_attn_bwd() -> bool:
    """Pallas attention-backward switch (read per trace so tests can
    monkeypatch). Default ON from the r4 in-model measurement: the swan
    b=28 remat'd train step fell 3180.8 -> 2219.6 ms (bwd/fwd 5.31 -> 3.40)
    with these kernels vs the chunked jnp VJP; every dispatched bwd shape
    compile-checked standalone (triage_bwd_kernels). VIDSEG_PALLAS_ATTN_BWD=0
    opts out (falls back to the chunked jnp backward)."""
    return _os.environ.get("VIDSEG_PALLAS_ATTN_BWD", "1") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fa(scale, block_q, block_k, interpret, layout, q, k, v):
    return _flash_attention_impl(
        q, k, v, scale=scale, block_q=block_q, block_k=block_k,
        interpret=interpret, layout=layout,
    )


def _fa_fwd(scale, block_q, block_k, interpret, layout, q, k, v):
    if _use_pallas_attn_bwd():
        # Run the PACKED kernel with heads=1 on [B·H, L, D] so the forward
        # saves the LSE the Pallas backward needs. [B,H,L,D] -> [B·H,L,D]
        # is a free reshape; blhd pays the same moveaxis the 3-D impl does.
        if layout == "blhd":
            to = lambda t: jnp.moveaxis(t, 2, 1)
        else:
            to = lambda t: t
        qt, kt, vt = to(q), to(k), to(v)
        b, h, lq, d = qt.shape
        lk = kt.shape[2]
        flat = lambda t, l: t.reshape(b * h, l, d)
        out_f, lse = _flash_attention_packed_impl(
            flat(qt, lq), flat(kt, lk), flat(vt, lk), heads=1, scale=scale,
            block_q=block_q, block_k=block_k, interpret=interpret,
            save_lse=True, fused_psum=_fused_psum_enabled(),
        )
        out = out_f.reshape(b, h, lq, d)
        if layout == "blhd":
            out = jnp.moveaxis(out, 1, 2)
        return out, (q, k, v, out, lse)
    out = _fa(scale, block_q, block_k, interpret, layout, q, k, v)
    return out, (q, k, v, out, None)


def _fa_bwd(scale, block_q, block_k, interpret, layout, res, g):
    q, k, v, out, lse = res
    eff = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    if layout == "blhd":
        to = lambda t: t.transpose(0, 2, 1, 3)
    else:
        to = lambda t: t
    qt, kt, vt, ot, gt = (to(t) for t in (q, k, v, out, g))
    sh = qt.shape
    flat = lambda t: t.reshape(sh[0] * sh[1], t.shape[2], t.shape[3])
    if lse is not None:
        _log_dispatch(
            "flash_bwd", b=sh[0], lq=sh[2], lk=kt.shape[2], h=sh[1],
            d=sh[3], dtype=str(q.dtype),
        )
        dq, dk, dv = _flash_attention_packed_bwd_impl(
            flat(qt), flat(kt), flat(vt), flat(ot), lse, flat(gt),
            heads=1, scale=eff, interpret=interpret,
        )
    else:
        dq, dk, dv = _attention_bwd_chunked(
            flat(qt), flat(kt), flat(vt), flat(ot), flat(gt), eff
        )
    unflat = lambda t: to(t.reshape(sh[0], sh[1], t.shape[1], t.shape[2]))
    return unflat(dq), unflat(dk), unflat(dv)


_fa.defvjp(_fa_fwd, _fa_bwd)


def flash_attention(q, k, v, scale=None, block_q=None, block_k=None,
                    interpret=False, layout="bhld"):
    """Pallas flash forward; reference-math VJP (see note above)."""
    return _fa(scale, block_q, block_k, bool(interpret), layout, q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fap(heads, scale, block_q, block_k, interpret, q, k, v):
    return _flash_attention_packed_impl(
        q, k, v, heads, scale=scale, block_q=block_q, block_k=block_k,
        interpret=interpret, fused_psum=_fused_psum_enabled(),
    )


def _fap_fwd(heads, scale, block_q, block_k, interpret, q, k, v):
    out, lse = _flash_attention_packed_impl(
        q, k, v, heads, scale=scale, block_q=block_q, block_k=block_k,
        interpret=interpret, save_lse=True, fused_psum=_fused_psum_enabled(),
    )
    return out, (q, k, v, out, lse)


def _fap_bwd(heads, scale, block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    b, lq, hd = q.shape
    lk = k.shape[1]
    d = hd // heads
    eff = scale if scale is not None else 1.0 / math.sqrt(d)

    if _use_pallas_attn_bwd():
        _log_dispatch(
            "flash_packed_bwd", b=b, lq=lq, lk=lk, h=heads, d=d,
            dtype=str(q.dtype),
        )
        return _flash_attention_packed_bwd_impl(
            q, k, v, out, lse, g.reshape(b, lq, hd), heads, scale=eff,
            interpret=interpret,
        )

    def flat(t, l):
        # [B, L, H·D] -> [B·H, L, D]
        return t.reshape(b, l, heads, d).transpose(0, 2, 1, 3).reshape(
            b * heads, l, d
        )

    dq, dk, dv = _attention_bwd_chunked(
        flat(q, lq), flat(k, lk), flat(v, lk), flat(out, lq),
        flat(g.reshape(b, lq, hd), lq), eff,
    )

    def unflat(t, l):
        return t.reshape(b, heads, l, d).transpose(0, 2, 1, 3).reshape(
            b, l, hd
        )

    return unflat(dq, lq), unflat(dk, lk), unflat(dv, lk)


_fap.defvjp(_fap_fwd, _fap_bwd)


def flash_attention_packed(q, k, v, heads, scale=None, block_q=None,
                           block_k=None, interpret=False):
    """Packed-head Pallas flash forward; reference-math VJP (see note)."""
    return _fap(heads, scale, block_q, block_k, bool(interpret), q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _sba(scale, fold, interpret, q, k, v):
    return _small_batched_attention_impl(
        q, k, v, scale=scale, fold=fold, interpret=interpret
    )


def _sba_fwd(scale, fold, interpret, q, k, v):
    out = _sba(scale, fold, interpret, q, k, v)
    return out, (q, k, v, out)


def _sba_bwd(scale, fold, interpret, res, g):
    q, k, v, out = res
    b, lq, h, d = q.shape
    lk = k.shape[1]
    eff = scale if scale is not None else 1.0 / math.sqrt(d)
    if _use_pallas_attn_bwd():
        _log_dispatch(
            "small_batched_bwd", b=b, lq=lq, lk=lk, h=h, d=d, fold=fold,
            dtype=str(q.dtype),
        )
        return _small_batched_attention_bwd_impl(
            q, k, v, out, g, scale=eff, fold=fold, interpret=interpret
        )
    flat = lambda t, l: t.transpose(0, 2, 1, 3).reshape(b * h, l, t.shape[-1])
    dq, dk, dv = _attention_bwd_chunked(
        flat(q, lq), flat(k, lk), flat(v, lk), flat(out, lq), flat(g, lq), eff
    )
    unflat = lambda t, l: t.reshape(b, h, l, d).transpose(0, 2, 1, 3)
    return unflat(dq, lq), unflat(dk, lk), unflat(dv, lk)


_sba.defvjp(_sba_fwd, _sba_bwd)


def small_batched_attention(q, k, v, scale=None, fold=None, interpret=False):
    """Folded tiny-seq Pallas forward; reference-math VJP (see note)."""
    return _sba(scale, fold, bool(interpret), q, k, v)


def _temporal_direct_kernel(q_ref, k_ref, v_ref, o_ref, *, t, s_tile, heads, d):
    """Temporal attention computed IN the spatial token layout.

    Blocks are [t, s_tile, H·D] slices of the UNet-native [(b t), s, H·D]
    activation — for one video b and one tile of spatial tokens, the t rows
    of each token are a contiguous block, so NO (b t) s c ↔ (b s) t c HBM
    transpose is ever materialized (that pair of transposes costs ~3 GB/step
    across the 10 temporal sites at swan scale — PROFILE_UNET %copy).

    Same masked-fold trick as `_small_seq_kernel`: the merged [t·s_tile, H·D]
    rows hold s_tile independent t-length problems INTERLEAVED (row
    r = ti·s_tile + si belongs to problem si), so per head ONE MXU dot
    computes every problem's logits and entries with si≠sj are masked to
    -huge (exact 0 after exp2). s_tile is a multiple of the sublane tile so
    the [t, s_tile, hd]→[t·s_tile, hd] merge is layout-free."""
    hd = heads * d
    rows = t * s_tile
    q = q_ref[...].reshape(rows, hd)  # pre-scaled by scale·log2e
    k = k_ref[...].reshape(rows, hd)
    v = v_ref[...].reshape(rows, hd)
    qg = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % s_tile
    kg = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1) % s_tile
    pen = jnp.where(qg == kg, 0.0, DEFAULT_MASK_VALUE)  # [rows, rows] f32
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + pen
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        psum = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = (pv / psum).reshape(t, s_tile, d).astype(o_ref.dtype)


def _best_s_tile(s: int, t: int, hd: int, itemsize: int = 2,
                 rows_cap: int = 512) -> Optional[int]:
    """Largest spatial-tile width for `_temporal_direct_kernel`: must divide
    s exactly (no padding support — padding would reintroduce the relayout
    copies the kernel exists to remove), be a multiple of 16 (bf16 sublane
    tile, so the in-kernel [t, s_tile, hd]→[t·s_tile, hd] merge is free),
    keep the folded tile within the rows cap, and fit the scoped-VMEM model
    (`_sba_vmem_bytes` — identical live-set shape with fold↔s_tile,
    lq=lk=t). None → the caller falls back to the canonical layout."""
    budget = (_KERNEL_VMEM_LIMIT * 3) // 4
    cap = max(16, (rows_cap // max(t, 1)) // 16 * 16)
    for st in range(cap, 0, -16):
        if s % st:
            continue
        if _sba_vmem_bytes(st, t, t, hd, itemsize) <= budget:
            return st
    return None


@functools.partial(
    jax.jit, static_argnames=("t", "scale", "s_tile", "interpret")
)
def _temporal_direct_impl(
    q: jax.Array,  # [(b·t), s, H, D] — UNet spatial token layout
    k: jax.Array,
    v: jax.Array,
    t: int,
    scale: Optional[float] = None,
    s_tile: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    bt, s, h, d = q.shape
    assert bt % t == 0, (bt, t)
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    hd = h * d
    if s_tile is None:
        s_tile = _best_s_tile(s, t, hd, q.dtype.itemsize)
    assert s_tile is not None and s % s_tile == 0, (s, s_tile)
    qf = (q * jnp.asarray(scale * _LOG2_E, q.dtype)).reshape(bt, s, hd)
    kf = k.reshape(bt, s, hd)
    vf = v.reshape(bt, s, hd)
    spec = pl.BlockSpec((t, s_tile, hd), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _temporal_direct_kernel, t=t, s_tile=s_tile, heads=h, d=d
        ),
        grid=(bt // t, s // s_tile),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bt, s, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_KERNEL_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(bt, s, h, d)


def _temporal_to_canonical(x: jax.Array, t: int) -> jax.Array:
    """[(b t), s, h, d] → [(b s), t, h, d] (the video_attention.py:152
    rearrange the direct kernel exists to avoid; used only by the fallback
    dispatch and the reverse pass)."""
    bt, s, h, d = x.shape
    b = bt // t
    return x.reshape(b, t, s, h, d).transpose(0, 2, 1, 3, 4).reshape(
        b * s, t, h, d
    )


def _temporal_from_canonical(x: jax.Array, t: int, b: int) -> jax.Array:
    bs, t_, h, d = x.shape
    s = bs // b
    return x.reshape(b, s, t_, h, d).transpose(0, 2, 1, 3, 4).reshape(
        b * t_, s, h, d
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _tad(scale, t, s_tile, interpret, q, k, v):
    return _temporal_direct_impl(
        q, k, v, t=t, scale=scale, s_tile=s_tile, interpret=interpret
    )


def _tad_fwd(scale, t, s_tile, interpret, q, k, v):
    out = _tad(scale, t, s_tile, interpret, q, k, v)
    return out, (q, k, v, out)


def _tad_bwd(scale, t, s_tile, interpret, res, g):
    """Reverse pass via the canonical-layout backward kernels: the backward
    runs only in training (which defaults to the canonical layout), so the
    transposes here are a cold path traded for forward-path simplicity."""
    q, k, v, out = res
    bt, s, h, d = q.shape
    b = bt // t
    eff = scale if scale is not None else 1.0 / math.sqrt(d)
    toc = lambda x: _temporal_to_canonical(x, t)
    qc, kc, vc, oc, gc = toc(q), toc(k), toc(v), toc(out), toc(g)
    if _use_pallas_attn_bwd():
        _log_dispatch(
            "small_batched_bwd", b=b * s, lq=t, lk=t, h=h, d=d, fold=None,
            dtype=str(q.dtype),
        )
        dq, dk, dv = _small_batched_attention_bwd_impl(
            qc, kc, vc, oc, gc, scale=eff, interpret=interpret
        )
    else:
        flat = lambda x: x.transpose(0, 2, 1, 3).reshape(b * s * h, t, d)
        dqf, dkf, dvf = _attention_bwd_chunked(
            flat(qc), flat(kc), flat(vc), flat(oc), flat(gc), eff
        )
        unflat = lambda x: x.reshape(b * s, h, t, d).transpose(0, 2, 1, 3)
        dq, dk, dv = unflat(dqf), unflat(dkf), unflat(dvf)
    back = lambda x: _temporal_from_canonical(x, t, b)
    return back(dq), back(dk), back(dv)


_tad.defvjp(_tad_fwd, _tad_bwd)


def temporal_attention_direct(
    q: jax.Array,  # [(b·t), s, H, D]
    k: jax.Array,
    v: jax.Array,
    t: int,
    scale: Optional[float] = None,
    interpret: bool = False,
    force: Optional[bool] = None,
) -> jax.Array:
    """Temporal (cross-frame) attention on the spatial token layout.

    Counterpart of the reference's `(b t) s c → (b s) t c` rearrange +
    attention + rearrange-back (video_attention.py:152, 282-284), with the
    two HBM transposes deleted: on TPU a Pallas kernel reads the [(b t), s,
    H·D] activation in contiguous [t, s_tile, H·D] blocks and computes the
    per-(b, s, head) t-length softmax in VMEM. Shapes the kernel cannot tile
    (s not a multiple of 16 — the ds≥4 UNet levels at swan, 16–64× smaller
    tensors) fall back to the canonical rearrange + `dot_product_attention`."""
    bt, s, h, d = q.shape
    assert bt % t == 0, (bt, t)
    st = None
    use = force
    if use is None or use:
        on_tpu = jax.default_backend() == "tpu" or interpret or force
        if on_tpu:
            st = _best_s_tile(s, t, h * d, q.dtype.itemsize)
        if use is None:
            use = st is not None and t * st >= _SMALL_MIN_ROWS
        elif st is None:
            raise ValueError(f"no valid s_tile for s={s}, t={t}")
    if use:
        _log_dispatch(
            "temporal_direct", bt=bt, s=s, t=t, h=h, d=d, s_tile=st,
            dtype=str(q.dtype),
        )
        return _tad(scale, t, st, bool(interpret), q, k, v)
    b = bt // t
    out = dot_product_attention(
        _temporal_to_canonical(q, t),
        _temporal_to_canonical(k, t),
        _temporal_to_canonical(v, t),
        scale=scale, layout="blhd",
    )
    return _temporal_from_canonical(out, t, b)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    force_flash: Optional[bool] = None,
    layout: str = "bhld",
) -> jax.Array:
    """SDPA dispatcher: Pallas flash kernel for long sequences on TPU,
    jnp reference otherwise. Counterpart of the reference's
    F.scaled_dot_product_attention backend switching (attention.py:17-57).
    layout='blhd' consumes projection-native [B, L, H, D] (see
    flash_attention)."""
    l_axis = 1 if layout == "blhd" else 2
    lq, lk = q.shape[l_axis], k.shape[l_axis]
    if lk == 1 and force_flash is None:
        # softmax over a single key is identically 1 → attention returns V
        # verbatim. The SVD cross-attention context is one pooled CLIP token
        # (conditioner.py clip_pred), so this shortcut removes the entire
        # [B, H, L, 1] logits/softmax (tiled 1 → 128 lanes in HBM by XLA).
        shape = list(v.shape)
        shape[l_axis] = lq
        return jnp.broadcast_to(v, shape).astype(q.dtype)
    use_flash = force_flash
    if use_flash is None:
        on_tpu = jax.default_backend() == "tpu"
        if (
            on_tpu
            and layout == "blhd"
            and max(lq, lk) < _FLASH_MIN_SEQ
        ):
            fold = _best_fold(q.shape[0], lq, lk, q.shape[2] * q.shape[3], q.dtype.itemsize)
            if fold * lq >= _SMALL_MIN_ROWS:
                _log_dispatch(
                    "small_batched", b=q.shape[0], lq=lq, lk=lk,
                    h=q.shape[2], d=q.shape[3], fold=fold,
                    dtype=str(q.dtype),
                )
                return small_batched_attention(q, k, v, scale=scale, fold=fold)
        use_flash = on_tpu and lq >= _FLASH_MIN_SEQ and lk >= _FLASH_MIN_SEQ
    if use_flash:
        if layout == "blhd":
            # Packed all-heads kernel: consumes the projections' [B, L, H·D]
            # packing directly — the bhld 3-D kernel would pay a physical
            # l↔h transpose per tensor (~4 ms per ds1 site on v5e, see
            # scripts/tests/attn_layout_bench.py).
            b, lq_, h, d = q.shape
            lk_ = k.shape[1]
            _log_dispatch(
                "flash_packed", b=b, lq=lq_, lk=lk_, h=h, d=d,
                dtype=str(q.dtype),
            )
            out = flash_attention_packed(
                q.reshape(b, lq_, h * d),
                k.reshape(b, lk_, h * d),
                v.reshape(b, lk_, h * d),
                heads=h, scale=scale,
            )
            return out.reshape(b, lq_, h, d)
        return flash_attention(q, k, v, scale=scale, layout=layout)
    return mha_reference(q, k, v, scale=scale, layout=layout)
