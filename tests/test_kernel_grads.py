"""Reverse-mode AD through every Pallas kernel (custom_vjp wrappers):
pallas_call alone rejects reverse-mode, and all five kernels sit on the
TPU training path (CrossAttention projections, video ResBlocks, SDPA).
Grads must match the jnp reference's grads (matmul/conv backwards are the
reference VJP; attention backwards are the memory-efficient chunked
formulation — same math, never materializing the [Lq, Lk] logits)."""

import numpy as np
import jax
import jax.numpy as jnp

from vidseg_diffusion_tpu.ops.attention import (
    flash_attention,
    flash_attention_packed,
    mha_reference,
    small_batched_attention,
)
from vidseg_diffusion_tpu.ops.conv3x3 import conv3x3_reference, conv3x3_same
from vidseg_diffusion_tpu.ops.matmul import matmul_bias
from vidseg_diffusion_tpu.ops.temporal_conv import (
    temporal_conv_1x1,
    temporal_conv_1x1_reference,
)


def _grads(fn, *args):
    return jax.grad(lambda *a: jnp.sum(fn(*a) ** 2), argnums=tuple(range(len(args))))(*args)


def _check(got, want, atol=2e-4):
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol
        ),
        got, want,
    )


def test_matmul_bias_grads():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (100, 64))
    w = jax.random.normal(jax.random.fold_in(k, 1), (64, 128)) * 0.1
    b = jax.random.normal(jax.random.fold_in(k, 2), (128,))
    got = _grads(lambda x_, w_, b_: matmul_bias(x_, w_, b_, interpret=True), x, w, b)
    want = _grads(lambda x_, w_, b_: x_ @ w_ + b_, x, w, b)
    _check(got, want)


def test_conv3x3_grads():
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (2, 6, 10, 16)) * 0.3
    w = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 16, 16)) * 0.1
    b = jax.random.normal(jax.random.fold_in(k, 2), (16,))
    got = _grads(lambda *a: conv3x3_same(*a, interpret=True), x, w, b)
    want = _grads(conv3x3_reference, x, w, b)
    _check(got, want)


def test_temporal_conv_grads():
    k = jax.random.PRNGKey(2)
    x = jax.random.normal(k, (2, 5, 24, 32)) * 0.3
    w = jax.random.normal(jax.random.fold_in(k, 1), (3, 32, 32)) * 0.1
    b = jax.random.normal(jax.random.fold_in(k, 2), (32,))
    got = _grads(lambda *a: temporal_conv_1x1(*a, interpret=True), x, w, b)
    want = _grads(temporal_conv_1x1_reference, x, w, b)
    _check(got, want)


def test_flash_attention_grads(monkeypatch):
    monkeypatch.setenv("VIDSEG_PALLAS_ATTN_BWD", "0")  # chunked-jnp path
    k = jax.random.PRNGKey(3)
    q = jax.random.normal(k, (2, 2, 128, 32))
    kk = jax.random.normal(jax.random.fold_in(k, 1), (2, 2, 128, 32))
    v = jax.random.normal(jax.random.fold_in(k, 2), (2, 2, 128, 32))
    got = _grads(lambda *a: flash_attention(*a, interpret=True), q, kk, v)
    want = _grads(mha_reference, q, kk, v)
    _check(got, want, atol=1e-3)


def test_flash_attention_grads_pallas_bwd(monkeypatch):
    """bhld/blhd flash VJP through the packed heads=1 Pallas backward,
    including a non-128-multiple L (padded/masked paths)."""
    monkeypatch.setenv("VIDSEG_PALLAS_ATTN_BWD", "1")
    k = jax.random.PRNGKey(8)
    for layout, shape in (
        ("bhld", (2, 2, 128, 32)),
        ("bhld", (2, 1, 200, 32)),
        ("blhd", (2, 128, 2, 32)),
    ):
        q = jax.random.normal(k, shape)
        kk = jax.random.normal(jax.random.fold_in(k, 1), shape)
        v = jax.random.normal(jax.random.fold_in(k, 2), shape)
        got = _grads(
            lambda *a, layout=layout: flash_attention(
                *a, interpret=True, layout=layout
            ),
            q, kk, v,
        )
        want = _grads(
            lambda *a, layout=layout: mha_reference(*a, layout=layout),
            q, kk, v,
        )
        _check(got, want, atol=1e-3)


def test_flash_packed_grads(monkeypatch):
    # pin the chunked-jnp backward (Pallas bwd is default ON and covered by
    # test_flash_packed_grads_pallas_bwd)
    monkeypatch.setenv("VIDSEG_PALLAS_ATTN_BWD", "0")
    k = jax.random.PRNGKey(4)
    b, l, h, d = 2, 128, 2, 32
    q = jax.random.normal(k, (b, l, h * d))
    kk = jax.random.normal(jax.random.fold_in(k, 1), (b, l, h * d))
    v = jax.random.normal(jax.random.fold_in(k, 2), (b, l, h * d))
    got = _grads(
        lambda *a: flash_attention_packed(*a, heads=h, interpret=True), q, kk, v
    )

    def ref(q_, k_, v_):
        out = mha_reference(
            q_.reshape(b, l, h, d), k_.reshape(b, l, h, d),
            v_.reshape(b, l, h, d), layout="blhd",
        )
        return out.reshape(b, l, h * d)

    want = _grads(ref, q, kk, v)
    _check(got, want, atol=1e-3)


def test_flash_packed_grads_pallas_bwd(monkeypatch):
    """The fused Pallas backward (dq + dkv kernels, p recomputed from the
    saved base-2 LSE) must match the dense reference VJP — including a
    non-block-aligned Lq/Lk so both the padded-query and masked-key-tail
    paths run (block_q/block_k floor at 128; L=200 pads to 256)."""
    monkeypatch.setenv("VIDSEG_PALLAS_ATTN_BWD", "1")
    k = jax.random.PRNGKey(6)
    for l in (128, 200):
        b, h, d = 2, 2, 32
        q = jax.random.normal(k, (b, l, h * d))
        kk = jax.random.normal(jax.random.fold_in(k, 1), (b, l, h * d))
        v = jax.random.normal(jax.random.fold_in(k, 2), (b, l, h * d))
        got = _grads(
            lambda *a: flash_attention_packed(*a, heads=h, interpret=True),
            q, kk, v,
        )

        def ref(q_, k_, v_, l=l):
            out = mha_reference(
                q_.reshape(b, l, h, d), k_.reshape(b, l, h, d),
                v_.reshape(b, l, h, d), layout="blhd",
            )
            return out.reshape(b, l, h * d)

        want = _grads(ref, q, kk, v)
        _check(got, want, atol=1e-3)


def test_small_batched_grads(monkeypatch):
    monkeypatch.setenv("VIDSEG_PALLAS_ATTN_BWD", "0")
    k = jax.random.PRNGKey(5)
    q = jax.random.normal(k, (6, 14, 2, 32))
    kk = jax.random.normal(jax.random.fold_in(k, 1), (6, 14, 2, 32))
    v = jax.random.normal(jax.random.fold_in(k, 2), (6, 14, 2, 32))
    got = _grads(
        lambda *a: small_batched_attention(*a, fold=2, interpret=True), q, kk, v
    )
    want = _grads(
        lambda q_, k_, v_: mha_reference(q_, k_, v_, layout="blhd"), q, kk, v
    )
    _check(got, want, atol=1e-3)


def test_small_batched_grads_pallas_bwd(monkeypatch):
    """Single-kernel folded Pallas backward (softmax recomputed in-tile,
    cross-problem entries masked) must match the dense reference VJP,
    including cross-attention shape lq != lk."""
    monkeypatch.setenv("VIDSEG_PALLAS_ATTN_BWD", "1")
    k = jax.random.PRNGKey(7)
    for lq, lk in ((14, 14), (14, 5)):
        q = jax.random.normal(k, (6, lq, 2, 32))
        kk = jax.random.normal(jax.random.fold_in(k, 1), (6, lk, 2, 32))
        v = jax.random.normal(jax.random.fold_in(k, 2), (6, lk, 2, 32))
        got = _grads(
            lambda *a: small_batched_attention(*a, fold=2, interpret=True),
            q, kk, v,
        )
        want = _grads(
            lambda q_, k_, v_: mha_reference(q_, k_, v_, layout="blhd"),
            q, kk, v,
        )
        _check(got, want, atol=1e-3)


def test_grad_through_cross_attention_forced_dispatch():
    """End-to-end: jax.value_and_grad through a CrossAttention whose
    projections are forced onto the Pallas matmul (the exact failure mode:
    swan-scale training on TPU dispatches there)."""
    from unittest import mock

    from vidseg_diffusion_tpu.models.layers import CrossAttention
    from vidseg_diffusion_tpu.ops.matmul import matmul_bias as real_mb

    attn = CrossAttention(heads=2, dim_head=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32))
    params = attn.init(jax.random.PRNGKey(1), x)["params"]

    with mock.patch(
        "vidseg_diffusion_tpu.ops.matmul.use_pallas_matmul",
        lambda *a, **k: True,
    ), mock.patch(
        "vidseg_diffusion_tpu.ops.matmul.matmul_bias",
        lambda x_, w_, b_, interpret=False: real_mb(x_, w_, b_, interpret=True),
    ):
        def loss(p):
            return jnp.sum(attn.apply({"params": p}, x) ** 2)

        val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    finite = jax.tree.map(lambda g: bool(np.isfinite(np.asarray(g)).all()), grads)
    assert all(jax.tree_util.tree_leaves(finite))


def test_chunked_backward_multiblock_padded():
    """_attention_bwd_chunked with several k-blocks and a ragged tail must
    equal the dense reference VJP (masking + padding path)."""
    from vidseg_diffusion_tpu.ops.attention import _attention_bwd_chunked

    rng = jax.random.PRNGKey(9)
    n, lq, lk, d = 3, 64, 300, 16  # lk % 128 != 0 -> padded tail block
    q = jax.random.normal(rng, (n, lq, d))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (n, lk, d))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (n, lk, d))
    g = jax.random.normal(jax.random.fold_in(rng, 3), (n, lq, d))
    scale = 1.0 / np.sqrt(d)

    def ref(q_, k_, v_):
        s = jnp.einsum("nqd,nkd->nqk", q_, k_) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("nqk,nkd->nqd", p, v_)

    out, vjp = jax.vjp(ref, q, k, v)
    want = vjp(g)
    got = _attention_bwd_chunked(q, k, v, out, g, scale, block_k=128)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
