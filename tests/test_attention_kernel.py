"""Pallas flash attention vs jnp reference parity (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.ops.attention import (
    dot_product_attention,
    flash_attention,
    mha_reference,
)


def _rand(rng, *shape):
    return jax.random.normal(rng, shape, dtype=jnp.float32)


class TestReferenceAttention:
    def test_softmax_rows_sum(self):
        rng = jax.random.PRNGKey(0)
        q = _rand(rng, 2, 4, 16, 8)
        out = mha_reference(q, q, q)
        assert out.shape == (2, 4, 16, 8)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_identity_value_recovery(self):
        # With a single key, attention must return v exactly.
        rng = jax.random.PRNGKey(1)
        q = _rand(rng, 1, 2, 8, 4)
        k = _rand(jax.random.PRNGKey(2), 1, 2, 1, 4)
        v = _rand(jax.random.PRNGKey(3), 1, 2, 1, 4)
        out = mha_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.broadcast_to(np.asarray(v), out.shape), rtol=1e-5
        )


@pytest.mark.parametrize(
    "b,h,lq,lk,d",
    [
        (1, 1, 256, 256, 64),   # aligned, multi k-block
        (1, 1, 160, 96, 64),    # unaligned seq (single k-block fast path)
        (1, 1, 128, 300, 64),   # multi k-block with padded tail block
    ],
)
def test_flash_matches_reference_interpret(b, h, lq, lk, d):
    """Run the Pallas kernel in interpreter mode (CPU) and compare."""
    rng = jax.random.PRNGKey(42)
    r1, r2, r3 = jax.random.split(rng, 3)
    q = _rand(r1, b, h, lq, d)
    k = _rand(r2, b, h, lk, d)
    v = _rand(r3, b, h, lk, d)

    expected = mha_reference(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=2e-5)


def test_dispatcher_small_seq_uses_reference():
    rng = jax.random.PRNGKey(0)
    q = _rand(rng, 2, 2, 14, 64)  # temporal attention shape
    out = dot_product_attention(q, q, q)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(mha_reference(q, q, q)), rtol=1e-6
    )


def test_flash_bf16_inputs_interpret():
    """bf16 q/k/v (the model path's dtype): dots run in bf16 with fp32
    accumulation inside the kernel; compare against the fp32 reference at
    bf16-appropriate tolerance."""
    rng = jax.random.PRNGKey(7)
    r1, r2, r3 = jax.random.split(rng, 3)
    q = _rand(r1, 2, 2, 256, 64).astype(jnp.bfloat16)
    k = _rand(r2, 2, 2, 300, 64).astype(jnp.bfloat16)
    v = _rand(r3, 2, 2, 300, 64).astype(jnp.bfloat16)

    expected = mha_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected), atol=2e-2, rtol=2e-2
    )


@pytest.mark.parametrize(
    "b,h,lq,lk,d",
    [
        (2, 5, 256, 256, 64),   # multi-head packed, multi k-block
        (2, 5, 160, 96, 64),    # unaligned seq, single k-block fast path
        (1, 3, 128, 300, 64),   # padded tail k-block
    ],
)
def test_flash_packed_matches_reference_interpret(b, h, lq, lk, d):
    """The packed all-heads kernel ([B, L, H*D] blocks, zero-relayout path)
    must match the head-major reference exactly."""
    from vidseg_diffusion_tpu.ops.attention import flash_attention_packed

    rng = jax.random.PRNGKey(7)
    r1, r2, r3 = jax.random.split(rng, 3)
    q = _rand(r1, b, h, lq, d)
    k = _rand(r2, b, h, lk, d)
    v = _rand(r3, b, h, lk, d)

    expected = mha_reference(q, k, v)  # [b, h, lq, d]
    pack = lambda t: t.transpose(0, 2, 1, 3).reshape(b, t.shape[2], h * d)
    got = flash_attention_packed(
        pack(q), pack(k), pack(v), heads=h,
        block_q=128, block_k=128, interpret=True,
    )
    got = got.reshape(b, lq, h, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=2e-5, rtol=2e-5
    )


def test_blhd_layout_matches_bhld():
    """mha_reference / dot_product_attention layout='blhd' equivalence."""
    from vidseg_diffusion_tpu.ops.attention import dot_product_attention

    rng = jax.random.PRNGKey(9)
    r1, r2, r3 = jax.random.split(rng, 3)
    b, h, l, d = 2, 4, 64, 32
    q = _rand(r1, b, h, l, d)
    k = _rand(r2, b, h, l, d)
    v = _rand(r3, b, h, l, d)
    expected = mha_reference(q, k, v)
    tr = lambda t: t.transpose(0, 2, 1, 3)
    got = dot_product_attention(tr(q), tr(k), tr(v), layout="blhd")
    np.testing.assert_allclose(
        np.asarray(tr(got)), np.asarray(expected), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize(
    "b,h,lq,lk,d,fold",
    [
        (64, 5, 14, 14, 64, 16),   # temporal self-attn (fold 16 -> 224 rows)
        (64, 5, 14, 14, 64, None), # auto fold
        (32, 2, 14, 77, 16, 4),    # tiny-seq cross-attn, lq != lk
        (30, 3, 7, 7, 32, 15),     # odd sizes, full-batch-divisor fold
    ],
)
def test_small_batched_matches_reference_interpret(b, h, lq, lk, d, fold):
    """The folded small-seq kernel (block-diagonal masked MXU tiles) must
    match the per-problem reference exactly: cross-problem logits are masked
    to -inf and underflow to 0 in the softmax, so P.V stays exact."""
    from vidseg_diffusion_tpu.ops.attention import small_batched_attention

    rng = jax.random.PRNGKey(11)
    r1, r2, r3 = jax.random.split(rng, 3)
    q = _rand(r1, b, lq, h, d)
    k = _rand(r2, b, lk, h, d)
    v = _rand(r3, b, lk, h, d)

    expected = mha_reference(q, k, v, layout="blhd")
    got = small_batched_attention(q, k, v, fold=fold, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=2e-5, rtol=2e-5
    )


def test_small_batched_bf16_interpret():
    from vidseg_diffusion_tpu.ops.attention import small_batched_attention

    rng = jax.random.PRNGKey(13)
    r1, r2, r3 = jax.random.split(rng, 3)
    q = _rand(r1, 28, 14, 5, 64).astype(jnp.bfloat16)
    k = _rand(r2, 28, 14, 5, 64).astype(jnp.bfloat16)
    v = _rand(r3, 28, 14, 5, 64).astype(jnp.bfloat16)
    expected = mha_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        layout="blhd",
    )
    got = small_batched_attention(q, k, v, fold=14, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected), atol=2e-2, rtol=2e-2
    )


def test_single_key_shortcut_returns_v():
    """lk == 1: softmax over one key is identically 1, so attention == V.
    The dispatcher shortcuts this algebraically (SVD cross-attention context
    is a single pooled CLIP token)."""
    rng = jax.random.PRNGKey(17)
    r1, r2, r3 = jax.random.split(rng, 3)
    q = _rand(r1, 4, 32, 2, 16)
    k = _rand(r2, 4, 1, 2, 16)
    v = _rand(r3, 4, 1, 2, 16)
    got = dot_product_attention(q, k, v, layout="blhd")
    np.testing.assert_allclose(
        np.asarray(got), np.broadcast_to(np.asarray(v), got.shape), rtol=1e-6
    )
    # and in bhld layout
    tr = lambda t: t.transpose(0, 2, 1, 3)
    got2 = dot_product_attention(tr(q), tr(k), tr(v), layout="bhld")
    np.testing.assert_allclose(
        np.asarray(got2), np.broadcast_to(np.asarray(tr(v)), got2.shape), rtol=1e-6
    )


def test_packed_flash_under_vmap():
    """flash_attention_packed must batch correctly under vmap (the
    modulated-runs dispatch vmaps the whole UNet over the runs axis)."""
    from vidseg_diffusion_tpu.ops.attention import (
        flash_attention_packed,
        mha_reference,
    )

    k = jax.random.PRNGKey(11)
    r, b, l, h, d = 2, 1, 640, 2, 32
    q = jax.random.normal(k, (r, b, l, h * d), jnp.float32) * 0.1
    kk = jax.random.normal(jax.random.fold_in(k, 1), (r, b, l, h * d)) * 0.1
    v = jax.random.normal(jax.random.fold_in(k, 2), (r, b, l, h * d)) * 0.1
    got = jax.vmap(
        lambda a, bq, c: flash_attention_packed(a, bq, c, heads=h, interpret=True)
    )(q, kk, v)
    ref = jax.vmap(
        lambda a, bq, c: mha_reference(
            a.reshape(b, l, h, d), bq.reshape(b, l, h, d),
            c.reshape(b, l, h, d), layout="blhd",
        ).reshape(b, l, h * d)
    )(q, kk, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)
