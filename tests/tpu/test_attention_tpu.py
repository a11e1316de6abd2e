"""On-TPU flash-attention parity + perf checks.

Run with: VIDSEG_TESTS_TPU=1 python -m pytest tests/tpu -q
(the main suite forces CPU via conftest; that flag makes it leave the
platform alone, and these tests skip on non-TPU backends)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.ops.attention import flash_attention, mha_reference

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU"
)


@pytest.mark.parametrize(
    "b,h,lq,lk,d",
    [
        (2, 10, 1456, 1456, 64),  # swan spatial self-attn @ ds=2
        (28, 5, 1456, 1456, 64),  # full CFG video batch, one head-group
        (1, 1, 300, 300, 64),     # unaligned
        (1, 2, 640, 80, 64),      # short kv
        (1, 1, 256, 256, 40),     # unaligned head dim
    ],
)
def test_flash_matches_reference_tpu(b, h, lq, lk, d):
    rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    q = jax.random.normal(r1, (b, h, lq, d), dtype=jnp.float32)
    k = jax.random.normal(r2, (b, h, lk, d), dtype=jnp.float32)
    v = jax.random.normal(r3, (b, h, lk, d), dtype=jnp.float32)
    expected = mha_reference(q, k, v)
    got = flash_attention(q, k, v)
    # fp32 matmuls on the MXU default to bf16 passes; both paths round, so
    # parity is at bf16 resolution
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=4e-3, rtol=4e-3)


def test_flash_bf16():
    rng = jax.random.PRNGKey(1)
    q = jax.random.normal(rng, (2, 4, 512, 64), dtype=jnp.bfloat16)
    expected = mha_reference(q, q, q)
    got = flash_attention(q, q, q)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32),
        np.asarray(expected, dtype=np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_flash_wide_head_vmem_autoshrink():
    """VAE mid-attention shape: single 512-dim head over ~6k tokens — the
    default blocks exceed VMEM and must auto-shrink (regression for a TPU
    worker fault during swan-scale decode)."""
    rng = jax.random.PRNGKey(2)
    q = jax.random.normal(rng, (1, 1, 5824, 512), dtype=jnp.bfloat16)
    out = flash_attention(q, q, q)
    assert out.shape == (1, 1, 5824, 512)
    assert bool(jnp.all(jnp.isfinite(out)))
