"""On-TPU parity for the projection matmul + 3x3 conv Pallas kernels.

Run with: VIDSEG_TESTS_TPU=1 python -m pytest tests/tpu -q
(the main suite forces CPU via conftest; these skip off-TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.ops.conv3x3 import conv3x3_reference, conv3x3_same
from vidseg_diffusion_tpu.ops.matmul import matmul_bias

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU"
)


@pytest.mark.parametrize(
    "m,k,n",
    [
        (28 * 5824, 320, 320),   # spatial out-proj @ ds=1 (swan)
        (28 * 1456, 640, 640),   # ds=2
        (5824 * 28, 320, 960),   # fused qkv-style wide N
        (4096, 1280, 1280),      # mid-block
    ],
)
def test_matmul_bias_tpu(m, k, n):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (k, n), jnp.bfloat16) * 0.05
    b = jax.random.normal(jax.random.fold_in(rng, 2), (n,), jnp.bfloat16)
    got = matmul_bias(x, w, b)
    want = (
        x.astype(jnp.float32) @ w.astype(jnp.float32) + b.astype(jnp.float32)
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.125, rtol=0.03,  # bf16 resolution on the |x·w| ~ sqrt(K)·0.05 scale
    )


@pytest.mark.parametrize(
    "b,h,w_,cin,cout",
    [
        (28, 56, 104, 320, 320),  # swan ResBlock level 0
        (28, 28, 52, 640, 640),   # level 1
        (28, 14, 26, 1280, 1280), # level 2 (small spatial)
    ],
)
def test_conv3x3_tpu(b, h, w_, cin, cout):
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (b, h, w_, cin), jnp.bfloat16) * 0.3
    w = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, cin, cout),
                          jnp.bfloat16) * 0.02
    bias = jax.random.normal(jax.random.fold_in(rng, 2), (cout,), jnp.bfloat16)
    got = conv3x3_same(x, w, bias)
    want = conv3x3_reference(x, w, bias)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.25, rtol=0.05,  # both paths accumulate fp32, round bf16
    )
