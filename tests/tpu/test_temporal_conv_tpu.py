"""On-TPU parity for the fused temporal-conv kernel (compiled, not
interpret): the Mosaic lowering must match the per-tap jnp reference at
bf16-accumulation tolerance at real swan shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.ops.temporal_conv import (
    temporal_conv_1x1,
    temporal_conv_1x1_reference,
)

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU"
)


@pytest.mark.parametrize(
    "b,t,m,cin,cout",
    [
        (2, 14, 5824, 320, 320),   # swan time_stack level 0
        (2, 14, 1456, 640, 640),   # level 1
        (2, 14, 364, 1280, 1280),  # level 2
        (1, 1, 364, 512, 512),     # decoding_t=1 VAE temporal conv
        (2, 3, 91, 128, 256),      # ragged rows + channel change
    ],
)
def test_temporal_conv_matches_reference_tpu(b, t, m, cin, cout):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (b, t, m, cin), jnp.bfloat16)
    w = (jax.random.normal(ks[1], (3, cin, cout), jnp.bfloat16) * 0.05)
    bias = jax.random.normal(ks[2], (cout,), jnp.float32)
    y = np.asarray(temporal_conv_1x1(x, w, bias)).astype(np.float32)
    yr = np.asarray(
        temporal_conv_1x1_reference(
            x.astype(jnp.float32), w.astype(jnp.float32), bias
        )
    )
    scale = np.maximum(1.0, np.abs(yr))
    assert np.max(np.abs(y - yr) / scale) < 0.05  # bf16 taps vs fp32 ref
