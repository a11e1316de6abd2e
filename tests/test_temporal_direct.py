"""Direct-layout temporal attention (VIDSEG_TEMPORAL_LAYOUT=direct).

Parity of ops/attention.temporal_attention_direct (Pallas kernel in
interpret mode on CPU) and of the VideoTransformerBlock /
SpatialVideoTransformer direct-mode wiring against the folded reference
layout (video_attention.py:152 rearrange semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.ops.attention import (
    _best_s_tile,
    _temporal_from_canonical,
    _temporal_to_canonical,
    mha_reference,
    temporal_attention_direct,
)


def _canonical_reference(q, k, v, t):
    """Folded-layout ground truth: rearrange to [(b s), t, h, d] and run the
    jnp reference attention."""
    b = q.shape[0] // t
    out = mha_reference(
        _temporal_to_canonical(q, t),
        _temporal_to_canonical(k, t),
        _temporal_to_canonical(v, t),
        layout="blhd",
    )
    return _temporal_from_canonical(out, t, b)


def _rand(rs, shape, dtype):
    return jnp.asarray(rs.standard_normal(shape), dtype)


class TestBestSTile:
    def test_swan_shapes(self):
        hd = 1280
        # ds1/ds2 levels tile; ds4/ds8 (s not a multiple of 16) fall back
        assert _best_s_tile(5824, 14, hd) == 32
        assert _best_s_tile(1456, 14, hd) == 16
        assert _best_s_tile(364, 14, hd) is None
        assert _best_s_tile(91, 14, hd) is None

    def test_divides_and_aligned(self):
        st = _best_s_tile(64, 5, 256)
        assert st is not None and 64 % st == 0 and st % 16 == 0


class TestKernelParity:
    @pytest.mark.parametrize(
        "b,t,s,h,d",
        [(2, 5, 32, 2, 16), (1, 14, 64, 3, 8), (2, 3, 48, 1, 32)],
    )
    def test_matches_canonical_f32(self, b, t, s, h, d):
        rs = np.random.RandomState(b * 100 + t)
        q = _rand(rs, (b * t, s, h, d), jnp.float32)
        k = _rand(rs, (b * t, s, h, d), jnp.float32)
        v = _rand(rs, (b * t, s, h, d), jnp.float32)
        got = temporal_attention_direct(q, k, v, t=t, force=True, interpret=True)
        want = _canonical_reference(q, k, v, t)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )

    def test_matches_canonical_bf16(self):
        rs = np.random.RandomState(7)
        b, t, s, h, d = 2, 4, 32, 2, 16
        q = _rand(rs, (b * t, s, h, d), jnp.bfloat16)
        k = _rand(rs, (b * t, s, h, d), jnp.bfloat16)
        v = _rand(rs, (b * t, s, h, d), jnp.bfloat16)
        got = temporal_attention_direct(q, k, v, t=t, force=True, interpret=True)
        want = _canonical_reference(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), t
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=3e-2, rtol=3e-2
        )

    def test_fallback_path_unaligned_s(self):
        # s=21 has no 16-aligned divisor -> canonical fallback, exact math
        rs = np.random.RandomState(3)
        b, t, s, h, d = 2, 4, 21, 2, 8
        q = _rand(rs, (b * t, s, h, d), jnp.float32)
        k = _rand(rs, (b * t, s, h, d), jnp.float32)
        v = _rand(rs, (b * t, s, h, d), jnp.float32)
        got = temporal_attention_direct(q, k, v, t=t)
        want = _canonical_reference(q, k, v, t)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )

    def test_force_raises_on_untileable(self):
        q = jnp.zeros((4, 21, 2, 8), jnp.float32)
        with pytest.raises(ValueError):
            temporal_attention_direct(q, q, q, t=2, force=True, interpret=True)

    def test_grad_matches_canonical(self):
        rs = np.random.RandomState(11)
        b, t, s, h, d = 1, 4, 32, 2, 8
        q = _rand(rs, (b * t, s, h, d), jnp.float32)
        k = _rand(rs, (b * t, s, h, d), jnp.float32)
        v = _rand(rs, (b * t, s, h, d), jnp.float32)
        w = _rand(rs, (b * t, s, h, d), jnp.float32)

        def loss_direct(q, k, v):
            out = temporal_attention_direct(
                q, k, v, t=t, force=True, interpret=True
            )
            return jnp.sum(out * w)

        def loss_ref(q, k, v):
            return jnp.sum(_canonical_reference(q, k, v, t) * w)

        got = jax.grad(loss_direct, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for g, wnt in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(wnt), atol=5e-5, rtol=5e-4
            )


def _apply_video_block(mode, monkeypatch, variables, m, x, ctx, t,
                       modulation=None, injection=None, harvest=False):
    monkeypatch.setenv("VIDSEG_TEMPORAL_LAYOUT", mode)
    kwargs = dict(context=ctx, timesteps=t, modulation=modulation,
                  injection=injection)
    if harvest:
        out, inter = m.apply(
            variables, x, mutable=["intermediates"], **kwargs
        )
        return out, inter["intermediates"]
    return m.apply(variables, x, **kwargs)


class TestVideoBlockDirectMode:
    def _setup(self, monkeypatch):
        from vidseg_diffusion_tpu.models.video_layers import (
            VideoTransformerBlock,
        )

        b, t, s, c = 2, 3, 32, 16  # b=2 = CFG-doubled [uc; c] single video
        m = VideoTransformerBlock(heads=2, dim_head=8)
        x = jnp.asarray(
            np.random.RandomState(0).standard_normal((b * t, s, c)), jnp.float32
        )
        ctx = jnp.asarray(
            np.random.RandomState(1).standard_normal((b * s, 1, c)), jnp.float32
        )
        # init under the folded layout (ctx above is folded-shaped); params
        # are layout-independent, only apply-time shapes differ per mode
        monkeypatch.setenv("VIDSEG_TEMPORAL_LAYOUT", "folded")
        variables = m.init(jax.random.PRNGKey(0), x, context=ctx, timesteps=t)
        return m, variables, x, ctx, b, t, s, c

    def test_plain_forward_equal(self, monkeypatch):
        m, variables, x, ctx, b, t, s, c = self._setup(monkeypatch)
        # the direct mode repeats first-frame context per frame at the
        # SpatialVideoTransformer level; at block level pass the matching
        # per-layout context rows built from one [b, 1, c] source
        first = np.random.RandomState(2).standard_normal((b, 1, c)).astype("f")
        ctx_folded = jnp.repeat(jnp.asarray(first), s, axis=0)
        ctx_direct = jnp.repeat(jnp.asarray(first), t, axis=0)
        y_f = _apply_video_block("folded", monkeypatch, variables, m, x,
                                 ctx_folded, t)
        y_d = _apply_video_block("direct", monkeypatch, variables, m, x,
                                 ctx_direct, t)
        np.testing.assert_allclose(
            np.asarray(y_f), np.asarray(y_d), atol=1e-5, rtol=1e-5
        )

    def test_modulated_forward_equal(self, monkeypatch):
        from vidseg_diffusion_tpu.models.layers import (
            BlockModulation, Modulation,
        )

        m, variables, x, ctx, b, t, s, c = self._setup(monkeypatch)
        rs = np.random.RandomState(5)
        mod = BlockModulation(
            self_attn=Modulation(
                masks=jnp.asarray(rs.rand(t, s) > 0.5, jnp.float32),
                lam=jnp.asarray(rs.rand(t), jnp.float32),
                frame_gate=jnp.ones((t,), bool),
                enabled=jnp.asarray(True),
            ),
            ff_out=Modulation(
                masks=jnp.asarray(rs.rand(t, s) > 0.5, jnp.float32),
                lam=jnp.asarray(-rs.rand(t), jnp.float32),
                frame_gate=jnp.asarray([True, False, True]),
                enabled=jnp.asarray(True),
            ),
        )
        first = rs.standard_normal((b, 1, c)).astype("f")
        y_f = _apply_video_block(
            "folded", monkeypatch, variables, m, x,
            jnp.repeat(jnp.asarray(first), s, axis=0), t, modulation=mod)
        y_d = _apply_video_block(
            "direct", monkeypatch, variables, m, x,
            jnp.repeat(jnp.asarray(first), t, axis=0), t, modulation=mod)
        np.testing.assert_allclose(
            np.asarray(y_f), np.asarray(y_d), atol=1e-5, rtol=1e-5
        )

    def test_harvest_then_inject_round_trip(self, monkeypatch):
        """Each mode sows temporal q/k in its own layout; injecting those
        harvested tensors back (gate on) must reproduce the plain forward in
        that mode, and the two modes must agree with each other."""
        from vidseg_diffusion_tpu.models.layers import (
            AttnInjection, BlockInjection,
        )

        m, variables, x, ctx, b, t, s, c = self._setup(monkeypatch)
        first = np.random.RandomState(2).standard_normal((b, 1, c)).astype("f")
        outs = {}
        for mode, reps in (("folded", (s, 0)), ("direct", (t, 0))):
            ctx_m = jnp.repeat(jnp.asarray(first), reps[0], axis=0)
            y, inter = _apply_video_block(
                mode, monkeypatch, variables, m, x, ctx_m, t, harvest=True)
            q = inter["attn1"]["q"][0]
            k = inter["attn1"]["k"][0]
            if mode == "folded":
                assert q.shape == (b * s, t, c)
            else:
                assert q.shape == (b * t, s, c)
            inj = BlockInjection(
                attn1=AttnInjection(gate=jnp.asarray(True), q=q, k=k)
            )
            y_inj = _apply_video_block(
                mode, monkeypatch, variables, m, x, ctx_m, t, injection=inj)
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(y_inj), atol=1e-5, rtol=1e-5
            )
            outs[mode] = np.asarray(y)
        np.testing.assert_allclose(
            outs["folded"], outs["direct"], atol=1e-5, rtol=1e-5
        )


class TestSpatialVideoTransformerDirectMode:
    def test_full_module_equal(self, monkeypatch):
        from vidseg_diffusion_tpu.models.video_layers import (
            SpatialVideoTransformer,
        )

        m = SpatialVideoTransformer(heads=2, dim_head=8, depth=1)
        t, hh, ww, c = 3, 4, 8, 16  # s = 32 tokens
        b = 2 * t
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.standard_normal((b, hh, ww, c)), jnp.float32)
        ctx = jnp.asarray(rs.standard_normal((b, 1, c)), jnp.float32)
        ioi = jnp.zeros((2, t))
        monkeypatch.setenv("VIDSEG_TEMPORAL_LAYOUT", "folded")
        variables = m.init(
            jax.random.PRNGKey(0), x, context=ctx, timesteps=t,
            image_only_indicator=ioi,
        )
        y_f = m.apply(variables, x, context=ctx, timesteps=t,
                      image_only_indicator=ioi)
        monkeypatch.setenv("VIDSEG_TEMPORAL_LAYOUT", "direct")
        y_d = m.apply(variables, x, context=ctx, timesteps=t,
                      image_only_indicator=ioi)
        np.testing.assert_allclose(
            np.asarray(y_f), np.asarray(y_d), atol=1e-5, rtol=1e-5
        )
