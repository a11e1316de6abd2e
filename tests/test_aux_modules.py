"""Aux subsystems: EMA/schedulers, regularizers, safety, data, profiling,
inference API construction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.utils.ema import EmaState, ema_init, ema_update, lambda_warmup_cosine
from vidseg_diffusion_tpu.models.regularizers import (
    DiagonalGaussian,
    diagonal_gaussian_regularizer,
    vector_quantize,
)
from vidseg_diffusion_tpu.utils.safety import SafetyFilter, embed_watermark
from vidseg_diffusion_tpu.io.data import (
    batch_iterator,
    prefetch_to_device,
    synthetic_image_dataset,
)
from vidseg_diffusion_tpu.utils.profiling import StepTimer


class TestEma:
    def test_converges_to_params(self):
        p = {"w": jnp.zeros((4,))}
        s = ema_init(p)
        target = {"w": jnp.ones((4,))}
        for _ in range(200):
            s = ema_update(s, target, decay=0.9)
        np.testing.assert_allclose(np.asarray(s.params["w"]), 1.0, atol=1e-4)

    def test_warmup_ramp(self):
        s = ema_init({"w": jnp.zeros(())})
        # effective decay starts at (1+1)/(10+1) ≈ 0.18 — fast early updates
        s = ema_update(s, {"w": jnp.ones(())}, decay=0.9999)
        assert float(s.params["w"]) > 0.5

    def test_lr_schedule(self):
        sched = lambda_warmup_cosine(10, 0.1, 1.0, 0.0, 100)
        assert float(sched(0)) == pytest.approx(0.0)
        assert float(sched(10)) == pytest.approx(1.0, abs=1e-3)
        assert float(sched(100)) == pytest.approx(0.1, abs=1e-3)


class TestRegularizers:
    def test_gaussian_kl_zero_for_standard_normal(self):
        moments = jnp.zeros((2, 4, 4, 8))  # mean 0, logvar 0 → N(0, I)
        g = DiagonalGaussian.from_moments(moments)
        np.testing.assert_allclose(np.asarray(g.kl()), 0.0, atol=1e-6)

    def test_regularizer_mode_vs_sample(self):
        moments = jnp.concatenate(
            [jnp.ones((1, 2, 2, 4)), jnp.full((1, 2, 2, 4), -5.0)], -1
        )
        z_mode, log = diagonal_gaussian_regularizer(moments, sample=False)
        np.testing.assert_allclose(np.asarray(z_mode), 1.0)
        assert log["kl_loss"] > 0
        z_s, _ = diagonal_gaussian_regularizer(moments, rng=jax.random.PRNGKey(0))
        assert not np.allclose(np.asarray(z_s), 1.0)

    def test_vq_picks_nearest_and_straight_through(self):
        codebook = jnp.array([[0.0, 0.0], [1.0, 1.0]])
        z = jnp.array([[[0.1, -0.1], [0.9, 1.2]]])
        zq, idx, log = vector_quantize(z, codebook)
        np.testing.assert_array_equal(np.asarray(idx), [[0, 1]])
        # straight-through: grad wrt z is identity
        g = jax.grad(lambda z: jnp.sum(vector_quantize(z, codebook)[0]))(z)
        np.testing.assert_allclose(np.asarray(g), 1.0)


class TestSafety:
    def test_noop_without_heads(self):
        f = SafetyFilter()
        frames = jnp.ones((2, 8, 8, 3))
        np.testing.assert_array_equal(np.asarray(f(frames)), np.asarray(frames))

    def test_filter_blurs_flagged(self):
        d = 4

        def fake_clip(frames):
            return jnp.stack([jnp.full((d,), 10.0), jnp.full((d,), -10.0)])

        head = (np.ones((1, d), np.float32), np.zeros(1, np.float32))
        f = SafetyFilter(clip_image_fn=fake_clip, p_head=head)
        rng = np.random.RandomState(0)
        frames = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
        out = np.asarray(f(frames))
        # flagged frame blurred (textured content smoothed), other untouched
        assert np.abs(out[0] - np.asarray(frames)[0]).max() > 1e-3
        np.testing.assert_array_equal(out[1], np.asarray(frames)[1])

    def test_watermark_identity_at_zero(self):
        frames = jnp.ones((1, 8, 8, 3))
        np.testing.assert_array_equal(
            np.asarray(embed_watermark(frames)), np.asarray(frames)
        )


class TestData:
    def test_synthetic_and_batches(self):
        x, y = synthetic_image_dataset(20, (8, 8, 3), 4)
        it = batch_iterator(x, y, 5)
        bx, by = next(it)
        assert bx.shape == (5, 8, 8, 3) and by.shape == (5,)

    def test_prefetch_preserves_order(self):
        items = [np.full((2,), i, np.float32) for i in range(6)]
        out = list(prefetch_to_device(iter(items), size=2))
        assert len(out) == 6
        for i, o in enumerate(out):
            np.testing.assert_allclose(np.asarray(o), i)


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer()
        out = t.measure("op", lambda: jnp.ones((8,)) * 2)
        s = t.summary()
        assert s["op"]["count"] == 1 and s["op"]["mean_s"] > 0


class TestInferenceAPI:
    def test_enum_construction(self):
        from vidseg_diffusion_tpu.inference.api import (
            Sampler, SamplingParams, SamplingPipeline,
        )

        p = SamplingParams(sampler=Sampler.DPMPP2M, steps=10)
        assert p.sampler == Sampler.DPMPP2M


def test_discrete_sigma_sampling():
    """DiscreteSigmaSampling: uniform index into the sigma table
    (sigma_sampling.py:15-31)."""
    from vidseg_diffusion_tpu.diffusion.loss import DiscreteSigmaSampling

    sigmas = jnp.asarray([0.1, 1.0, 10.0, 100.0])
    s = DiscreteSigmaSampling(sigmas=sigmas)
    out = np.asarray(s(jax.random.PRNGKey(0), 256))
    assert out.shape == (256,)
    assert set(np.unique(out)).issubset(set(np.asarray(sigmas)))
    # every table entry should appear in 256 uniform draws over 4 values
    assert len(np.unique(out)) == 4


def test_aggregate_blocks():
    from vidseg_diffusion_tpu.engine.masks import aggregate_blocks

    a = jnp.ones((2, 4, 8))
    b = 3.0 * jnp.ones((2, 4, 8))
    np.testing.assert_allclose(np.asarray(aggregate_blocks([a, b])), 2.0)


def test_camvid_color_map():
    from vidseg_diffusion_tpu.engine.segmentation import camvid_color_map

    table = camvid_color_map()
    assert table.shape[1] == 3 and table.dtype == np.uint8
    assert table.shape[0] >= 31  # the vendored reference table
    np.testing.assert_array_equal(table[0], [64, 128, 64])


def test_video_folder_dataset(tmp_path):
    from PIL import Image

    from vidseg_diffusion_tpu.io.data import VideoFolderDataset

    for vid in ("vidB", "vidA"):
        d = tmp_path / vid / "origin"
        d.mkdir(parents=True)
        for i in range(3):
            # large enough for load_frames' 64-multiple resize rule
            Image.fromarray(
                np.full((64, 64, 3), i * 10, np.uint8)
            ).save(d / f"{i}.png")
    ds = VideoFolderDataset(str(tmp_path))
    assert len(ds) == 2
    items = list(ds)
    # sorted video order; frames in [-1, 1]; numeric frame order
    assert [it[2] for it in items] == ["vidA", "vidB"]
    frames, names, _, ori_hw = items[0]
    assert frames.shape == (3, 64, 64, 3)
    assert float(frames.min()) >= -1.0 and float(frames.max()) <= 1.0
    assert list(names) == ["0", "1", "2"]
