"""Engine components: segmentation assembly, mask modes, conditioner,
modulation schedules, loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.engine.segmentation import (
    compute_difference,
    filter_difference,
    segmentation_argmax,
    soft_color_map,
)
from vidseg_diffusion_tpu.engine.masks import (
    GTMatchState,
    correct_low_res_mask,
    kmeans_masks,
    match_gt_mask,
)
from vidseg_diffusion_tpu.engine.modulation import (
    ModulationConfig,
    modulate_lambda_schedule,
    modulate_timestep_frames_table,
)
from vidseg_diffusion_tpu.models.conditioner import (
    Conditioner,
    EmbedderSpec,
    build_svd_conditioner,
    concat_timestep_embedder,
)


class TestDifferenceMaps:
    def test_uint8_wrap_semantics(self):
        # literal numpy replication of the reference's uint8 math
        rng = np.random.RandomState(0)
        a = rng.randint(0, 256, (1, 12, 12, 3)).astype(np.uint8)
        b = rng.randint(0, 256, (1, 12, 12, 3)).astype(np.uint8)
        with np.errstate(over="ignore"):
            ref = np.sqrt(np.sum(((a - b) ** 2).astype(np.float64), axis=-1))
        import cv2

        ref = cv2.GaussianBlur(ref[0], (5, 5), 3)
        ref = np.clip(ref, 0, 255).astype(np.uint8)
        got = np.asarray(
            compute_difference(jnp.asarray(a), jnp.asarray(b), mode="uint8_wrap")
        )[0]
        # allow ±1 quantization differences from blur rounding
        assert np.abs(got - ref.astype(np.float32)).max() <= 1.0

    def test_float_mode_monotone(self):
        a = jnp.full((1, 8, 8, 3), 10.0)
        b = jnp.full((1, 8, 8, 3), 40.0)
        d = compute_difference(a, b, mode="float")
        np.testing.assert_allclose(np.asarray(d), np.sqrt(3 * 30.0**2), atol=1.0)

    def test_filter_downweights_outside(self):
        diff = jnp.ones((1, 1, 8, 8))
        masks = jnp.zeros((1, 1, 8, 8)).at[:, :, :4].set(1.0)
        out = np.asarray(filter_difference(diff, masks, 0.5))
        assert out[0, 0, 0, 0] == pytest.approx(1.0, abs=0.05)
        assert out[0, 0, 7, 0] == pytest.approx(0.5, abs=0.05)

    def test_argmax_with_labels(self):
        diff = jnp.stack(
            [jnp.ones((2, 4, 4)) * 0.2, jnp.ones((2, 4, 4)) * 0.9]
        )  # mask 1 wins
        labels = jnp.asarray(np.array([7, 42]))
        seg = np.asarray(segmentation_argmax(diff, labels=labels))
        assert (seg == 42).all()

    def test_color_map(self):
        cm = soft_color_map(119)
        assert cm.shape == (119, 3) and cm.dtype == np.uint8
        # first entries are the reference's vendored table
        # (scripts/util/color_map_soft.txt:1-3)
        np.testing.assert_array_equal(cm[0], [230, 25, 75])
        np.testing.assert_array_equal(cm[1], [60, 180, 75])
        np.testing.assert_array_equal(cm[2], [255, 225, 25])
        # extension beyond 119 keeps the vendored prefix intact
        ext = soft_color_map(128)
        np.testing.assert_array_equal(ext[:119], cm)


class TestMaskModes:
    def _features(self, t=3, l=64, c=8, k=3, seed=0):
        # synthetic: tokens drawn from k well-separated clusters, same
        # cluster layout in every frame; uc half is noise
        rng = np.random.RandomState(seed)
        centers = rng.randn(k, c) * 5
        assign = rng.randint(0, k, l)
        cond = centers[assign][None] + 0.1 * rng.randn(t, l, c)
        uc = rng.randn(t, l, c)
        return jnp.asarray(np.concatenate([uc, cond]), jnp.float32), assign

    def test_kmeans_masks(self):
        t, l, k = 3, 64, 3
        feats, assign = self._features(t, l, 8, k)
        masks, labels = kmeans_masks(jax.random.PRNGKey(0), feats, k, t)
        assert masks.shape == (k, t, l)
        m = np.asarray(masks)
        # each frame identical clustering; masks partition tokens
        np.testing.assert_allclose(m.sum(axis=0), 1.0)
        # cluster structure recovered (label-agnostic)
        got = m.argmax(axis=0)[0]
        for cl in range(k):
            vals, counts = np.unique(got[assign == cl], return_counts=True)
            assert counts.max() / counts.sum() > 0.95

    def test_match_gt_mask_first_batch_and_carry(self):
        t, l, k = 3, 64, 3
        feats, assign = self._features(t, l, 8, k)
        gt = np.array([10, 20, 30])[assign]  # original VSPW-style ids
        masks, state = match_gt_mask(
            jax.random.PRNGKey(0), feats, num_masks=k, num_frames=t, gt_mask=gt
        )
        assert sorted(state.unique_labels.tolist()) == [10, 20, 30]
        assert masks.shape == (k, t, l)
        got = np.asarray(masks).argmax(axis=0)[0]
        dense_gt = np.searchsorted(state.unique_labels, gt)
        assert (got == dense_gt).mean() > 0.95
        # carried state propagates to a second batch
        feats2, _ = self._features(t, l, 8, k, seed=1)
        # reuse the same cluster geometry so labels stay meaningful
        masks2, state2 = match_gt_mask(
            jax.random.PRNGKey(1), feats, num_masks=k, num_frames=t, state=state
        )
        assert masks2.shape == (k, t, l)
        assert state2.ref_features.shape == (t * l, 8)

    def test_correct_low_res_mask_runs(self):
        t, l, k = 3, 64, 3
        feats, assign = self._features(t, l, 8, k)
        masks, _ = kmeans_masks(jax.random.PRNGKey(0), feats, k, t)
        refined = correct_low_res_mask(feats, masks, t, width=8)
        assert refined.shape == (k, t, l)
        np.testing.assert_allclose(np.asarray(refined).sum(axis=0), 1.0)


class TestModulationSchedules:
    def test_lambda_linear(self):
        lam = np.asarray(modulate_lambda_schedule(10.0, 20.0, "linear", 5))
        np.testing.assert_allclose(lam, 10.0 + 10.0 * np.arange(5) / 5.0)

    def test_timestep_frames_constant(self):
        tab = modulate_timestep_frames_table(25, 4, (17,), "constant")
        assert tab[17].all() and not tab[16].any() and not tab[18].any()

    def test_timestep_frames_linear(self):
        tab = modulate_timestep_frames_table(
            25, 14, (17,), "linear", start_timestep=20, end_timestep=15
        )
        # frame 0 at step 20, last frame at step 15 (sgm/util.py:316-326)
        assert tab[20, 0] and tab[15, 13]
        assert tab.sum() == 14  # each frame exactly once

    def test_block_resolution_divisors(self):
        cfg = ModulationConfig()
        assert cfg.block_resolution_divisor(8) == 2
        assert cfg.block_resolution_divisor(11) == 1
        assert cfg.block_resolution_divisor(0) == 8


class TestConditioner:
    def test_concat_timestep_embedder_shape(self):
        out = concat_timestep_embedder(jnp.array([3.0, 5.0]), 256)
        assert out.shape == (2, 256)
        out2 = concat_timestep_embedder(jnp.ones((2, 3)), 256)
        assert out2.shape == (2, 768)

    def test_svd_conditioner_routing(self):
        t = 2

        def fake_clip(frames):
            return jnp.ones((frames.shape[0], 1024))

        def fake_vae(frames):
            return jnp.ones((frames.shape[0], 4, 4, 4))

        cond = build_svd_conditioner(fake_clip, fake_vae)
        batch = {
            "cond_frames_without_noise": jnp.zeros((1, 8, 8, 3)),
            "cond_frames": jnp.zeros((1, 8, 8, 3)),
            "fps_id": jnp.array([6.0]),
            "motion_bucket_id": jnp.array([127.0]),
            "cond_aug": jnp.array([0.02]),
        }
        c, uc = cond.get_unconditional_conditioning(
            batch,
            force_uc_zero_embeddings=["cond_frames", "cond_frames_without_noise"],
        )
        assert c["crossattn"].shape == (1, 1, 1024)
        assert c["vector"].shape == (1, 768)
        assert c["concat"].shape == (1, 4, 4, 4)
        np.testing.assert_allclose(np.asarray(uc["crossattn"]), 0.0)
        np.testing.assert_allclose(np.asarray(uc["concat"]), 0.0)
        # vector (fps/motion/aug) identical in c and uc
        np.testing.assert_allclose(np.asarray(uc["vector"]), np.asarray(c["vector"]))


class TestFirstStageChunking:
    def _fs(self):
        from vidseg_diffusion_tpu.engine.diffusion_engine import FirstStage
        from vidseg_diffusion_tpu.models import vae as fvae

        enc = fvae.Encoder(fvae.VAEConfig(ch=8, out_ch=3, in_channels=3,
                                          z_channels=2, ch_mult=(1,),
                                          num_res_blocks=1))
        dec = fvae.Decoder(fvae.VAEConfig(ch=8, out_ch=3, in_channels=3,
                                          z_channels=2, ch_mult=(1,),
                                          num_res_blocks=1))
        x = jnp.ones((1, 8, 8, 3))
        ep = enc.init(jax.random.PRNGKey(0), x)["params"]
        dp = dec.init(jax.random.PRNGKey(1), jnp.ones((1, 8, 8, 2)))["params"]
        return FirstStage(enc, dec, ep, dp, scale_factor=0.5)

    @pytest.mark.slow  # ~22 s: compiles a unique ragged-tail decode shape
    def test_ragged_chunk_matches_unchunked(self):
        """5 frames with chunk=2: the ragged tail runs at natural length
        like the reference's ceil loop (an assert used to crash any frame
        count not divisible by decoding_t)."""
        fs = self._fs()
        x = jax.random.normal(jax.random.PRNGKey(2), (5, 8, 8, 3))
        z_full = fs.encode(x)                 # mode path: deterministic
        z_chunk = fs.encode(x, chunk=2)
        np.testing.assert_allclose(
            np.asarray(z_chunk), np.asarray(z_full), atol=1e-5
        )
        dec_full = fs.decode(z_full)
        dec_chunk = fs.decode(z_full, chunk=2)
        np.testing.assert_allclose(
            np.asarray(dec_chunk), np.asarray(dec_full), atol=1e-5
        )

    def test_chunked_encode_noise_differs_per_chunk(self):
        """With a sampling rng, each chunk must fold its own key — a key
        closed over the chunk map drew IDENTICAL noise per chunk."""
        fs = self._fs()
        x = jnp.zeros((4, 8, 8, 3))  # identical frames -> identical moments
        z = fs.encode(x, rng=jax.random.PRNGKey(3), chunk=2)
        z = np.asarray(z)
        # all frames share moments; noise must differ ACROSS chunks
        assert not np.allclose(z[0], z[2])
