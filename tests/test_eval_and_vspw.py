"""Eval metrics, VSPW batching, config loader, tokenizer."""

import numpy as np
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.eval.metrics import (
    SegmentationEvaluator,
    mean_iou,
    video_consistency,
)
from vidseg_diffusion_tpu.pipelines.vspw import sliding_batches
from vidseg_diffusion_tpu.io.tokenizer import tokenize, tokenize_empty, SOT, EOT


class TestMeanIoU:
    def test_perfect_prediction(self):
        gt = np.random.RandomState(0).randint(0, 5, (2, 8, 8))
        assert mean_iou(jnp.asarray(gt), jnp.asarray(gt), 5) == pytest.approx(1.0)

    def test_half_overlap(self):
        gt = np.zeros((1, 4, 4), np.int32)
        pred = np.zeros((1, 4, 4), np.int32)
        pred[:, :, 2:] = 1  # half the pixels wrongly class 1
        # class 0: inter 8, union 16 → 0.5; class 1 absent from GT → skipped
        assert mean_iou(jnp.asarray(pred), jnp.asarray(gt), 2) == pytest.approx(0.5)

    def test_ignore_label(self):
        gt = np.zeros((1, 2, 2), np.int32)
        gt[0, 0, 0] = 255
        pred = np.zeros((1, 2, 2), np.int32)
        pred[0, 0, 0] = 1  # wrong but ignored
        assert mean_iou(jnp.asarray(pred), jnp.asarray(gt), 2) == pytest.approx(1.0)


class TestVC:
    def test_perfect(self):
        gt = np.zeros((10, 4, 4), np.int32)
        assert video_consistency(jnp.asarray(gt), jnp.asarray(gt), 8) == pytest.approx(1.0)

    def test_too_short(self):
        gt = np.zeros((4, 4, 4), np.int32)
        assert video_consistency(jnp.asarray(gt), jnp.asarray(gt), 8) is None

    def test_partial(self):
        t = 8
        gt = np.zeros((t, 2, 2), np.int32)
        pred = gt.copy()
        pred[::2, 0, 0] = 1  # one pixel churns across frames
        vc = video_consistency(jnp.asarray(pred), jnp.asarray(gt), 8)
        assert vc == pytest.approx(3 / 4)

    def test_consistently_wrong_still_consistent(self):
        # VC measures temporal stability, not accuracy: a pixel that is the
        # SAME wrong label in every frame counts (VSPW get_common semantics)
        gt = np.zeros((8, 2, 2), np.int32)
        pred = gt.copy()
        pred[:, 0, 0] = 1
        assert video_consistency(
            jnp.asarray(pred), jnp.asarray(gt), 8
        ) == pytest.approx(1.0)

    def test_evaluator_accumulates(self):
        ev = SegmentationEvaluator(num_classes=3)
        gt = np.random.RandomState(1).randint(0, 3, (9, 6, 6))
        gt[:, :3, :] = 2  # static region so windows have GT-consistent pixels
        ev.add_video(gt, gt)
        res = ev.results()
        assert res["mIoU"] == pytest.approx(1.0)
        assert res["mVC_8"] == pytest.approx(1.0)
        assert "mVC_16" not in res  # video too short


def _oracle_vc(pred: np.ndarray, gt: np.ndarray, clip_num: int):
    """Literal-loop transcription of the VSPW paper's VC formula (official
    VSPW_code `get_common` semantics): per window, the fraction of
    GT-consistent pixels whose PREDICTION is also consistent across the
    window. Windows with no GT-consistent pixel are NaN (0/0) and dropped
    from the mean. Independent oracle: plain python loops, no jax."""
    t, h, w = gt.shape
    accs = []
    for i in range(t - clip_num + 1):
        global_common = np.ones((h, w), bool)
        predglobal_common = np.ones((h, w), bool)
        for j in range(1, clip_num):
            global_common &= gt[i] == gt[i + j]
            predglobal_common &= pred[i] == pred[i + j]
        den = global_common.sum()
        if den == 0:
            continue
        accs.append((predglobal_common & global_common).sum() / den)
    return float(np.mean(accs)) if accs else None


class TestVCOracle:
    """eval/metrics.video_consistency vs the independently-ported VSPW
    oracle — the parity metric of record (BASELINE.md) must not rest on
    hand-rolled expectations (VERDICT r2 weak #4)."""

    def test_fuzz_label_churn(self):
        rng = np.random.RandomState(0)
        for trial in range(12):
            t = rng.randint(8, 24)
            h, w = rng.randint(4, 10), rng.randint(4, 10)
            # mix of static background, churning labels, and ignore runs
            gt = rng.randint(0, 4, (t, h, w))
            gt[:, : h // 2] = rng.randint(0, 3)  # static region
            pred = gt.copy()
            churn = rng.rand(h, w) < 0.3
            pred[:, churn] = rng.randint(0, 4, (t, churn.sum()))
            if trial % 3 == 0:
                gt[:, -1, :] = 255  # ignore-label rows are labels like any
            for clip in (8, 16):
                expect = _oracle_vc(pred, gt, clip) if t >= clip else None
                got = video_consistency(jnp.asarray(pred), jnp.asarray(gt), clip)
                if expect is None:
                    assert got is None
                else:
                    assert got == pytest.approx(expect, abs=1e-6), (
                        trial, clip, t, h, w
                    )

    def test_multiwindow_video_with_state_carry_shapes(self):
        # 3+ window-length video: 40 frames, mVC_8 has 33 windows
        rng = np.random.RandomState(3)
        gt = rng.randint(0, 5, (40, 8, 8))
        gt[:, :4] = 1
        pred = np.roll(gt, 1, axis=0)  # temporally-shifted prediction
        pred[0] = gt[0]
        expect = _oracle_vc(pred, gt, 8)
        got = video_consistency(jnp.asarray(pred), jnp.asarray(gt), 8)
        assert got == pytest.approx(expect, abs=1e-6)


class TestSlidingBatches:
    def test_exact_multiple(self):
        assert sliding_batches(28, 14) == [(0, 14), (14, 28)]

    def test_tail_overlap(self):
        # 20 frames: second window realigned to (6, 20)
        assert sliding_batches(20, 14) == [(0, 14), (6, 20)]

    def test_short_video(self):
        assert sliding_batches(10, 14) == [(0, 10)]

    def test_covers_everything(self):
        for n in (14, 15, 27, 30, 41):
            covered = set()
            for s, e in sliding_batches(n, 14):
                covered.update(range(s, e))
            assert covered == set(range(n))


class TestTokenizer:
    def test_empty_prompt(self):
        t = tokenize_empty(2)
        assert t.shape == (2, 77)
        assert t[0, 0] == SOT and t[0, 1] == EOT and t[0, 2:].sum() == 0

    def test_tokenize_empty_string(self):
        t = tokenize([""])
        assert t.shape == (1, 77)

    def test_nonempty_without_vocab_raises(self, monkeypatch):
        monkeypatch.delenv("VIDSEG_BPE_PATH", raising=False)
        import vidseg_diffusion_tpu.io.tokenizer as tok

        monkeypatch.setattr(tok, "default_bpe_path", lambda: None)
        with pytest.raises(ValueError):
            tok.tokenize(["a photo of a dog"])


class TestBPE:
    """BPE mechanics on the vendored tiny merges table. Expected ids are
    hand-derived from the CLIP vocab layout: 512 byte(-</w>) symbols, then
    merges in file order, then SOT/EOT."""

    TINY = "vidseg_diffusion_tpu/assets/bpe_tiny_test_vocab.txt.gz"

    def _tok(self):
        from vidseg_diffusion_tpu.io.tokenizer import ClipBPETokenizer

        return ClipBPETokenizer(self.TINY)

    def test_single_letter_word_is_base_symbol(self):
        # "a</w>" = 256 + (ord('a') - ord('!')) = 320 — the same layout that
        # makes "a" id 320 in the production vocab
        t = self._tok()
        assert t.encode("a") == [320]

    def test_merge_chain(self):
        # "cat" → c+a (rank 0) → ca+t</w> (rank 1) → single token id 513
        t = self._tok()
        assert t.encode("cat") == [513]
        # "photo" → ph → pho → to</w> → photo</w> (rank order 4,5,7,8)
        assert t.encode("photo") == [520]

    def test_framing_and_padding(self):
        t = self._tok()
        out = t(["a cat"])
        assert out.shape == (1, 77)
        assert list(out[0, :4]) == [t.sot, 320, 513, t.eot]
        assert out[0, 4:].sum() == 0

    def test_literal_special_tokens_stay_atomic(self):
        # open_clip seeds its BPE cache so a literal <end_of_text> in the
        # prompt maps to the single EOT id, not a byte-split fragment chain
        t = self._tok()
        ids = t.encode("a <end_of_text> a")
        assert ids == [320, t.eot, 320]
        assert t.encode("<start_of_text>") == [t.sot]

    def test_unmergeable_word_splits_to_chars(self):
        t = self._tok()
        ids = t.encode("dg")  # no 'd g' merge: d + g</w>
        assert len(ids) == 2

    def test_cleanup_lowercase_whitespace(self):
        t = self._tok()
        assert t.encode("  A \n CAT ") == t.encode("a cat")

    def test_punctuation_splits(self):
        t = self._tok()
        # regex pre-tokenizer separates "cat" and "!"
        assert t.encode("cat!") == [513, t.encoder["!</w>"]]

    def test_truncation_forces_eot(self):
        t = self._tok()
        out = t(["cat " * 100])
        assert out.shape == (1, 77)
        assert out[0, -1] == t.eot and (out[0] != 0).all()

    def test_decode_roundtrip(self):
        t = self._tok()
        assert t.decode(t.encode("a cat dog")).strip() == "a cat dog"

    def test_tokenize_entry_point_with_bpe_path(self):
        out = tokenize(["a cat"], bpe_path=self.TINY)
        assert out.shape == (1, 77) and out[0, 1] == 320


class TestProductionVocabGoldens:
    """Run only when the real open_clip vocab is present (deployment
    machines); golden ids are open_clip's published tokenization."""

    def test_known_prompts(self):
        from vidseg_diffusion_tpu.io.tokenizer import default_bpe_path

        path = default_bpe_path()
        if path is None:
            pytest.skip("production BPE vocab not in container")
        out = tokenize(["a photo of a cat", "a photo of a dog"], bpe_path=path)
        assert list(out[0, :7]) == [49406, 320, 1125, 539, 320, 2368, 49407]
        assert list(out[1, :7]) == [49406, 320, 1125, 539, 320, 1929, 49407]


class TestConfigLoader:
    def test_load_tiny_svd(self):
        from vidseg_diffusion_tpu.config import load_model_spec

        spec = load_model_spec(
            "configs/inference/svd_tiny.yaml", num_steps=8, num_frames=3
        )
        assert spec.unet_config.video
        assert spec.unet_config.model_channels == 32
        assert spec.sampler.num_steps == 8
        assert spec.guider.num_frames == 3
        assert spec.vae_config.video_decoder

    def test_load_sd21(self):
        from vidseg_diffusion_tpu.config import load_model_spec
        from vidseg_diffusion_tpu.diffusion import DiscreteDenoiser, VanillaCFG

        spec = load_model_spec("configs/inference/sd_2_1.yaml")
        assert not spec.unet_config.video
        assert isinstance(spec.denoiser, DiscreteDenoiser)
        assert isinstance(spec.guider, VanillaCFG)
        assert spec.guider.scale == 5
        assert spec.sampler.num_steps == 40
        assert not spec.vae_config.video_decoder

    def test_load_full_svd(self):
        from vidseg_diffusion_tpu.config import load_model_spec
        from vidseg_diffusion_tpu.diffusion import LinearPredictionGuider

        spec = load_model_spec(
            "configs/inference/svd.yaml", num_steps=25, num_frames=14
        )
        assert spec.unet_config.model_channels == 320
        assert spec.unet_config.adm_in_channels == 768
        assert isinstance(spec.guider, LinearPredictionGuider)
        assert spec.sampler.discretization.sigma_max == 700.0


def test_load_gt_for_eval_preserves_numeric_frame_order(tmp_path):
    """Frames named 0..12 (non-zero-padded, explicitly supported by the
    loader's numeric stem sort) must reach the evaluator in temporal
    order — a lexicographic sort shuffled 0,1,10,11,12,2,... and broke the
    mVC windows."""
    from PIL import Image as PILImage

    from vidseg_diffusion_tpu.pipelines.vspw import (
        VSPWVideoResult, _load_gt_for_eval,
    )

    video_dir = tmp_path / "vid" / "origin"
    mask_dir = tmp_path / "vid" / "mask"
    mask_dir.mkdir(parents=True)
    n = 13
    seg = {}
    for i in range(n):  # insertion order IS temporal order
        seg[str(i)] = np.full((4, 4), i, np.int32)
        PILImage.fromarray(np.full((4, 4), i, np.uint8)).save(
            mask_dir / f"{i}.png"
        )
    res = VSPWVideoResult(seg=seg, unique_labels=np.arange(n))
    pred, gt = _load_gt_for_eval(str(video_dir), res)
    assert pred is not None
    np.testing.assert_array_equal(pred[:, 0, 0], np.arange(n))
    np.testing.assert_array_equal(gt[:, 0, 0], np.arange(n))
