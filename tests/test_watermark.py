"""DWT-DCT invisible watermark: embed/decode roundtrip + the detect CLI's
match classification (counterparts of sgm/inference/helpers.py:16-59 and
scripts/demo/detect.py:1-156)."""

import numpy as np
import pytest

from vidseg_diffusion_tpu.utils.watermark import (
    MATCH_VALUES,
    WATERMARK_BITS,
    classify_match,
    decode_watermark_bits,
    embed_watermark_frames,
    watermark_match_bits,
)


def _image(seed=0, h=256, w=256):
    rng = np.random.RandomState(seed)
    # smooth-ish natural-image stand-in: low-freq base + mild noise
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(yy / 37.0) * np.cos(xx / 53.0)
    img = base[..., None] + rng.randint(-20, 20, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.float64)


class TestWatermarkRoundtrip:
    def test_fixed_message_roundtrip(self):
        img = _image(0)
        wm = embed_watermark_frames(img)
        assert int(watermark_match_bits(wm)) == len(WATERMARK_BITS)

    def test_random_message_roundtrip(self):
        rng = np.random.RandomState(7)
        bits = rng.randint(0, 2, 48)
        wm = embed_watermark_frames(_image(1), bits=bits)
        dec = decode_watermark_bits(wm)
        np.testing.assert_array_equal(dec, bits)

    def test_batch_and_unit_range(self):
        imgs = np.stack([_image(2), _image(3)]) / 255.0  # [2, H, W, 3] in [0,1]
        wm = embed_watermark_frames(imgs)
        assert wm.shape == imgs.shape
        assert wm.max() <= 1.0 + 1e-9
        matches = watermark_match_bits(wm)
        assert matches.shape == (2,)
        assert (matches == len(WATERMARK_BITS)).all()

    def test_invisibility(self):
        img = _image(4)
        wm = embed_watermark_frames(img)
        # chroma-plane embed at scale 36: small mean distortion
        assert np.abs(wm - img).mean() < 6.0

    def test_unwatermarked_scores_low(self):
        # a clean image should fall in the "no watermark" or at most
        # "partial" bucket (thresholds from detect.py:57-77)
        n = int(watermark_match_bits(_image(5)))
        assert n <= 33

    def test_small_image_rejected(self):
        with pytest.raises(ValueError):
            decode_watermark_bits(np.zeros((64, 64, 3)))

    def test_small_image_embed_passthrough(self):
        img = _image(6, h=64, w=64)
        np.testing.assert_array_equal(embed_watermark_frames(img), img)


class TestMatchClassification:
    def test_buckets(self):
        assert classify_match(0) == MATCH_VALUES[0][1]
        assert classify_match(27) == MATCH_VALUES[0][1]
        assert classify_match(28) == MATCH_VALUES[1][1]
        assert classify_match(34) == MATCH_VALUES[2][1]
        assert classify_match(36) == MATCH_VALUES[3][1]
        assert classify_match(48) == MATCH_VALUES[3][1]

    def test_embed_watermark_hook_uses_real_scheme_at_size(self):
        from vidseg_diffusion_tpu.utils.safety import embed_watermark

        img = (_image(8) / 255.0).astype(np.float32)
        wm = np.asarray(embed_watermark(img[None], strength=1.0))
        assert int(watermark_match_bits(wm[0])) == len(WATERMARK_BITS)


def test_range_inference_near_black_and_integer():
    """Near-black [0,255] frames (max <= 1.5) were misread as unit range
    and returned ~255x darker; integer dtype now forces byte range and
    the flag is explicit for ambiguous floats."""
    import numpy as np

    from vidseg_diffusion_tpu.utils.watermark import embed_watermark_frames

    dark_int = np.ones((300, 300, 3), np.uint8)  # max == 1 in [0,255]
    out = embed_watermark_frames(dark_int)
    # perturbation stays ~the embed scale (a few byte counts), NOT the
    # 255x-rescaled output the old heuristic produced
    assert out.max() < 20.0

    dark_float = np.ones((300, 300, 3), np.float64)  # ambiguous
    out_b = embed_watermark_frames(dark_float, unit_range=False)
    assert out_b.max() < 20.0
    out_u = embed_watermark_frames(dark_float, unit_range=True)
    assert out_u.max() <= 1.0 + 1e-9  # unit-range family preserved
