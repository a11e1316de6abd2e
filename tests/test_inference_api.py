"""Inference API: txt2img + img2img end-to-end on the tiny SD config."""

import numpy as np
import jax
import pytest

from vidseg_diffusion_tpu.engine.build import build_pipeline
from vidseg_diffusion_tpu.inference.api import (
    Sampler,
    SamplingParams,
    SamplingPipeline,
)
from vidseg_diffusion_tpu.io.tokenizer import tokenize_empty


@pytest.fixture(scope="module")
def api():
    pipeline = build_pipeline("configs/inference/sd_tiny.yaml", num_steps=6)
    return SamplingPipeline(pipeline)


def test_txt2img(api):
    params = SamplingParams(width=64, height=64, steps=6, scale=5.0)
    out = api.text_to_image(params, tokenize_empty(1), rng=jax.random.PRNGKey(0))
    assert out.shape == (1, 64, 64, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0


def test_img2img_strength(api):
    params = SamplingParams(width=64, height=64, steps=6, img2img_strength=0.5)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    out = api.image_to_image(params, img, tokenize_empty(1), rng=jax.random.PRNGKey(1))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_txt2img_dpmpp(api):
    params = SamplingParams(width=64, height=64, steps=6, sampler=Sampler.DPMPP2M)
    out = api.text_to_image(params, tokenize_empty(1), rng=jax.random.PRNGKey(2))
    assert out.shape == (1, 64, 64, 3)
