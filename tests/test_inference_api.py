"""Inference API: txt2img + img2img end-to-end on the tiny SD config."""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # end-to-end txt2img/img2img compiles

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


@pytest.fixture(scope="module")
def sdxl_api():
    return SamplingPipeline(build_pipeline("configs/inference/sd_xl_tiny.yaml"))


TINY_BPE = "vidseg_diffusion_tpu/assets/bpe_tiny_test_vocab.txt.gz"


def test_sdxl_txt2img_nonempty_prompt(sdxl_api):
    """SDXL dual-text conditioner end-to-end with a BPE-tokenized non-empty
    prompt (reference api.py:180-210 + sd_xl_base.yaml conditioner)."""
    from vidseg_diffusion_tpu.io.tokenizer import tokenize

    tokens = tokenize(["a photo of a cat"], bpe_path=TINY_BPE)
    params = SamplingParams(
        width=64, height=64, steps=4, orig_width=64, orig_height=64
    )
    out = sdxl_api.text_to_image(params, tokens, rng=jax.random.PRNGKey(0))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sdxl_cond_layout(sdxl_api):
    """crossattn = [CLIP-L | bigG] widths; vector = [pooled | 3 size embs];
    uc text zeroed (force_uc_zero_embeddings=['txt']) but sizes kept."""
    from vidseg_diffusion_tpu.io.tokenizer import tokenize

    tokens = tokenize(["cat"], bpe_path=TINY_BPE)
    params = SamplingParams(width=64, height=64)
    c, uc = sdxl_api._make_cond(params, tokens, None, 2)
    assert c["crossattn"].shape == (2, 77, 32 + 48)
    assert c["vector"].shape == (2, 48 + 3 * 2 * 16)
    assert float(np.abs(np.asarray(uc["crossattn"])).max()) == 0.0
    assert float(np.abs(np.asarray(uc["vector"])).max()) > 0.0
    # prompt actually reaches the conditioning
    c2, _ = sdxl_api._make_cond(params, tokenize_empty(1), None, 2)
    assert float(np.abs(np.asarray(c["crossattn"] - c2["crossattn"])).max()) > 1e-6


@pytest.fixture(scope="module")
def refiner_api():
    return SamplingPipeline(
        build_pipeline("configs/inference/sd_xl_refiner_tiny.yaml")
    )


def test_refiner_latents_roundtrip(refiner_api):
    """refiner(): img2img on base-model latents with skip-encode semantics
    and aesthetic 6.0/2.5 conditioning (reference api.py:245-277)."""
    from vidseg_diffusion_tpu.io.tokenizer import tokenize

    tokens = tokenize(["a cat"], bpe_path=TINY_BPE)
    z = np.random.RandomState(0).randn(1, 8, 8, 4).astype(np.float32)
    params = SamplingParams(steps=4, img2img_strength=0.5)
    out = refiner_api.refiner(params, z, tokens, rng=jax.random.PRNGKey(3))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_refiner_cond_layout(refiner_api):
    """vector = [bigG pooled | orig | crop | aesthetic]; uc uses the
    negative aesthetic score but keeps sizes; uc text is the EMPTY-prompt
    embedding, NOT force-zeroed — the refiner spec is legacy and the
    reference calls do_img2img with force_uc_zero_embeddings=[]
    (api.py:245-277); zeroing also wiped the pooled vector segment."""
    from vidseg_diffusion_tpu.io.tokenizer import tokenize

    tokens = tokenize(["cat"], bpe_path=TINY_BPE)
    params = SamplingParams(
        width=64, height=64, aesthetic_score=6.0, negative_aesthetic_score=2.5
    )
    c, uc = refiner_api._make_cond(params, tokens, None, 2)
    assert c["crossattn"].shape == (2, 77, 48)
    assert c["vector"].shape == (2, 48 + 2 * 16 + 2 * 16 + 16)
    ucx = np.asarray(uc["crossattn"])
    assert float(np.abs(ucx).max()) > 0.0  # real empty-prompt embedding
    assert not np.allclose(ucx, np.asarray(c["crossattn"]))
    # aesthetic segment differs between c and uc; size segments match
    cv, uv = np.asarray(c["vector"]), np.asarray(uc["vector"])
    assert not np.allclose(cv[:, -16:], uv[:, -16:])
    np.testing.assert_allclose(cv[:, 48:-16], uv[:, 48:-16])


def test_base_to_refiner_noisy_handoff(sdxl_api, refiner_api):
    """The demo's two-stage SDXL flow (reference sampling.py:295-360):
    base txt2img with Txt2NoisyDiscretizationWrapper(stage2strength) stops at
    a nonzero σ and returns latents; the refiner finishes denoising them
    with add_noise=False (finish_denoising)."""
    from vidseg_diffusion_tpu.io.tokenizer import tokenize

    tokens = tokenize(["a cat"], bpe_path=TINY_BPE)
    params = SamplingParams(
        width=64, height=64, steps=4, orig_width=64, orig_height=64
    )
    frames, z = sdxl_api.text_to_image(
        params, tokens, rng=jax.random.PRNGKey(0),
        txt2noisy_strength=0.5, return_latents=True,
    )
    assert frames.shape == (1, 64, 64, 3) and z.shape == (1, 8, 8, 4)
    # stopping early must actually change the latent vs the full run
    _, z_full = sdxl_api.text_to_image(
        params, tokens, rng=jax.random.PRNGKey(0), return_latents=True
    )
    assert float(np.abs(np.asarray(z - z_full)).max()) > 1e-6
    rp = SamplingParams(steps=4, img2img_strength=0.5)
    out = refiner_api.refiner(
        rp, z, tokens, rng=jax.random.PRNGKey(1), add_noise=False
    )
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_img2img_strength_window_matches_reference_wrapper():
    """Our t_start mapping must select exactly the sigma window the
    reference's Img2ImgDiscretizationWrapper keeps (helpers.py:77-98:
    flip, keep first max(int(strength*len),1), flip back)."""
    for steps in (10, 25, 50):
        n_sig = steps + 1
        sigmas = np.linspace(14.6, 0.0, n_sig)  # descending like EDM
        for strength in (0.0, 0.05, 0.3, 0.5, 0.75, 0.999, 1.0):
            # literal reference oracle
            asc = sigmas[::-1]
            kept = asc[: max(int(strength * len(asc)), 1)][::-1]
            # our mapping (inference/api._denoise_from_latent)
            keep = max(int(n_sig * strength), 1)
            t_start = n_sig - keep
            ours = sigmas[t_start:]
            np.testing.assert_allclose(ours, kept, err_msg=f"{steps}/{strength}")
            # t_start >= steps means zero denoise steps (reference keeps
            # only the final sigma) — the API returns the input then
            assert (t_start >= steps) == (len(kept) <= 1)
