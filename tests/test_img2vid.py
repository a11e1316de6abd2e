"""image_to_video (SVD img2vid generation) + Txt2NoisyDiscretizationWrapper.

Counterparts: scripts/demo/video_sampling.py:1-200 (the reference's SVD
img2vid demo driving streamlit_helpers.do_sample's video path :478-685) and
scripts/demo/discretization.py:30-57 (the base→refiner noisy handoff).
"""

import numpy as np
import jax
import pytest

from vidseg_diffusion_tpu.diffusion import EDMDiscretization
from vidseg_diffusion_tpu.inference.api import (
    Txt2NoisyDiscretizationWrapper,
    VideoSamplingParams,
)


# ---------------------------------------------------------------------------
# Txt2NoisyDiscretizationWrapper vs the literal reference math
# ---------------------------------------------------------------------------


def _reference_txt2noisy(sigmas: np.ndarray, strength: float, original_steps):
    """Literal port of scripts/demo/discretization.py:45-59 as the oracle."""
    asc = sigmas[::-1]
    steps = len(asc) if original_steps is None else original_steps + 1
    prune_index = max(min(int(strength * steps) - 1, steps - 1), 0)
    return asc[prune_index:][::-1]


@pytest.mark.parametrize("steps", [10, 25, 40])
@pytest.mark.parametrize("strength", [0.0, 0.1, 0.15, 0.5, 0.9, 1.0])
def test_txt2noisy_prunes_like_reference(steps, strength):
    disc = EDMDiscretization(0.002, 80.0, 7.0)
    full = np.asarray(disc(steps, do_append_zero=True))
    wrapper = Txt2NoisyDiscretizationWrapper(
        disc, strength=strength, original_steps=steps
    )
    ours = np.asarray(wrapper(steps, do_append_zero=True))
    oracle = _reference_txt2noisy(full, strength, steps)
    np.testing.assert_allclose(ours, oracle, rtol=1e-6)
    # original_steps=None branch: steps inferred from the schedule length
    w2 = Txt2NoisyDiscretizationWrapper(disc, strength=strength)
    np.testing.assert_allclose(
        np.asarray(w2(steps, do_append_zero=True)),
        _reference_txt2noisy(full, strength, None),
        rtol=1e-6,
    )


@pytest.mark.parametrize("steps", [10, 25])
@pytest.mark.parametrize("strength", [0.0, 0.15, 0.5, 1.0])
def test_txt2noisy_t_end_equivalence(steps, strength):
    """Looping the FULL schedule to t_end must traverse exactly the kept
    sigma pairs: sigmas[:t_end+1] == pruned schedule."""
    disc = EDMDiscretization(0.002, 80.0, 7.0)
    wrapper = Txt2NoisyDiscretizationWrapper(
        disc, strength=strength, original_steps=steps
    )
    full = np.asarray(disc(steps, do_append_zero=True))
    pruned = np.asarray(wrapper(steps, do_append_zero=True))
    t_end = wrapper.t_end(steps)
    assert t_end == len(pruned) - 1
    np.testing.assert_allclose(full[: t_end + 1], pruned, rtol=1e-6)


def test_txt2noisy_strength_validation():
    disc = EDMDiscretization(0.002, 80.0, 7.0)
    with pytest.raises(ValueError):
        Txt2NoisyDiscretizationWrapper(disc, strength=1.5)


# ---------------------------------------------------------------------------
# image_to_video e2e on a minimal SVD build
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def svd_api():
    from vidseg_diffusion_tpu.engine.build import build_pipeline
    from vidseg_diffusion_tpu.inference.api import SamplingPipeline

    return SamplingPipeline(
        build_pipeline("configs/inference/svd_tiny.yaml", num_steps=2, num_frames=2)
    )


def test_image_to_video(svd_api):
    params = VideoSamplingParams(
        width=32, height=32, num_frames=2, steps=2, decoding_t=2,
        max_cfg=2.5, min_cfg=1.0,
    )
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    out = svd_api.image_to_video(params, img, rng=jax.random.PRNGKey(7))
    assert out.shape == (2, 32, 32, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0
    # the cond frame must influence the result (conditioner actually wired):
    # a different input image changes the output video
    img2 = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    out2 = svd_api.image_to_video(params, img2, rng=jax.random.PRNGKey(7))
    assert float(np.abs(np.asarray(out2) - o).max()) > 1e-6


def test_image_to_video_rejects_image_pipeline():
    # The guard only inspects spec.unet_config.video, so a structural stub
    # suffices — a full sd_tiny build cost ~60 s of CPU compile here.
    from types import SimpleNamespace

    from vidseg_diffusion_tpu.inference.api import SamplingPipeline

    stub = SimpleNamespace(
        spec=SimpleNamespace(unet_config=SimpleNamespace(video=False)),
        conditioner=None,
    )
    api = SamplingPipeline(stub)
    params = VideoSamplingParams(width=32, height=32, num_frames=2, steps=2)
    img = np.zeros((1, 32, 32, 3), np.float32)
    with pytest.raises(ValueError, match="video"):
        api.image_to_video(params, img)
