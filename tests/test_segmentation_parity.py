"""Difference-map parity against the PUBLIC reference's process_output.py
functions executed directly (cv2/PIL, no torch model needed)."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from PIL import Image

from vidseg_diffusion_tpu.engine.segmentation import (
    compute_difference,
    filter_difference,
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_compat import ensure_reference_importable  # noqa: E402


@pytest.fixture()
def ref_process_output():
    ensure_reference_importable()
    import scripts.sampling.process_output as po  # noqa

    return po


def test_compute_difference_matches_reference(tmp_path, ref_process_output):
    po = ref_process_output
    rng = np.random.RandomState(0)
    a = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
    b = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
    p1 = tmp_path / "a.png"
    p2 = tmp_path / "b.png"
    Image.fromarray(a).save(p1)
    Image.fromarray(b).save(p2)
    out1 = tmp_path / "out"
    out2 = tmp_path / "vis"
    out1.mkdir()
    out2.mkdir()

    ref_diff, _ = po.compute_difference(str(p1), str(p2), str(out1), str(out2), 0)
    # the reference then RELOADS the uint8 jpg; emulate its quantization
    ref_saved = np.asarray(Image.fromarray(ref_diff).convert("L"))

    got = np.asarray(
        compute_difference(
            jnp.asarray(a[None]), jnp.asarray(b[None]), mode="uint8_wrap"
        )
    )[0]
    # tolerance ±1 for blur rounding at the uint8 boundary
    assert np.abs(got - ref_saved.astype(np.float32)).max() <= 1.0
    frac_exact = (got == ref_saved).mean()
    assert frac_exact > 0.98


def test_filter_difference_matches_reference(tmp_path, ref_process_output):
    po = ref_process_output
    rng = np.random.RandomState(1)
    diff = rng.rand(20, 28).astype(np.float64)
    mask = np.zeros((10, 14), np.uint8)
    mask[2:7, 3:10] = 255
    mask_img = Image.fromarray(mask)

    expected = po.filter_difference_map(diff.copy(), mask_img, filter_s=0.7)
    got = np.asarray(
        filter_difference(
            jnp.asarray(diff[None, None], jnp.float32),
            jnp.asarray((mask[None, None] / 255.0).astype(np.float32)),
            0.7,
        )
    )[0, 0]
    # LANCZOS implementations differ slightly at mask edges; interiors match
    assert np.abs(got - expected).mean() < 0.02
