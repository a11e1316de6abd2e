"""FID math vs the scipy oracle (the exact formula pytorch_fid's
calculate_frechet_distance implements with scipy.linalg.sqrtm)."""

import numpy as np
import jax.numpy as jnp
import pytest

scipy = pytest.importorskip("scipy")
from scipy import linalg  # noqa: E402

from vidseg_diffusion_tpu.eval.fid import (  # noqa: E402
    feature_stats,
    fid_from_features,
    frechet_distance,
    matrix_sqrt_psd,
)


def _oracle(mu1, sigma1, mu2, sigma2):
    # pytorch_fid fid_score.calculate_frechet_distance, verbatim math
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(
        covmean
    )


def _rand_stats(rs, d, n):
    f = rs.rand(n, d).astype(np.float64) * 2 - 1
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return f, mu, sigma


def test_matrix_sqrt_psd():
    rs = np.random.RandomState(0)
    a = rs.rand(6, 6)
    psd = a @ a.T
    r = np.asarray(matrix_sqrt_psd(jnp.asarray(psd)))
    np.testing.assert_allclose(r @ r, psd, atol=1e-4)


def test_frechet_distance_matches_scipy():
    rs = np.random.RandomState(1)
    _, mu1, s1 = _rand_stats(rs, 8, 200)
    _, mu2, s2 = _rand_stats(rs, 8, 300)
    want = _oracle(mu1, s1, mu2, s2)
    got = float(frechet_distance(
        jnp.asarray(mu1), jnp.asarray(s1), jnp.asarray(mu2), jnp.asarray(s2)
    ))
    assert got == pytest.approx(want, rel=2e-3, abs=1e-3)


def test_fid_f64_path_tight():
    """Under x64 the implementation must track the scipy f64 oracle to
    near machine precision at a wider feature dim."""
    rs = np.random.RandomState(3)
    _, mu1, s1 = _rand_stats(rs, 64, 500)
    _, mu2, s2 = _rand_stats(rs, 64, 400)
    want = _oracle(mu1, s1, mu2, s2)
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        got = float(frechet_distance(
            jnp.asarray(mu1), jnp.asarray(s1),
            jnp.asarray(mu2), jnp.asarray(s2),
        ))
    finally:
        jax.config.update("jax_enable_x64", False)
    assert got == pytest.approx(want, rel=1e-8, abs=1e-8)


@pytest.mark.slow  # ~20 s CLIP build; FID math covered by the scipy-oracle tests
def test_clip_fid_end_to_end():
    """CLIP-FID wired through the in-framework CLIP image tower (the FID
    consumer — the reference's InceptionV3 extractor wraps absent
    pytorch_fid weights, PARITY.md): identical populations score ~0,
    disjoint ones score > 0, and batching is seam-free."""
    import jax

    from vidseg_diffusion_tpu.eval.fid import clip_features, clip_fid
    from vidseg_diffusion_tpu.models.clip import (
        CLIPVisionConfig,
        CLIPVisionTransformer,
        clip_preprocess,
    )

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=16, width=32, heads=4, layers=2,
        output_dim=16,
    )
    tower = CLIPVisionTransformer(cfg)
    rs = np.random.RandomState(0)
    imgs1 = jnp.asarray(rs.rand(7, 32, 32, 3).astype(np.float32) * 2 - 1)
    imgs2 = jnp.clip(imgs1 + 0.5, -1.0, 1.0)
    # tiny tower skips the 224 resize: the pos-embedding grid follows the
    # input size, like the pipeline's tower follows its 224 preprocess
    params = tower.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3)))[
        "params"
    ]

    def clip_image_fn(frames):
        x = (frames + 1.0) / 2.0  # normalize-only stand-in for preprocess
        return tower.apply({"params": params}, x)

    feats = clip_features(clip_image_fn, imgs1, batch_size=3)
    assert feats.shape == (7, 16)
    # batching must not change the features
    np.testing.assert_allclose(
        np.asarray(feats),
        np.asarray(clip_features(clip_image_fn, imgs1, batch_size=7)),
        atol=1e-5,
    )
    same = float(clip_fid(clip_image_fn, imgs1, imgs1, batch_size=4))
    diff = float(clip_fid(clip_image_fn, imgs1, imgs2, batch_size=4))
    assert same == pytest.approx(0.0, abs=1e-3)
    assert diff > same + 1e-3
    # the real preprocess path is importable and shape-stable
    pre = clip_preprocess(imgs1[:2])
    assert pre.shape == (2, 224, 224, 3)


def test_fid_from_features_and_identity():
    rs = np.random.RandomState(2)
    f1, mu1, s1 = _rand_stats(rs, 5, 400)
    f2, mu2, s2 = _rand_stats(rs, 5, 500)
    # stats match np.cov conventions (ddof=1)
    gmu, gs = feature_stats(jnp.asarray(f1))
    np.testing.assert_allclose(np.asarray(gmu), mu1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), s1, atol=1e-4)

    want = _oracle(mu1, s1, mu2, s2)
    got = float(fid_from_features(jnp.asarray(f1), jnp.asarray(f2)))
    assert got == pytest.approx(want, rel=2e-3, abs=1e-3)

    same = float(fid_from_features(jnp.asarray(f1), jnp.asarray(f1)))
    assert same == pytest.approx(0.0, abs=1e-3)
