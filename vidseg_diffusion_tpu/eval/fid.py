"""Fréchet distance (FID math) on device.

The reference's FID surface is a thin wrapper around the absent
``pytorch_fid`` package (sgm/modules/encoders/modules.py:187-205
InceptionV3) — the pretrained Inception weights are not in this container,
so the feature extractor stays excluded (PARITY.md), but the metric math
is implemented TPU-native and oracle-tested against the scipy formula
``pytorch_fid.fid_score.calculate_frechet_distance`` uses:

    d² = |μ₁−μ₂|² + tr(Σ₁ + Σ₂ − 2·sqrtm(Σ₁Σ₂))

``sqrtm(Σ₁Σ₂)`` of the non-symmetric product is computed via the PSD
identity tr·sqrtm(Σ₁Σ₂) = tr·sqrtm(√Σ₁ Σ₂ √Σ₁) so everything runs through
``eigh`` (XLA-native, differentiable) instead of a host Schur
decomposition. Any feature extractor works — CLIP image embeddings
(models/clip.py) are the natural in-framework choice ("CLIP-FID").

Precision: the ``astype(float64)`` casts take effect only when
``jax.config.jax_enable_x64`` is on; in default f32 mode large
ill-conditioned covariances (D≈2048) lose a few digits vs the scipy f64
oracle — enable x64 (or run the stats through NumPy) when comparing
against reference pytorch_fid numbers at full Inception width."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def matrix_sqrt_psd(a: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Symmetric PSD square root via eigendecomposition (clamps tiny
    negative eigenvalues from roundoff)."""
    w, v = jnp.linalg.eigh(a)
    w = jnp.clip(w, 0.0)
    return (v * jnp.sqrt(w + eps)[None, :]) @ v.T


def feature_stats(feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(μ [D], Σ [D, D]) of feature rows [N, D]; unbiased covariance
    (ddof=1) matching np.cov(rowvar=False) as used by pytorch_fid."""
    feats = feats.astype(jnp.float64)
    n = feats.shape[0]
    mu = jnp.mean(feats, axis=0)
    x = feats - mu[None]
    sigma = (x.T @ x) / (n - 1)
    return mu, sigma


def frechet_distance(
    mu1: jax.Array, sigma1: jax.Array, mu2: jax.Array, sigma2: jax.Array
) -> jax.Array:
    mu1 = mu1.astype(jnp.float64)
    mu2 = mu2.astype(jnp.float64)
    sigma1 = sigma1.astype(jnp.float64)
    sigma2 = sigma2.astype(jnp.float64)
    diff = mu1 - mu2
    s1h = matrix_sqrt_psd(sigma1)
    # tr sqrtm(Σ₁Σ₂) = tr sqrtm(√Σ₁ Σ₂ √Σ₁): similar matrices share spectra
    inner = s1h @ sigma2 @ s1h
    w = jnp.clip(jnp.linalg.eigvalsh(inner), 0.0)
    tr_covmean = jnp.sum(jnp.sqrt(w))
    return (
        diff @ diff
        + jnp.trace(sigma1)
        + jnp.trace(sigma2)
        - 2.0 * tr_covmean
    )


def fid_from_features(feats1: jax.Array, feats2: jax.Array) -> jax.Array:
    """FID between two feature populations [N₁, D], [N₂, D]."""
    mu1, s1 = feature_stats(feats1)
    mu2, s2 = feature_stats(feats2)
    return frechet_distance(mu1, s1, mu2, s2)


def clip_features(
    clip_image_fn, images: jax.Array, batch_size: int = 32
) -> jax.Array:
    """[-1, 1] images [N, H, W, 3] → embedding rows [N, D] through the
    in-framework CLIP image tower. ``clip_image_fn`` is any frames→embedding
    callable — ``Pipeline.clip_apply`` on an SVD build (the ViT-H tower with
    its bicubic-224 preprocess, engine/build.py clip_image_fn) is the
    in-framework choice. This is the CLIP-FID variant: the reference's
    extractor (InceptionV3, sgm/modules/encoders/modules.py:187-205) wraps
    absent pytorch_fid weights and stays excluded (PARITY.md)."""
    images = jnp.asarray(images)
    if images.shape[0] == 0:
        raise ValueError(
            "clip_features needs at least one image (got an empty batch); "
            "FID additionally needs N >= 2 rows per population for a "
            "non-degenerate covariance"
        )
    feats = [
        clip_image_fn(images[i : i + batch_size])
        for i in range(0, images.shape[0], batch_size)
    ]
    return feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=0)


def clip_fid(
    clip_image_fn, images1: jax.Array, images2: jax.Array, batch_size: int = 32
) -> jax.Array:
    """CLIP-FID between two image populations (both [N, H, W, 3] in
    [-1, 1]); the end-to-end consumer of the Fréchet math above."""
    return fid_from_features(
        clip_features(clip_image_fn, images1, batch_size),
        clip_features(clip_image_fn, images2, batch_size),
    )
