"""Jitted image ops: separable Gaussian blur, resize helpers.

Counterparts of the reference's OpenCV/PIL calls on the segmentation path:
- cv2.GaussianBlur(d, (5,5), 3) on difference maps (process_output.py:15)
- PIL/nearest/bilinear/LANCZOS resizes of masks and feature maps
  (svd_single_video_inference.py:97; process_output.py:34;
  sampling.py:245 nearest latent-mask resize)
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp


def gaussian_kernel1d(ksize: int, sigma: float) -> jnp.ndarray:
    """cv2.getGaussianKernel semantics: truncated, normalized Gaussian; for
    sigma<=0 cv2 derives it from ksize (not needed here)."""
    r = (ksize - 1) / 2.0
    x = jnp.arange(ksize, dtype=jnp.float32) - r
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img: jax.Array, ksize: int = 5, sigma: float = 3.0) -> jax.Array:
    """Separable Gaussian blur with REFLECT_101 borders (cv2 default).

    img: [..., H, W] — blurs the trailing two dims."""
    k = gaussian_kernel1d(ksize, sigma)
    pad = ksize // 2
    orig_shape = img.shape
    h, w = orig_shape[-2:]
    x = img.reshape((-1, h, w)).astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="reflect")
    # rows then cols via tensordot over sliding windows is wasteful; use
    # conv_general_dilated with 1 channel
    x = x[:, None, :, :]  # [B, 1, H+2p, W+2p]
    kr = k.reshape(1, 1, ksize, 1)
    kc = k.reshape(1, 1, 1, ksize)
    x = jax.lax.conv_general_dilated(x, kr, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kc, (1, 1), "VALID")
    return x[:, 0].reshape(orig_shape)


def resize_nearest(img: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    """Nearest resize on trailing [H, W] dims (torch F.interpolate 'nearest'
    semantics, used for latent-blending masks, sampling.py:245)."""
    out_shape = img.shape[:-2] + tuple(shape)
    return jax.image.resize(img, out_shape, method="nearest")


def resize_bilinear(img: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    out_shape = img.shape[:-2] + tuple(shape)
    return jax.image.resize(img, out_shape, method="bilinear")


def resize_lanczos(img: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    """Lanczos-3 resize (PIL Image.LANCZOS is a=3; jax lanczos3 matches the
    windowed-sinc family, minor tap-weight differences are below the
    downstream argmax's sensitivity)."""
    out_shape = img.shape[:-2] + tuple(shape)
    return jax.image.resize(img, out_shape, method="lanczos3")


def resize_bicubic(img: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    """PIL's default resample (BICUBIC) used by load_feature_masks
    (svd_single_video_inference.py:97)."""
    out_shape = img.shape[:-2] + tuple(shape)
    return jax.image.resize(img, out_shape, method="cubic")
