"""Difference-map → segmentation assembly, on device.

Counterpart of scripts/sampling/process_output.py: per-(mask, frame) L2
difference of the ±λ decoded frames + 5×5 σ=3 Gaussian blur
(compute_difference :8-28), optional mask-gated down-weighting
`d·mask + s·d·(1−mask)` (filter_difference_map :30-38), per-map max
normalization (:124), and argmax over masks (:150) mapped through the label
iterator (:159).

Reference quirk, preserved behind `mode="uint8_wrap"` (the default for
parity): the reference computes `(a − b)**2` on uint8 PNG arrays, so both
the difference and its square wrap mod 256 (process_output.py:13 — for
channel delta d the effective contribution is d² mod 256), and the blurred
map is saved through `Image.convert("L")` (clip-to-uint8) before reload
(:18-19, 122). `mode="float"` is the intended math (exact fp32), available
as an accuracy-improving option.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vidseg_diffusion_tpu.ops.image import gaussian_blur, resize_lanczos


@functools.partial(jax.jit, static_argnames=("mode",))
def compute_difference(
    frames_a: jax.Array,  # [..., H, W, 3] uint8-valued (0..255)
    frames_b: jax.Array,
    mode: str = "uint8_wrap",
) -> jax.Array:
    """L2-over-RGB difference + Gaussian blur (process_output.py:8-19).
    Returns the uint8-quantized blurred difference as float (the reference
    round-trips through an 8-bit image file)."""
    if mode == "uint8_wrap":
        a = frames_a.astype(jnp.uint8)
        b = frames_b.astype(jnp.uint8)
        delta = (a - b).astype(jnp.uint8)  # wraps mod 256
        sq = (delta * delta).astype(jnp.uint8)  # wraps mod 256
        ss = jnp.sum(sq.astype(jnp.float32), axis=-1)
    elif mode == "float":
        ss = jnp.sum(
            (frames_a.astype(jnp.float32) - frames_b.astype(jnp.float32)) ** 2,
            axis=-1,
        )
    else:
        raise ValueError(mode)
    d = jnp.sqrt(ss)
    d = gaussian_blur(d, 5, 3.0)
    # Image.convert("L") on the float map: clip then truncate to uint8
    d = jnp.clip(d, 0.0, 255.0).astype(jnp.uint8).astype(jnp.float32)
    return d


@jax.jit
def filter_difference(
    diff: jax.Array,   # [M, T, H, W] (already max-normalized or raw)
    masks: jax.Array,  # [M, T, mh, mw] binary 0/1
    filter_s: float,
) -> jax.Array:
    """Down-weight outside-mask difference: d·m + s·d·(1−m)
    (process_output.py:30-38; mask LANCZOS-resized to the map size)."""
    mh, mw = diff.shape[-2:]
    # PIL's LANCZOS output is a uint8 image, i.e. clamped to [0, 255];
    # unclamped lanczos ringing pushed m outside [0, 1] and amplified
    # in-mask difference beyond 1x near boundaries
    m = jnp.clip(
        resize_lanczos(masks.astype(jnp.float32) * 255.0, (mh, mw)),
        0.0, 255.0,
    ) / 255.0
    return diff * m + filter_s * diff * (1.0 - m)


def segmentation_argmax(
    diff: jax.Array,                 # [M, T, H, W]
    masks: Optional[jax.Array] = None,   # [M, T, mh, mw] for filtering
    filter_s: Optional[float] = None,
    labels: Optional[jax.Array] = None,  # [M] label ids (unique_labels)
) -> jax.Array:
    """Per-map max normalization, optional filtering, argmax over the mask
    axis, mapped to label ids (process_output.py:109-161).
    Returns [T, H, W] int32."""
    norm = diff / (jnp.max(diff, axis=(-2, -1), keepdims=True) + 1e-5)
    if filter_s is not None and masks is not None:
        norm = filter_difference(norm, masks, filter_s)
    seg = jnp.argmax(norm, axis=0)
    if labels is not None:
        seg = labels[seg]
    return seg.astype(jnp.int32)


def soft_color_map(n: int = 128, seed: int = 0) -> np.ndarray:
    """Color palette for colorized segmentation PNGs.

    The first 119 entries are the reference's table
    (scripts/util/color_map_soft.txt, consumed at process_output.py:105-107,
    vendored as package data) so colorized outputs match the reference
    pixel-wise; labels beyond 119 extend with a deterministic
    golden-ratio-spaced palette (the reference would IndexError there)."""
    table_path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "assets", "color_map_soft.txt"
    )
    base = np.loadtxt(table_path, delimiter=",", dtype=np.int64).astype(np.uint8)
    if n <= base.shape[0]:
        return base[:n]
    extra = n - base.shape[0]
    rng = np.random.RandomState(seed)
    hues = (np.arange(extra) * 0.61803398875) % 1.0  # golden-ratio spacing
    sat = 0.35 + 0.25 * rng.rand(extra)
    val = 0.75 + 0.2 * rng.rand(extra)
    import colorsys

    rgb = np.array(
        [colorsys.hsv_to_rgb(h, s, v) for h, s, v in zip(hues, sat, val)]
    )
    return np.concatenate([base, (rgb * 255).astype(np.uint8)], axis=0)


def camvid_color_map() -> np.ndarray:
    """The CamVid palette (scripts/util/color_map_camvid.txt, vendored
    byte-identically as package data) for CamVid-labelled outputs —
    [32, 3] uint8 (the table has 32 entries)."""
    table_path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "assets", "color_map_camvid.txt"
    )
    return np.loadtxt(table_path, delimiter=",", dtype=np.int64).astype(np.uint8)
