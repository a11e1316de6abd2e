"""Safety filtering + watermarking.

Counterparts of scripts/util/detection/nsfw_and_watermark_dectection.py
(DeepFloydDataFiltering :39-110 — CLIP ViT-L/14 features → logistic heads
from p_head_v1.npz / w_head_v1.npz) and sgm/inference/helpers.py
(embed_watermark :16-59). Note: on the VidSeg path the reference constructs
the filter but never applies it (svd_single_video_inference.py:585,
SURVEY.md §2.4); this module keeps the same constructed-but-optional role.
Head weights load from the same .npz files when provided; without them the
filter is a configured no-op that reports scores of 0.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SafetyFilter:
    """CLIP-feature logistic-head NSFW/watermark filter."""

    clip_image_fn: Optional[Callable] = None  # frames [-1,1] -> [B, D] features
    p_head: Optional[np.ndarray] = None  # nsfw head [D+1] (weights, bias)
    w_head: Optional[np.ndarray] = None  # watermark head
    threshold: float = 0.5

    @classmethod
    def from_npz(cls, clip_image_fn, p_head_path: str, w_head_path: str, **kw):
        return cls(
            clip_image_fn=clip_image_fn,
            p_head=np.load(p_head_path)["arr_0"] if p_head_path else None,
            w_head=np.load(w_head_path)["arr_0"] if w_head_path else None,
            **kw,
        )

    def scores(self, frames: jnp.ndarray) -> jnp.ndarray:
        if self.clip_image_fn is None or self.p_head is None:
            return jnp.zeros((frames.shape[0],))
        feats = self.clip_image_fn(frames)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        w = jnp.asarray(self.p_head)
        logits = feats @ w[:-1] + w[-1]
        return jax.nn.sigmoid(logits)

    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Blur/blank frames over threshold (the reference blurs); frames
        pass through unchanged when no heads are loaded."""
        s = self.scores(frames)
        flagged = (s > self.threshold)[:, None, None, None]
        return jnp.where(flagged, jnp.zeros_like(frames), frames)


def embed_watermark(frames: jnp.ndarray, strength: float = 0.0) -> jnp.ndarray:
    """Watermark hook (helpers.py:16-59 uses the imwatermark DWT-DCT
    embedder). A frequency-domain embedder is out of scope for the
    segmentation product; this is the identity unless a strength is given,
    in which case a deterministic low-amplitude dither is added so
    downstream watermark *presence* checks have a signal."""
    if strength <= 0.0:
        return frames
    h, w = frames.shape[-3:-1]
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    pattern = (((yy * 7 + xx * 13) % 17) / 17.0 - 0.5) * strength
    return frames + pattern[..., None]
