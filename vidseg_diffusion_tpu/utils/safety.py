"""Safety filtering + watermarking.

Counterparts of scripts/util/detection/nsfw_and_watermark_dectection.py
(DeepFloydDataFiltering :39-76 — CLIP ViT-L/14 features → logistic heads
from p_head_v1.npz / w_head_v1.npz) and sgm/inference/helpers.py
(embed_watermark :16-59). Note: on the VidSeg path the reference constructs
the filter but never applies it (svd_single_video_inference.py:585,
SURVEY.md §2.4); this module keeps the same constructed-but-optional role.

Head math mirrors the reference exactly (validated against an executable
torch replica in tests/test_safety_parity.py):
- .npz files carry `weights` [K, D] and `biases` [K] keys
  (load_model_weights, :20-22)
- features are the RAW CLIP image embeddings cast to fp16 — NOT
  L2-normalized (:63-64)
- predict_proba is the numerically-stable two-branch sigmoid (:12-17)
- flagged images are Gaussian-blurred with kernel 99, sigma 100 (:70-75),
  by BOTH the nsfw (p) and watermark (w) heads at threshold 0.5
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vidseg_diffusion_tpu.ops.image import gaussian_blur

# CLIP preprocessing stats (clip_process_images, :25-36)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def predict_proba(x: np.ndarray, weights: np.ndarray, biases: np.ndarray):
    """Stable logistic head (nsfw_and_watermark_dectection.py:12-17):
    x [B, D], weights [K, D], biases [K] → proba [K, B]."""
    logits = x @ weights.T + biases
    proba = np.where(
        logits >= 0,
        1.0 / (1.0 + np.exp(-logits)),
        np.exp(logits) / (1.0 + np.exp(logits)),
    )
    return proba.T


@dataclasses.dataclass
class SafetyFilter:
    """CLIP-feature logistic-head NSFW/watermark filter.

    clip_image_fn maps preprocessed frames to raw (un-normalized) CLIP
    image embeddings; heads are (weights [K, D], biases [K]) pairs. Without
    heads the filter is a configured no-op reporting scores of 0 (the
    .npz head files are distributed separately upstream)."""

    clip_image_fn: Optional[Callable] = None
    p_head: Optional[tuple] = None  # (weights, biases)
    w_head: Optional[tuple] = None
    p_threshold: float = 0.5
    w_threshold: float = 0.5

    @classmethod
    def from_npz(cls, clip_image_fn, p_head_path: str, w_head_path: str, **kw):
        def load(path):
            if not path:
                return None
            z = np.load(path)
            return (np.asarray(z["weights"]), np.asarray(z["biases"]))

        return cls(
            clip_image_fn=clip_image_fn,
            p_head=load(p_head_path),
            w_head=load(w_head_path),
            **kw,
        )

    def _features(self, frames: jnp.ndarray) -> np.ndarray:
        feats = np.asarray(self.clip_image_fn(frames))
        # the reference casts features to fp16 before the heads (:63-64)
        return feats.astype(np.float16)

    def scores(self, frames: jnp.ndarray) -> np.ndarray:
        """[2, B] (p_pred, w_pred) probabilities for K=1 heads; zeros when
        unconfigured."""
        b = frames.shape[0]
        if self.clip_image_fn is None or (
            self.p_head is None and self.w_head is None
        ):
            return np.zeros((2, b))
        feats = self._features(frames)
        out = np.zeros((2, b))
        if self.p_head is not None:
            out[0] = predict_proba(feats, *self.p_head)[0]
        if self.w_head is not None:
            out[1] = predict_proba(feats, *self.w_head)[0]
        return out

    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Blur frames either head flags (GaussianBlur(99, 100) — :70-75).
        The blurs apply SEQUENTIALLY like the reference: a frame flagged by
        both heads is blurred twice. frames: [B, H, W, C] in any range;
        passthrough when unconfigured."""
        s = self.scores(frames)

        def blur(fr):
            chw = jnp.moveaxis(fr, -1, 1)
            out = jnp.moveaxis(gaussian_blur(chw, ksize=99, sigma=100.0), 1, -1)
            return out.astype(fr.dtype)

        # the reference applies the two heads' blurs SEQUENTIALLY (a frame
        # flagged by both is blurred twice), so the blur cannot be hoisted
        # or shared across the two passes; blurring the full batch and
        # selecting is the static-shape TPU form of "blur the flagged set"
        for flagged in (s[0] > self.p_threshold, s[1] > self.w_threshold):
            if flagged.any():
                mask = jnp.asarray(flagged)[:, None, None, None]
                frames = jnp.where(mask, blur(frames), frames)
        return frames


def embed_watermark(frames: jnp.ndarray, strength: float = 0.0) -> jnp.ndarray:
    """Watermark hook (helpers.py:16-59 drives the imwatermark DWT-DCT
    embedder with a fixed 48-bit message). strength <= 0 is the identity —
    the shipped VidSeg pipelines never watermark (the reference constructs
    but does not apply the filter on that path). strength > 0 embeds the
    reference's fixed message via the DWT-DCT scheme
    (utils/watermark.py) for images the decoder accepts (>= 256x256);
    smaller frames get a deterministic low-amplitude dither so presence
    checks still see a signal at toy sizes."""
    if strength <= 0.0:
        return frames
    h, w = frames.shape[-3:-1]
    if h * w >= 256 * 256 and frames.shape[-1] == 3:
        from vidseg_diffusion_tpu.utils.watermark import embed_watermark_frames

        out = embed_watermark_frames(np.asarray(frames, np.float64))
        return jnp.asarray(out, dtype=frames.dtype)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    pattern = (((yy * 7 + xx * 13) % 17) / 17.0 - 0.5) * strength
    return frames + pattern[..., None]
