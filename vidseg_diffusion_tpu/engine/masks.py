"""Mask extraction: the three feature→mask modes, on device.

Counterparts of scripts/sampling/feature_extraction.py:
- kmeans_masks (save_inidividual_masks_kmeans :30-113): joint KMeans over all
  frames' cond-half tokens → per-frame binary masks.
- match_gt_mask (:546-643): KMeans → majority-vote label transfer from a
  first-frame GT mask → KNN(4) propagation to every frame; carried
  (ref_mask, ref_feature_map) state chains sliding-window batches
  (svd_pipeline_vspw.py:229-232).
- correct_low_res_mask (:367-461): dense tracking + trajectory majority
  vote, via ops/matching.

Features arrive as the harvested [2T, L, C] spatial-attention Q (uc half
first); masks leave as [K, T, L] float binaries — the exact payloads the
reference round-trips through mask_{i}.png files.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidseg_diffusion_tpu.ops.kmeans import kmeans_fit
from vidseg_diffusion_tpu.ops.knn import knn_predict
from vidseg_diffusion_tpu.ops.matching import (
    dense_tracking,
    positive_jump_filter,
    trajectory_majority_vote,
)


def _normalize(features: jnp.ndarray) -> jnp.ndarray:
    """Per-token max-abs channel normalization (feature_extraction.py:39)."""
    return features / jnp.max(jnp.abs(features), axis=-1, keepdims=True)


def aggregate_blocks(features: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """--is_aggre_attn: mean over blocks (feature_extraction.py:739-745)."""
    return jnp.mean(jnp.stack(list(features)), axis=0)


def kmeans_masks(
    rng: jax.Array,
    features: jnp.ndarray,  # [2T, L, C] spatial q (uc half first)
    num_masks: int,
    num_frames: int,
) -> Tuple[jnp.ndarray, np.ndarray]:
    """Joint KMeans over the cond half's tokens. Returns (masks [K, T, L],
    unique_labels [K]) — feature_extraction.py:44-85, 112."""
    cond = _normalize(features.astype(jnp.float32))[num_frames:]
    flat = cond.reshape(-1, cond.shape[-1])
    _, labels, _ = kmeans_fit(rng, flat, k=num_masks)
    labels = labels.reshape(num_frames, -1)  # [T, L]
    masks = jax.nn.one_hot(labels, num_masks, axis=0, dtype=jnp.float32)
    return masks, np.arange(num_masks)


@dataclasses.dataclass
class GTMatchState:
    """Carried cross-batch state (ref_mask/ref_feature_map/ref_unique_labels,
    svd_pipeline_vspw.py:229-232). ref_mask holds dense label *indices* into
    unique_labels (on-device KNN wants dense classes); unique_labels maps
    back to original VSPW ids."""

    ref_features: jnp.ndarray  # [N, C]
    ref_labels: jnp.ndarray    # [N] dense indices
    unique_labels: np.ndarray  # [K] original label ids


def match_gt_mask(
    rng: jax.Array,
    features: jnp.ndarray,  # [2T, L, C]
    num_masks: int,
    num_frames: int,
    gt_mask: Optional[np.ndarray] = None,  # [L] original label ids, frame 0
    state: Optional[GTMatchState] = None,
    knn_k: int = 4,
) -> Tuple[jnp.ndarray, GTMatchState]:
    """First batch: KMeans clusters → majority-overlap mapping to GT labels
    (feature_extraction.py:589-595) → KNN propagation to all frames
    (:608-613). Later batches: KNN against the carried state (:567-613).

    Returns (masks [K, T, L] in unique_labels order, new state)."""
    cond = _normalize(features.astype(jnp.float32))[num_frames:]  # [T, L, C]
    flat = cond.reshape(-1, cond.shape[-1])
    l = cond.shape[1]

    if state is None:
        _, km_labels, _ = kmeans_fit(rng, flat, k=num_masks)
        frame0_clusters = np.asarray(km_labels[:l])
        if gt_mask is not None:
            gt = np.asarray(gt_mask).reshape(-1)
        else:
            gt = frame0_clusters
        # majority-overlap cluster→gt mapping (feature_extraction.py:589-595)
        ref_mask = np.zeros(l, dtype=np.int64)
        for cl in np.unique(frame0_clusters):
            sub = gt[frame0_clusters == cl]
            vals, counts = np.unique(sub, return_counts=True)
            ref_mask[frame0_clusters == cl] = vals[np.argmax(counts)]
        unique_labels = np.unique(ref_mask)
        dense = np.searchsorted(unique_labels, ref_mask)
        state = GTMatchState(
            ref_features=cond[0],
            ref_labels=jnp.asarray(dense),
            unique_labels=unique_labels,
        )

    k_classes = len(state.unique_labels)
    pred = knn_predict(
        state.ref_features, state.ref_labels, flat, k=knn_k,
        num_classes=max(k_classes, 1),
    )  # [T·L] dense indices
    labels = pred.reshape(num_frames, l)
    masks = jax.nn.one_hot(labels, k_classes, axis=0, dtype=jnp.float32)
    new_state = GTMatchState(
        ref_features=flat,
        ref_labels=pred,
        unique_labels=state.unique_labels,
    )
    return masks, new_state


def correct_low_res_mask(
    features: jnp.ndarray,   # [2T, L, C] spatial q of the tracking block
    masks: jnp.ndarray,      # [K, T, L] current binary masks
    num_frames: int,
    width: int,              # token-grid width (feature_width)
) -> jnp.ndarray:
    """--is_refine_mask: track every token, drop positive-jump trajectories,
    majority-vote-relabel along survivors (feature_extraction.py:367-461).
    Returns refined masks [K, T, L]."""
    k = masks.shape[0]
    cond = _normalize(features.astype(jnp.float32))[num_frames:]
    seg = jnp.argmax(masks, axis=0).astype(jnp.int32)  # [T, L] dense
    traj = dense_tracking(cond, use_aux=True)  # [T, P]
    keep = positive_jump_filter(traj, width=width, threshold=1)
    new_seg = trajectory_majority_vote(traj, seg, keep, num_classes=k)
    return jax.nn.one_hot(new_seg, k, axis=0, dtype=jnp.float32)
