"""Segmentation metrics: mIoU and mVC (video consistency).

The reference repo has no evaluation code (SURVEY.md §5; README points at
the paper's VSPW protocol). These implement the standard VSPW metrics:

- mean_iou: per-class intersection-over-union averaged over classes present
  in ground truth (accumulated over all frames/videos via a confusion
  matrix).
- video_consistency (mVC_c): for every window of c consecutive frames, the
  ratio |∩ of correctly-labeled pixel sets| / |∩ of GT-consistent pixel
  sets| — the VSPW paper's clip consistency measure; averaged over windows.

Jitted on-device: confusion matrices are one-hot matmuls (MXU), window
intersections are logical ANDs under a scan.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(
    pred: jax.Array, gt: jax.Array, num_classes: int, ignore_label: int = 255
) -> jax.Array:
    """[num_classes, num_classes] confusion counts (rows = gt, cols = pred)."""
    pred = pred.reshape(-1)
    gt = gt.reshape(-1)
    valid = gt != ignore_label
    gt_c = jnp.where(valid, gt, 0)
    onehot_gt = jax.nn.one_hot(gt_c, num_classes, dtype=jnp.float32)
    onehot_gt = onehot_gt * valid[:, None]
    onehot_pred = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    return onehot_gt.T @ onehot_pred


def iou_from_confusion(cm: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(per-class IoU [C], presence mask [C])."""
    inter = jnp.diag(cm)
    union = jnp.sum(cm, axis=0) + jnp.sum(cm, axis=1) - inter
    present = jnp.sum(cm, axis=1) > 0  # class appears in GT
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)
    return iou, present


def mean_iou(
    pred: jax.Array, gt: jax.Array, num_classes: int, ignore_label: int = 255
) -> float:
    """mIoU over classes present in GT."""
    cm = confusion_matrix(pred, gt, num_classes, ignore_label)
    iou, present = iou_from_confusion(cm)
    denom = jnp.maximum(jnp.sum(present), 1)
    return float(jnp.sum(jnp.where(present, iou, 0.0)) / denom)


@functools.partial(jax.jit, static_argnames=("clip_len",))
def _vc_windows(pred: jax.Array, gt: jax.Array, clip_len: int):
    """Per-window (numerator, denominator) pairs, [T - clip_len + 1] each.

    VSPW VC semantics (paper §4 / official VSPW_code get_common): a window's
    score is |pred-consistent ∧ gt-consistent| / |gt-consistent|, where
    "consistent" means the SAME label across every frame of the window —
    the prediction need not equal ground truth, only be as temporally
    stable as ground truth is. (An earlier revision here additionally
    required pred == gt, which is strictly harsher than the metric of
    record; validated against the literal-loop oracle in
    tests/test_eval_and_vspw.py.)"""
    t = gt.shape[0]

    def window_score(start):
        p = jax.lax.dynamic_slice_in_dim(pred, start, clip_len, axis=0)
        g = jax.lax.dynamic_slice_in_dim(gt, start, clip_len, axis=0)
        gt_consistent = jnp.all(g == g[0:1], axis=0)
        pred_consistent = jnp.all(p == p[0:1], axis=0)
        num = jnp.sum(pred_consistent & gt_consistent)
        den = jnp.sum(gt_consistent)
        return num.astype(jnp.float32), den.astype(jnp.float32)

    starts = jnp.arange(t - clip_len + 1)
    return jax.vmap(window_score)(starts)


def video_consistency(
    pred: jax.Array, gt: jax.Array, clip_len: int = 8
) -> Optional[float]:
    """mVC_c for one video: pred/gt [T, H, W]. None if T < clip_len.

    Windows with no GT-consistent pixel are excluded from the mean (the
    official code's 0/0 → NaN under a nanmean); None if every window is
    excluded."""
    if gt.shape[0] < clip_len:
        return None
    num, den = _vc_windows(pred, gt, clip_len)
    valid = den > 0
    n_valid = int(jnp.sum(valid))
    if n_valid == 0:
        return None
    scores = jnp.where(valid, num / jnp.maximum(den, 1.0), 0.0)
    return float(jnp.sum(scores) / n_valid)


class SegmentationEvaluator:
    """Accumulating evaluator for a VSPW-style sweep: feed per-video
    (pred, gt) label maps, read mIoU / mVC_8 / mVC_16 at the end."""

    def __init__(self, num_classes: int, ignore_label: int = 255):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self._cm = None
        self._vc8 = []
        self._vc16 = []

    def add_video(self, pred, gt):
        cm = confusion_matrix(
            jnp.asarray(pred), jnp.asarray(gt), self.num_classes, self.ignore_label
        )
        self._cm = cm if self._cm is None else self._cm + cm
        for store, c in ((self._vc8, 8), (self._vc16, 16)):
            vc = video_consistency(jnp.asarray(pred), jnp.asarray(gt), c)
            if vc is not None:
                store.append(vc)

    @property
    def has_videos(self) -> bool:
        return self._cm is not None

    def results(self):
        if self._cm is None:
            return {}
        iou, present = iou_from_confusion(self._cm)
        denom = max(int(jnp.sum(present)), 1)
        miou = float(jnp.sum(jnp.where(present, iou, 0.0)) / denom)
        out = {"mIoU": miou}
        if self._vc8:
            out["mVC_8"] = sum(self._vc8) / len(self._vc8)
        if self._vc16:
            out["mVC_16"] = sum(self._vc16) / len(self._vc16)
        return out
