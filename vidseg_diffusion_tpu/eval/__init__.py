"""Evaluation metrics (mIoU, mVC, FID math) — the reference ships none
(SURVEY.md §5: outputs are raw-label PNGs for external VSPW tooling; FID
only as a thin pytorch_fid wrapper, modules.py:187-205)."""

from vidseg_diffusion_tpu.eval.fid import (
    clip_features,
    clip_fid,
    fid_from_features,
    frechet_distance,
)
from vidseg_diffusion_tpu.eval.metrics import mean_iou, video_consistency

__all__ = [
    "mean_iou",
    "video_consistency",
    "clip_features",
    "clip_fid",
    "fid_from_features",
    "frechet_distance",
]
