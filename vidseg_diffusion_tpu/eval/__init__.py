"""Evaluation metrics (mIoU, mVC) — the reference ships none (SURVEY.md §5:
outputs are raw-label PNGs for external VSPW tooling)."""

from vidseg_diffusion_tpu.eval.metrics import mean_iou, video_consistency

__all__ = ["mean_iou", "video_consistency"]
