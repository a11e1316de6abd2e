"""vidseg_diffusion_tpu — TPU-native zero-shot video semantic segmentation with
pre-trained diffusion models.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
QianWangX/VidSeg_diffusion (CVPR 2025, arXiv 2405.16947). The reference is a
single-GPU PyTorch fork of Stability-AI/generative-models that round-trips all
intermediate state (attention features, latents, masks) through the
filesystem; this framework keeps everything resident in HBM inside jitted
denoise loops, harvests attention Q/K as functional side-outputs instead of
module-attribute caches, runs clustering/KNN/tracking on device, and exposes
the embarrassingly-parallel (mask, ±λ) modulation axis as a sharded batch
dimension over a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  ops/        Pallas + XLA kernels: flash attention (with Q/K side outputs,
              injection, fused λ·mask epilogue), KMeans, KNN, Gaussian blur,
              dense cosine matching.
  diffusion/  σ discretizations, denoiser pre-conditioning scalings, CFG
              guiders, EDM samplers (scan-based), noise/inversion utilities.
  models/     Flax UNets (SD 2.1 image + SVD video), VAEs (incl. temporal
              video decoder), CLIP towers, conditioner.
  engine/     DiffusionEngine facade + the VidSeg pipeline engine
              (feature harvest → masks → vmapped modulated runs → diff maps).
  parallel/   Mesh construction and sharding rules.
  io/         Checkpoint conversion (torch/safetensors → pytree), frame IO.
"""

__version__ = "0.1.0"
