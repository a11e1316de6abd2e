"""High-level inference API (txt2img / img2img / img2vid)."""

from vidseg_diffusion_tpu.inference.api import (
    SamplingParams,
    SamplingPipeline,
    Sampler,
    Discretization as APIDiscretization,
    Guider as APIGuider,
)

__all__ = [
    "SamplingParams",
    "SamplingPipeline",
    "Sampler",
    "APIDiscretization",
    "APIGuider",
]
