"""High-level inference API (txt2img / img2img / img2vid / refiner)."""

from vidseg_diffusion_tpu.inference.api import (
    SamplingParams,
    SamplingPipeline,
    Sampler,
    Discretization as APIDiscretization,
    Guider as APIGuider,
    Txt2NoisyDiscretizationWrapper,
    VideoSamplingParams,
)

__all__ = [
    "SamplingParams",
    "SamplingPipeline",
    "Sampler",
    "APIDiscretization",
    "APIGuider",
    "Txt2NoisyDiscretizationWrapper",
    "VideoSamplingParams",
]
