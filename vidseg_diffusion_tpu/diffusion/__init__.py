"""Diffusion math: σ schedules, denoiser scalings, guidance, samplers."""

from vidseg_diffusion_tpu.diffusion.discretization import (
    EDMDiscretization,
    LegacyDDPMDiscretization,
)
from vidseg_diffusion_tpu.diffusion.scaling import (
    EDMScaling,
    EpsScaling,
    VScaling,
    VScalingWithEDMcNoise,
)
from vidseg_diffusion_tpu.diffusion.guidance import (
    IdentityGuider,
    LinearPredictionGuider,
    VanillaCFG,
)
from vidseg_diffusion_tpu.diffusion.denoiser import Denoiser, DiscreteDenoiser

__all__ = [
    "EDMDiscretization",
    "LegacyDDPMDiscretization",
    "EDMScaling",
    "EpsScaling",
    "VScaling",
    "VScalingWithEDMcNoise",
    "IdentityGuider",
    "LinearPredictionGuider",
    "VanillaCFG",
    "Denoiser",
    "DiscreteDenoiser",
]
