"""Config system: reference-format YAML → framework objects.

The reference instantiates its model graph from OmegaConf YAML trees of
`{target: dotted.ClassName, params: {...}}` nodes via
`instantiate_from_config` (sgm/util.py:168-185; configs/inference/*.yaml).
This loader understands those same YAML files — a user can point it at the
reference's svd.yaml / sd_2_1.yaml unchanged — but resolves each known
`target` to this framework's counterpart and assembles typed configs instead
of a dynamic class graph. Unknown targets raise (no silent best-effort).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import yaml

from vidseg_diffusion_tpu.diffusion import (
    Denoiser,
    DiscreteDenoiser,
    EDMDiscretization,
    EDMScaling,
    EpsScaling,
    IdentityGuider,
    LegacyDDPMDiscretization,
    LinearPredictionGuider,
    VanillaCFG,
    VScaling,
    VScalingWithEDMcNoise,
)
from vidseg_diffusion_tpu.diffusion.sampling import (
    EulerAncestralSampler,
    EulerEDMSampler,
    HeunEDMSampler,
)
from vidseg_diffusion_tpu.models.unet import UNetConfig
from vidseg_diffusion_tpu.models.vae import VAEConfig


def _name(target: str) -> str:
    return target.rsplit(".", 1)[-1]


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def build_discretization(node: Dict[str, Any]):
    name = _name(node["target"])
    p = node.get("params") or {}
    if name == "EDMDiscretization":
        return EDMDiscretization(
            sigma_min=p.get("sigma_min", 0.002),
            sigma_max=p.get("sigma_max", 80.0),
            rho=p.get("rho", 7.0),
        )
    if name == "LegacyDDPMDiscretization":
        return LegacyDDPMDiscretization(
            linear_start=p.get("linear_start", 0.00085),
            linear_end=p.get("linear_end", 0.0120),
            num_timesteps=p.get("num_timesteps", 1000),
        )
    raise ValueError(f"unknown discretization target {node['target']}")


def build_scaling(node: Dict[str, Any]):
    name = _name(node["target"])
    cls = {
        "EDMScaling": EDMScaling,
        "EpsScaling": EpsScaling,
        "VScaling": VScaling,
        "VScalingWithEDMcNoise": VScalingWithEDMcNoise,
    }.get(name)
    if cls is None:
        raise ValueError(f"unknown scaling target {node['target']}")
    p = node.get("params") or {}
    return cls(**p)


def build_denoiser(node: Dict[str, Any]):
    name = _name(node["target"])
    p = node.get("params") or {}
    scaling = build_scaling(p["scaling_config"])
    if name == "Denoiser":
        return Denoiser(scaling=scaling)
    if name == "DiscreteDenoiser":
        return DiscreteDenoiser(
            scaling=scaling,
            discretization=build_discretization(p["discretization_config"]),
            num_idx=p.get("num_idx", 1000),
            quantize_c_noise=p.get("quantize_c_noise", True),
        )
    raise ValueError(f"unknown denoiser target {node['target']}")


def build_guider(node: Optional[Dict[str, Any]], num_frames: Optional[int] = None):
    if node is None:
        return IdentityGuider()
    name = _name(node["target"])
    p = dict(node.get("params") or {})
    if name == "VanillaCFG":
        return VanillaCFG(scale=p["scale"])
    if name == "LinearPredictionGuider":
        return LinearPredictionGuider(
            max_scale=p["max_scale"],
            num_frames=p.get("num_frames", num_frames),
            min_scale=p.get("min_scale", 1.0),
        )
    if name == "IdentityGuider":
        return IdentityGuider()
    raise ValueError(f"unknown guider target {node['target']}")


def build_sampler(
    node: Dict[str, Any],
    num_steps: Optional[int] = None,
    num_frames: Optional[int] = None,
):
    name = _name(node["target"])
    p = node.get("params") or {}
    disc = build_discretization(p["discretization_config"])
    guider = build_guider(p.get("guider_config"), num_frames=num_frames)
    steps = num_steps if num_steps is not None else p.get("num_steps", 25)
    kwargs = dict(
        discretization=disc,
        num_steps=steps,
        s_churn=p.get("s_churn", 0.0),
        s_tmin=p.get("s_tmin", 0.0),
        s_tmax=p.get("s_tmax", float("inf")),
        s_noise=p.get("s_noise", 1.0),
    )
    cls = {
        "EulerEDMSampler": EulerEDMSampler,
        "HeunEDMSampler": HeunEDMSampler,
        "EulerAncestralSampler": EulerAncestralSampler,
    }.get(name)
    if cls is None:
        raise ValueError(f"unknown sampler target {node['target']}")
    return cls(**kwargs), guider


def _uniform_context_dim(cd) -> int:
    """The reference accepts a per-level context_dim list (openaimodel.py
    ContextDim handling; sd_xl_refiner.yaml:32 uses [1280, 1280, 1280, 1280]).
    Every shipped config's list is uniform, and the model infers the actual
    dim from the context array — collapse to the scalar, reject non-uniform."""
    if isinstance(cd, (list, tuple)):
        if len(set(cd)) != 1:
            raise ValueError(f"non-uniform per-level context_dim unsupported: {cd}")
        return cd[0]
    return cd


def build_unet_config(node: Dict[str, Any], dtype=jnp.float32) -> UNetConfig:
    name = _name(node["target"])
    p = node.get("params") or {}
    video = name == "VideoUNet"
    return UNetConfig(
        in_channels=p["in_channels"],
        out_channels=p["out_channels"],
        model_channels=p["model_channels"],
        num_res_blocks=p["num_res_blocks"],
        attention_resolutions=tuple(p["attention_resolutions"]),
        channel_mult=tuple(p.get("channel_mult", (1, 2, 4, 8))),
        num_head_channels=p.get("num_head_channels", 64),
        transformer_depth=(
            tuple(p["transformer_depth"])
            if isinstance(p.get("transformer_depth"), list)
            else p.get("transformer_depth", 1)
        ),
        context_dim=_uniform_context_dim(p.get("context_dim", 1024)),
        adm_in_channels=p.get("adm_in_channels"),
        video=video,
        merge_strategy=p.get("merge_strategy", "learned_with_images"),
        merge_factor=p.get("merge_factor", 0.5),
        video_kernel_size=tuple(p.get("video_kernel_size", (3, 1, 1))),
        remat=bool(p.get("use_checkpoint", False)),
        dtype=dtype,
    )


def build_vae_config(node: Dict[str, Any], dtype=jnp.float32) -> VAEConfig:
    name = _name(node["target"])
    p = node.get("params") or {}
    if name in ("AutoencoderKL", "AutoencoderKLModeOnly"):
        dd = p["ddconfig"]
        video = False
        vks = (3, 1, 1)
    else:  # AutoencodingEngine with encoder/decoder configs (svd.yaml:97-133)
        dd = p["encoder_config"]["params"]
        dec = p["decoder_config"]
        video = _name(dec["target"]) == "VideoDecoder"
        vks = tuple(dec["params"].get("video_kernel_size", (3, 1, 1)))
    return VAEConfig(
        ch=dd["ch"],
        out_ch=dd["out_ch"],
        in_channels=dd["in_channels"],
        z_channels=dd["z_channels"],
        ch_mult=tuple(dd["ch_mult"]),
        num_res_blocks=dd["num_res_blocks"],
        double_z=dd.get("double_z", True),
        video_decoder=video,
        video_kernel_size=vks,
        dtype=dtype,
    )


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Everything parsed out of a reference-format model YAML."""

    unet_config: UNetConfig
    vae_config: VAEConfig
    denoiser: Any
    sampler: Any
    guider: Any
    scale_factor: float
    conditioner_node: Optional[Dict[str, Any]]
    ckpt_path: Optional[str]


def load_model_spec(
    path: str,
    num_steps: Optional[int] = None,
    num_frames: Optional[int] = None,
    dtype=jnp.float32,
) -> ModelSpec:
    """Parse a reference-format inference YAML (svd.yaml / sd_2_1.yaml).

    Mirrors load_model's programmatic overrides of sampler num_steps and
    guider num_frames (svd_single_video_inference.py:570-578)."""
    root = load_yaml(path)["model"]["params"]
    # sampler_config is Optional on DiffusionEngine (models/diffusion.py:40);
    # the reference's sd_xl_base/sd_xl_refiner/sd_2_1_768/svd_image_decoder
    # YAMLs omit it (demo/API code supplies the sampler at call time).
    if "sampler_config" in root:
        sampler, guider = build_sampler(
            root["sampler_config"], num_steps=num_steps, num_frames=num_frames
        )
    else:
        sampler, guider = None, None
    return ModelSpec(
        unet_config=build_unet_config(root["network_config"], dtype=dtype),
        vae_config=build_vae_config(root["first_stage_config"], dtype=dtype),
        denoiser=build_denoiser(root["denoiser_config"]),
        sampler=sampler,
        guider=guider,
        scale_factor=root.get("scale_factor", 0.18215),
        conditioner_node=root.get("conditioner_config"),
        ckpt_path=root.get("ckpt_path"),
    )
