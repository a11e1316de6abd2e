"""VidSeg modulation/injection schedule construction.

Turns the reference's `modulate_params` dict-of-Python-objects plumbing
(svd_single_video_inference.py:458-483; sgm/util.py:313-326 modulate
timestep-frame schedules; diffusionmodules/util.py:383-392 λ schedules) into
dense gate arrays consumed by the scan-based denoise loop:

- λ over frames:        lam[T]           (constant | linear)
- step gate:            modulate_step[num_steps] bool (i ∈ modulate_timestep)
- (step, frame) gate:   step_frames[num_steps, T] bool
                        (modulate_timestep_frames schedule)
- injection step gate:  inject_step[num_steps] bool (i ≥ min(modulate_timestep))
- blend step gate:      latent_mask_start ≤ i ≤ latent_mask_end

Block / layer-type / attn-type gating is static (it decides which UNetHooks
entries exist), mirroring the reference's `i in modulate_block_idx` and
string-membership tests.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def modulate_lambda_schedule(
    lambda_start: float,
    lambda_end: float,
    schedule: str,
    num_frames: int,
) -> jnp.ndarray:
    """Per-frame λ (diffusionmodules/util.py:383-392): constant, or linear in
    the frame index f: λ_f = start + (end-start)·f/num_frames."""
    if schedule == "constant":
        return jnp.full((num_frames,), lambda_start, dtype=jnp.float32)
    if schedule == "linear":
        f = np.arange(num_frames, dtype=np.float32)
        return jnp.asarray(lambda_start + (lambda_end - lambda_start) * f / num_frames)
    raise ValueError(f"unknown modulate schedule {schedule!r}")


def modulate_timestep_frames_table(
    num_steps: int,
    num_frames: int,
    modulate_timesteps: Sequence[int],
    schedule: str = "constant",
    start_timestep: int = 20,
    end_timestep: int = 15,
) -> np.ndarray:
    """[num_steps, T] bool: frame f is modulated at step i.

    'constant': every frame at every i ∈ modulate_timesteps
    (sampling.py:190-194 with empty modulate_timestep_frames).
    'linear': frame f assigned to timestep round down of
    start + (end-start)·f/(T-1) (sgm/util.py:316-326); modulation happens at
    exactly the assigned step."""
    table = np.zeros((num_steps, num_frames), dtype=bool)
    if schedule == "constant":
        for i in modulate_timesteps:
            table[i, :] = True
    elif schedule == "linear":
        for f in range(num_frames):
            i = int(start_timestep + (end_timestep - start_timestep) * f / (num_frames - 1))
            table[i, f] = True
    else:
        raise ValueError(f"unknown timestep-frames schedule {schedule!r}")
    return table


@dataclasses.dataclass(frozen=True)
class ModulationConfig:
    """Static VidSeg modulation configuration (CLI-parity knobs,
    svd_single_video_inference.py:46-63, 600-625)."""

    modulate_block_idx: Tuple[int, ...] = (8,)
    modulate_timestep: Tuple[int, ...] = (17,)
    feature_timestep: Tuple[int, ...] = (24,)
    modulate_schedule: str = "constant"  # λ over frames
    modulate_lambda_start: float = 50.0
    modulate_lambda_end: float = 50.0
    modulate_layer_type: Tuple[str, ...] = ("spatial",)  # and/or "temporal"
    modulate_attn_type: Tuple[str, ...] = ("cross_attn",)  # self_attn/cross_attn/ff_out
    modulate_timestep_frames_schedule: str = "constant"
    modulate_uc: bool = True
    num_steps: int = 25
    num_frames: int = 14
    is_injected_features: bool = False
    injected_block_types: Tuple[str, ...] = ("output",)
    # effective SVD injection: only temporal self-attn Q/K are ever consumed
    # (video_attention.py:166-195; the loaded temporal_cross features are
    # never routed into an attention site — quirk preserved by not
    # harvesting them)
    injected_feature_types: Tuple[str, ...] = (
        "temporal_self_attn_q", "temporal_self_attn_k",
    )
    input_block_indices: Tuple[int, ...] = (1, 2, 4, 5, 7, 8, 10, 11)
    output_block_indices: Tuple[int, ...] = tuple(range(1, 12))
    is_latent_blending: bool = True
    latent_mask_start: Optional[int] = None  # default: min(modulate_timestep)
    latent_mask_end: Optional[int] = None    # SVD: num_steps; SD: min(mt)+1

    def lam(self) -> jnp.ndarray:
        return modulate_lambda_schedule(
            self.modulate_lambda_start, self.modulate_lambda_end,
            self.modulate_schedule, self.num_frames,
        )

    def step_frame_table(self) -> jnp.ndarray:
        return jnp.asarray(
            modulate_timestep_frames_table(
                self.num_steps, self.num_frames, self.modulate_timestep,
                self.modulate_timestep_frames_schedule,
            )
        )

    def inject_gate_for_step(self, i) -> jnp.ndarray:
        return jnp.asarray(i >= min(self.modulate_timestep)) & jnp.asarray(
            self.is_injected_features
        )

    def inject_step_static(self, i: int) -> bool:
        """Python-level inject gate for host-stepped dispatch (same rule as
        inject_gate_for_step: i >= min(modulate_timestep),
        sampling.py:185-194)."""
        return self.is_injected_features and i >= min(self.modulate_timestep)

    def blend_window(self) -> Tuple[int, int]:
        start = (
            self.latent_mask_start
            if self.latent_mask_start is not None
            else min(self.modulate_timestep)
        )
        end = (
            self.latent_mask_end
            if self.latent_mask_end is not None
            else self.num_steps
        )
        return start, end

    def block_resolution_divisor(self, block_idx: int) -> int:
        """Latent-to-token downscale per modulated output block
        (svd_single_video_inference.py:84-95, 484-495): blocks 0-2 → /8,
        3-5 → /4, 6-8 → /2, 9-11 → /1."""
        if block_idx in (0, 1, 2):
            return 8
        if block_idx in (3, 4, 5):
            return 4
        if block_idx in (6, 7, 8):
            return 2
        if block_idx in (9, 10, 11):
            return 1
        raise ValueError(block_idx)
