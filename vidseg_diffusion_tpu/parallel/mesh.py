"""Mesh + sharding for the VidSeg workload.

The reference has no distributed code at all (SURVEY.md §2.6 — manual
--exp_start_idx/--num_exp job slicing is its only "parallelism",
sd_pipeline_vspw.py:651-652). The TPU-native scaling story is GSPMD over a
2-D mesh:

  ('data', 'runs'):
    data  — videos of a VSPW shard (pure data parallelism, no collectives
            on the hot path; metric all-gathers ride ICI at the end)
    runs  — the 2·num_masks (mask, ±λ) modulated denoising runs of one
            video: identical latents, different masks/λ — embarrassingly
            parallel (the reference runs these serially,
            svd_single_video_inference.py:438-500)

Parameters are replicated (the 1.5B SVD UNet fits on one chip in bf16); XLA
inserts no communication inside the denoise scan.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data", "runs"),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    devices = np.asarray(devices[:n])
    if shape is None:
        shape = (1,) * (len(axes) - 1) + (n,)
    assert int(np.prod(shape)) == n, (shape, n)
    return Mesh(devices.reshape(shape), axis_names=tuple(axes))


def runs_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading runs axis [2·M, ...]."""
    return NamedSharding(mesh, P("runs"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading video/batch axis."""
    return NamedSharding(mesh, P("data"))
