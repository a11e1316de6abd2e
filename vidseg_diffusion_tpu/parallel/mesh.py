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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` with the standard
    TPU-pod auto-discovery (all args None on Cloud TPU). Safe to call twice.

    After this, `jax.devices()` spans the pod slice; the VidSeg sweep shards
    videos per process (`process_shard`, pipelines/vspw.py) over DCN and the
    runs mesh rides ICI within each host's chips."""
    import jax.distributed

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def process_slice(n_items: int) -> slice:
    """This process's contiguous shard of a length-n work list (balanced
    round-down split; the TPU-native replacement for the reference's manual
    --exp_start_idx/--num_exp bookkeeping, sd_pipeline_vspw.py:651-652)."""
    pc, pi = jax.process_count(), jax.process_index()
    base, rem = divmod(n_items, pc)
    start = pi * base + min(pi, rem)
    return slice(start, start + base + (1 if pi < rem else 0))
