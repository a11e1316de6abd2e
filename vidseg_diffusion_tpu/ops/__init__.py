"""TPU kernels and on-device numerics (Pallas + XLA)."""

from vidseg_diffusion_tpu.ops.attention import (
    dot_product_attention,
    flash_attention,
    mha_reference,
)

__all__ = ["dot_product_attention", "flash_attention", "mha_reference"]
