"""Conditioner: embedders + routing (vector/crossattn/concat).

Counterpart of sgm/modules/encoders/modules.py GeneralConditioner (:71-184)
and the embedders the shipped configs use:
- ConcatTimestepEmbedderND (:913-929) — sinusoidal embeddings of fps_id /
  motion_bucket_id / cond_aug scalars → 'vector'
- FrozenOpenCLIPImagePredictionEmbedder (:1028-1045) + ImageEmbedder
  (:570-728) — CLIP ViT-H pooled image embedding of the cond frame →
  'crossattn' [b, 1, 1024]
- VideoPredictionEmbedderWithEncoder (:951-1025) — VAE-encode the (noised)
  cond frame → 'concat' channels
- FrozenOpenCLIPEmbedder (:498-566) — text tokens → 'crossattn' [b, 77, 1024]
  (SD 2.1; penultimate layer)

Functional: each embedder is (params, batch) → embedding; the conditioner
routes outputs by rank exactly like OUTPUT_DIM2KEYS (2→vector, 3→crossattn,
4/5→concat) and concatenates along KEY2CATDIM. `get_unconditional_conditioning`
zeroes the *outputs* of the force-zero keys (modules.py:154-157, 166-184).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vidseg_diffusion_tpu.models.layers import timestep_embedding

Batch = Dict[str, jnp.ndarray]


def concat_timestep_embedder(x: jnp.ndarray, outdim: int = 256) -> jnp.ndarray:
    """Each scalar dim embedded sinusoidally and concatenated
    (ConcatTimestepEmbedderND, modules.py:913-929)."""
    if x.ndim == 1:
        x = x[:, None]
    b, dims = x.shape
    emb = timestep_embedding(x.reshape(-1), outdim)
    return emb.reshape(b, dims * outdim)


@dataclasses.dataclass(frozen=True)
class EmbedderSpec:
    """One conditioner entry. `fn(batch_value) -> emb` closes over any model
    params (CLIP towers, VAE encoder)."""

    input_key: str
    fn: Callable[[jnp.ndarray], jnp.ndarray]
    # output rank → routing key is derived from the produced array
    name: str = ""


_DIM2KEY = {2: "vector", 3: "crossattn", 4: "concat", 5: "concat"}
_KEY2AXIS = {"vector": 1, "crossattn": 2, "concat": 1}
# NHWC layout: 'concat' embeddings concatenate on channels = axis -1
_KEY2AXIS_NHWC = {"vector": 1, "crossattn": 2, "concat": 3}


@dataclasses.dataclass(frozen=True)
class Conditioner:
    embedders: Tuple[EmbedderSpec, ...]
    kind: str = ""  # "svd" | "sd_text" | "sdxl" — CLI/API routing hint

    def __call__(
        self, batch: Batch, force_zero_embeddings: Sequence[str] = ()
    ) -> Dict[str, jnp.ndarray]:
        output: Dict[str, jnp.ndarray] = {}
        for spec in self.embedders:
            emb_out = spec.fn(batch[spec.input_key])
            # an embedder may emit several routed outputs (SDXL bigG text
            # tower → crossattn hidden + vector pooled; modules.py:142-152
            # iterates emb_out as a tuple)
            if not isinstance(emb_out, (list, tuple)):
                emb_out = (emb_out,)
            for emb in emb_out:
                key = _DIM2KEY[emb.ndim]
                if spec.input_key in force_zero_embeddings:
                    emb = jnp.zeros_like(emb)
                axis = _KEY2AXIS_NHWC.get(key, 1) if emb.ndim >= 4 else _KEY2AXIS[key]
                if key in output:
                    output[key] = jnp.concatenate([output[key], emb], axis=axis)
                else:
                    output[key] = emb
        return output

    def get_unconditional_conditioning(
        self,
        batch_c: Batch,
        batch_uc: Optional[Batch] = None,
        force_uc_zero_embeddings: Sequence[str] = (),
        force_cond_zero_embeddings: Sequence[str] = (),
    ):
        c = self(batch_c, force_cond_zero_embeddings)
        uc = self(batch_uc if batch_uc is not None else batch_c, force_uc_zero_embeddings)
        return c, uc


def build_svd_conditioner(
    clip_image_fn: Callable[[jnp.ndarray], jnp.ndarray],
    vae_encode_fn: Callable[[jnp.ndarray], jnp.ndarray],
    cond_aug_rng: Optional[jax.Array] = None,
) -> Conditioner:
    """SVD conditioner (configs/inference/svd.yaml:36-96).

    clip_image_fn: [-1,1] frames [b,h,w,3] → [b, 1024] pooled CLIP emb
    vae_encode_fn: frames [b,h,w,3] → [b, h/8, w/8, 4] mode-encoded latents
                   (AutoencoderKLModeOnly, svd.yaml:73)
    """

    def clip_pred(frames):
        z = clip_image_fn(frames)  # [b, 1024]
        return z[:, None, :]  # n_cond_frames=1, n_copies=1 → [b, 1, 1024]

    return Conditioner(
        embedders=(
            EmbedderSpec("cond_frames_without_noise", clip_pred, name="clip_img"),
            EmbedderSpec(
                "fps_id", lambda v: concat_timestep_embedder(v, 256), name="fps"
            ),
            EmbedderSpec(
                "motion_bucket_id",
                lambda v: concat_timestep_embedder(v, 256),
                name="motion",
            ),
            EmbedderSpec("cond_frames", vae_encode_fn, name="vae_cond"),
            EmbedderSpec(
                "cond_aug", lambda v: concat_timestep_embedder(v, 256), name="aug"
            ),
        ),
        kind="svd",
    )


def build_sd_text_conditioner(
    clip_text_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> Conditioner:
    """SD 2.1 conditioner: one frozen OpenCLIP text embedder
    (configs/inference/sd_2_1.yaml:33-40)."""
    return Conditioner(
        embedders=(EmbedderSpec("txt_tokens", clip_text_fn, name="clip_text"),),
        kind="sd_text",
    )


def build_t5_text_conditioner(
    t5_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> Conditioner:
    """T5/ByT5 text conditioner (FrozenT5Embedder / FrozenByT5Embedder,
    modules.py:249-328): pre-tokenized ids → last hidden state
    [b, 77, d_model] routed to crossattn."""
    return Conditioner(
        embedders=(EmbedderSpec("txt_t5_tokens", t5_fn, name="t5_text"),),
        kind="t5_text",
    )


def build_class_conditioner(
    class_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> Conditioner:
    """Class-label conditioner (ClassEmbedder, modules.py:215-234):
    integer labels → embedding (vector or crossattn depending on
    add_sequence_dim, routed by rank like everything else)."""
    return Conditioner(
        embedders=(EmbedderSpec("cls", class_fn, name="class_emb"),),
        kind="class",
    )


def build_sdxl_refiner_conditioner(
    clip_g_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    size_outdim: int = 256,
) -> Conditioner:
    """SDXL refiner conditioner (configs/inference/sd_xl_refiner.yaml:36-63):
    bigG text tower only (no CLIP-L), and the target-size embedder replaced
    by an aesthetic-score embedder. Routing: crossattn = bigG hidden 1280 =
    context_dim; vector = [bigG pooled 1280 | orig 512 | crop 512 |
    aesthetic 256] = 2560 = adm_in_channels."""
    return Conditioner(
        embedders=(
            EmbedderSpec("txt_tokens", clip_g_fn, name="clip_g"),
            EmbedderSpec(
                "original_size_as_tuple",
                lambda v: concat_timestep_embedder(v, size_outdim),
                name="orig_size",
            ),
            EmbedderSpec(
                "crop_coords_top_left",
                lambda v: concat_timestep_embedder(v, size_outdim),
                name="crop_coords",
            ),
            EmbedderSpec(
                "aesthetic_score",
                lambda v: concat_timestep_embedder(v, size_outdim),
                name="aesthetic",
            ),
        ),
        kind="sdxl_refiner",
    )


def build_sdxl_conditioner(
    clip_l_fn: Callable[[jnp.ndarray], jnp.ndarray],
    clip_g_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    size_outdim: int = 256,
) -> Conditioner:
    """SDXL dual-text conditioner (configs/inference/sd_xl_base.yaml:35-73 +
    modules.py:330-496).

    clip_l_fn: tokens [b, 77] → hidden [b, 77, 768]
               (FrozenCLIPEmbedder, layer='hidden', layer_idx=11)
    clip_g_fn: tokens [b, 77] → (hidden [b, 77, 1280], pooled [b, 1280])
               (FrozenOpenCLIPEmbedder2 ViT-bigG, penultimate + pooled)

    Routing by rank reproduces the reference concatenation: crossattn =
    [CLIP-L 768 | bigG 1280] = 2048 = context_dim; vector = [bigG pooled 1280
    | orig 512 | crop 512 | target 512] = 2816 = adm_in_channels.

    Both text towers read the same token batch — in the reference both
    embedders share input_key 'txt'; token ids are identical because the two
    vocabs share the CLIP BPE."""
    return Conditioner(
        embedders=(
            EmbedderSpec("txt_tokens", clip_l_fn, name="clip_l"),
            EmbedderSpec("txt_tokens", clip_g_fn, name="clip_g"),
            EmbedderSpec(
                "original_size_as_tuple",
                lambda v: concat_timestep_embedder(v, size_outdim),
                name="orig_size",
            ),
            EmbedderSpec(
                "crop_coords_top_left",
                lambda v: concat_timestep_embedder(v, size_outdim),
                name="crop_coords",
            ),
            EmbedderSpec(
                "target_size_as_tuple",
                lambda v: concat_timestep_embedder(v, size_outdim),
                name="target_size",
            ),
        ),
        kind="sdxl",
    )
