"""Enum-driven sampling API.

Counterpart of sgm/inference/api.py (:19-385): typed SamplingParams, sampler
/ discretization / guider enums, and a SamplingPipeline exposing
text_to_image / image_to_image over an assembled Pipeline. The heavy lifting
(jitted CFG sampling) is shared with the VidSeg engine's denoise plumbing.
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from vidseg_diffusion_tpu.diffusion import (
    EDMDiscretization,
    IdentityGuider,
    LegacyDDPMDiscretization,
    LinearPredictionGuider,
    VanillaCFG,
)
from vidseg_diffusion_tpu.diffusion.sampling import (
    EulerAncestralSampler,
    EulerEDMSampler,
    HeunEDMSampler,
)
from vidseg_diffusion_tpu.diffusion.sampling_extra import (
    DPMPP2MSampler,
    DPMPP2SAncestralSampler,
    LinearMultistepSampler,
)
from vidseg_diffusion_tpu.engine.build import Pipeline


class Sampler(str, Enum):
    EULER_EDM = "EulerEDMSampler"
    HEUN_EDM = "HeunEDMSampler"
    EULER_ANCESTRAL = "EulerAncestralSampler"
    DPMPP2S_ANCESTRAL = "DPMPP2SAncestralSampler"
    DPMPP2M = "DPMPP2MSampler"
    LINEAR_MULTISTEP = "LinearMultistepSampler"


class Discretization(str, Enum):
    LEGACY_DDPM = "LegacyDDPMDiscretization"
    EDM = "EDMDiscretization"


class Guider(str, Enum):
    VANILLA = "VanillaCFG"
    IDENTITY = "IdentityGuider"


_SAMPLERS = {
    Sampler.EULER_EDM: EulerEDMSampler,
    Sampler.HEUN_EDM: HeunEDMSampler,
    Sampler.EULER_ANCESTRAL: EulerAncestralSampler,
    Sampler.DPMPP2S_ANCESTRAL: DPMPP2SAncestralSampler,
    Sampler.DPMPP2M: DPMPP2MSampler,
    Sampler.LINEAR_MULTISTEP: LinearMultistepSampler,
}


@dataclasses.dataclass
class SamplingParams:
    """sgm/inference/api.py SamplingParams counterpart."""

    width: int = 512
    height: int = 512
    steps: int = 40
    sampler: Sampler = Sampler.EULER_EDM
    discretization: Discretization = Discretization.LEGACY_DDPM
    guider: Guider = Guider.VANILLA
    scale: float = 5.0
    eta: float = 1.0
    img2img_strength: float = 1.0
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = 999.0
    s_noise: float = 1.0
    # SDXL size/crop conditioning (reference api.py:62-66)
    orig_width: int = 1024
    orig_height: int = 1024
    crop_coords_top: int = 0
    crop_coords_left: int = 0
    # SDXL refiner aesthetic conditioning (reference api.py:60-61; the
    # refiner() call overrides these to 6.0 / 2.5, api.py:245-268)
    aesthetic_score: float = 5.0
    negative_aesthetic_score: float = 5.0


class SamplingPipeline:
    """txt2img / img2img over an assembled Pipeline (api.py:164-385)."""

    def __init__(self, pipeline: Pipeline):
        self.pipeline = pipeline

    def _make_sampler(self, params: SamplingParams):
        if params.discretization == Discretization.EDM:
            disc = EDMDiscretization(params.sigma_min, params.sigma_max, params.rho)
        else:
            disc = LegacyDDPMDiscretization()
        cls = _SAMPLERS[params.sampler]
        kwargs = dict(
            discretization=disc, num_steps=params.steps,
            s_churn=params.s_churn, s_tmin=params.s_tmin,
            s_tmax=params.s_tmax, s_noise=params.s_noise,
        )
        if params.sampler in (Sampler.EULER_ANCESTRAL, Sampler.DPMPP2S_ANCESTRAL):
            kwargs["eta"] = params.eta
        return cls(**kwargs)

    def _guider(self, params: SamplingParams):
        if params.guider == Guider.VANILLA:
            return VanillaCFG(scale=params.scale)
        return IdentityGuider()

    def _denoise_fn(self, c: Dict, uc: Dict, guider):
        p = self.pipeline

        def denoise_fn(x, sigma, i):
            b = x.shape[0]
            s = jnp.full((b,), sigma, dtype=x.dtype)
            x_in, s_in, cond = guider.prepare_inputs(x, s, c, uc)

            def network(xs, c_noise, cond_d):
                if "concat" in cond_d:
                    xs = jnp.concatenate([xs, cond_d["concat"].astype(xs.dtype)], -1)
                return p.unet.apply(
                    {"params": p.unet_params}, xs, c_noise,
                    cond_d.get("crossattn"), cond_d.get("vector"),
                )

            out = p.spec.denoiser(network, x_in, s_in, cond)
            return guider(out, sigma), None

        return denoise_fn

    def _make_cond(self, params: SamplingParams, prompt_tokens,
                   negative_prompt_tokens, batch_size: int):
        """c/uc for the CFG pair. SD 2.1: single text crossattn. SDXL:
        the dual-text conditioner with size/crop vector embeddings and
        force-zeroed uc text (reference api.py:188-241,
        force_uc_zero_embeddings=['txt'] for non-legacy specs)."""
        p = self.pipeline
        cond = p.conditioner
        if negative_prompt_tokens is None:
            # reference uc = embedding of the EMPTY prompt, not a zero
            # embedding: frame [sot, eot, pad...] with the prompt's own
            # sot/eot ids (eot = max id per the CLIP pooling convention)
            pt = jnp.asarray(prompt_tokens)
            negative_prompt_tokens = (
                jnp.zeros_like(pt)
                .at[:, 0].set(pt[:, 0])
                .at[:, 1].set(jnp.max(pt, axis=1))
            )
        kind = getattr(cond, "kind", "") if cond is not None else ""
        if kind in ("sdxl", "sdxl_refiner"):
            refiner = kind == "sdxl_refiner"

            def pair(a, b):
                return jnp.array([[float(a), float(b)]])

            batch_c = {
                "txt_tokens": jnp.asarray(prompt_tokens),
                "original_size_as_tuple": pair(params.orig_height, params.orig_width),
                "crop_coords_top_left": pair(params.crop_coords_top, params.crop_coords_left),
            }
            if refiner:
                batch_c["aesthetic_score"] = jnp.array([[params.aesthetic_score]])
                batch_uc = dict(
                    batch_c,
                    aesthetic_score=jnp.array(
                        [[params.negative_aesthetic_score]]
                    ),
                )
            else:
                batch_c["target_size_as_tuple"] = pair(params.height, params.width)
                batch_uc = dict(batch_c)
            batch_uc["txt_tokens"] = jnp.asarray(negative_prompt_tokens)
            # the refiner spec is legacy (is_legacy=True): its uc text is
            # the negative/empty prompt, NOT force-zeroed (reference
            # api.py:245-277 calls do_img2img with
            # force_uc_zero_embeddings=[]); zeroing silently discarded the
            # negative prompt AND the pooled vector segment
            c, uc = cond.get_unconditional_conditioning(
                batch_c, batch_uc,
                force_uc_zero_embeddings=[] if refiner else ["txt_tokens"],
            )
            rep = lambda d: {k: jnp.repeat(v, batch_size, 0) for k, v in d.items()}
            return rep(c), rep(uc)
        ctx = p.clip_apply(jnp.asarray(prompt_tokens))
        neg = p.clip_apply(jnp.asarray(negative_prompt_tokens))
        return (
            {"crossattn": jnp.repeat(ctx, batch_size, 0)},
            {"crossattn": jnp.repeat(neg, batch_size, 0)},
        )

    def text_to_image(
        self,
        params: SamplingParams,
        prompt_tokens,
        negative_prompt_tokens=None,
        samples: int = 1,
        rng: Optional[jax.Array] = None,
    ):
        p = self.pipeline
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        c, uc = self._make_cond(params, prompt_tokens, negative_prompt_tokens, samples)
        z_shape = (samples, params.height // 8, params.width // 8, 4)
        r_init, r_loop = jax.random.split(rng)
        x = jax.random.normal(r_init, z_shape)
        sampler = self._make_sampler(params)
        guider = self._guider(params)
        z, _ = sampler(self._denoise_fn(c, uc, guider), x, rng=r_loop)
        frames = p.first_stage.decode(z)
        return jnp.clip((frames + 1.0) / 2.0, 0.0, 1.0)

    def image_to_image(
        self,
        params: SamplingParams,
        image,  # [B, H, W, 3] in [-1, 1]
        prompt_tokens,
        negative_prompt_tokens=None,
        rng: Optional[jax.Array] = None,
    ):
        """Noising strength maps to the skipped step count
        (api.py do_img2img + helpers.py)."""
        z = self.pipeline.first_stage.encode(jnp.asarray(image))
        return self._denoise_from_latent(
            params, z, prompt_tokens, negative_prompt_tokens, rng
        )

    def _denoise_from_latent(
        self, params, z, prompt_tokens, negative_prompt_tokens, rng
    ):
        """Shared img2img tail: strength→t_start, noise, sample, decode
        (reference do_img2img; skip_encode callers pass latents directly)."""
        p = self.pipeline
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        sampler = self._make_sampler(params)
        guider = self._guider(params)
        c, uc = self._make_cond(
            params, prompt_tokens, negative_prompt_tokens, z.shape[0]
        )
        # reference Img2ImgDiscretizationWrapper: keep
        # max(int((steps+1)*strength), 1) sigmas of the steps+1 schedule
        n_sig = params.steps + 1
        keep = max(int(n_sig * params.img2img_strength), 1)
        t_start = n_sig - keep
        if t_start >= params.steps:
            # strength ~ 0: zero denoise steps; the reference returns the
            # (unchanged) input rather than asserting
            zf = z
        else:
            r_noise, r_loop = jax.random.split(rng)
            noised = sampler.add_noise(r_noise, z, noise_level=t_start)
            zf, _ = sampler(
                self._denoise_fn(c, uc, guider), noised,
                t_start=t_start, rng=r_loop,
            )
        frames = p.first_stage.decode(zf)
        return jnp.clip((frames + 1.0) / 2.0, 0.0, 1.0)

    def refiner(
        self,
        params: SamplingParams,
        latents,  # [B, h, w, z] base-model output latents (skip_encode)
        prompt_tokens,
        negative_prompt_tokens=None,
        rng: Optional[jax.Array] = None,
    ):
        """Refine base-model latents with an SDXL-refiner pipeline: img2img
        that skips the encode (reference api.py:245-277, do_img2img
        skip_encode=True) with orig/crop sizes derived from the latents and
        aesthetic scores 6.0 / 2.5."""
        z = jnp.asarray(latents)
        h, w = z.shape[1] * 8, z.shape[2] * 8
        rp = dataclasses.replace(
            params,
            width=w, height=h, orig_width=w, orig_height=h,
            crop_coords_top=0, crop_coords_left=0,
            aesthetic_score=6.0, negative_aesthetic_score=2.5,
        )
        return self._denoise_from_latent(
            rp, z, prompt_tokens, negative_prompt_tokens, rng
        )
