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


@dataclasses.dataclass(frozen=True)
class Txt2NoisyDiscretizationWrapper:
    """Stop-short sigma pruning for the SDXL base→refiner handoff
    (scripts/demo/discretization.py:30-57).

    Wraps a discretization and drops the SMALLEST
    `clamp(int(strength·steps)−1, 0, steps−1)` sigmas (steps =
    original_steps+1 when given, else the schedule length), so the base
    model's loop ends at a nonzero σ and hands a noisy latent to the
    refiner (streamlit_helpers.py:329-333 wraps the base sampler with
    stage2strength; sampling.py:350-360 finishes with apply_refiner)."""

    discretization: object
    strength: float = 0.0
    original_steps: Optional[int] = None

    def __post_init__(self):
        if not 0.0 <= self.strength <= 1.0:
            raise ValueError(f"strength must be in [0, 1], got {self.strength}")

    def prune_index(self, num_sigmas: int) -> int:
        steps = (
            self.original_steps + 1
            if self.original_steps is not None
            else num_sigmas
        )
        return max(min(int(self.strength * steps) - 1, steps - 1), 0)

    def __call__(self, n: int, do_append_zero: bool = True, flip: bool = False):
        sig = self.discretization(n, do_append_zero=do_append_zero, flip=flip)
        k = self.prune_index(sig.shape[0])
        if k == 0:
            return sig
        # the reference prunes the ascending view's head = the descending
        # schedule's tail (its smallest sigmas)
        return jnp.flip(jnp.flip(sig, 0)[k:], 0) if not flip else sig[k:]

    def t_end(self, num_steps: int) -> int:
        """Loop end index over the UNPRUNED steps+1 schedule that is
        step-for-step identical to running the full loop over the pruned
        schedule (sigmas[: steps+1−k] pairs = steps num_steps−k)."""
        return num_steps - self.prune_index(num_steps + 1)


@dataclasses.dataclass
class VideoSamplingParams:
    """SVD image→video knobs (scripts/demo/video_sampling.py VERSION2SPECS:
    'svd' T=14/cfg 2.5/25 steps; 'svd_xt' T=25/min_cfg 1.5/cfg 3.0/30 steps;
    σ ∈ [0.002, 700], rho 7, LinearPredictionGuider)."""

    width: int = 1024
    height: int = 576
    num_frames: int = 14
    steps: int = 25
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    rho: float = 7.0
    min_cfg: float = 1.0
    max_cfg: float = 2.5
    fps_id: int = 6
    motion_bucket_id: int = 127
    cond_aug: float = 0.02
    decoding_t: int = 1


class SamplingPipeline:
    """txt2img / img2img / img2vid over an assembled Pipeline
    (api.py:164-385 + the video do_sample path,
    streamlit_helpers.py:478-685)."""

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
        txt2noisy_strength: Optional[float] = None,
        return_latents: bool = False,
    ):
        """txt2noisy_strength wraps the schedule in
        Txt2NoisyDiscretizationWrapper so the loop stops at a nonzero σ —
        the SDXL base stage of a base→refiner pipeline (reference demo
        sampling.py:295-327 with stage2strength; pair with
        refiner(..., add_noise=False) to finish denoising)."""
        p = self.pipeline
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        c, uc = self._make_cond(params, prompt_tokens, negative_prompt_tokens, samples)
        z_shape = (samples, params.height // 8, params.width // 8, 4)
        r_init, r_loop = jax.random.split(rng)
        x = jax.random.normal(r_init, z_shape)
        sampler = self._make_sampler(params)
        guider = self._guider(params)
        t_end = None
        if txt2noisy_strength is not None:
            wrapper = Txt2NoisyDiscretizationWrapper(
                sampler.discretization, strength=txt2noisy_strength,
                original_steps=params.steps,
            )
            t_end = wrapper.t_end(params.steps)
        if t_end == 0:
            # strength ~1: zero steps — the reference's loop body never runs
            # and the prescaled init noise is the "latent"
            z = sampler.prescale(x, sampler.sigmas(params.steps))
        else:
            z, _ = sampler(
                self._denoise_fn(c, uc, guider), x, rng=r_loop, t_end=t_end
            )
        frames = p.first_stage.decode(z)
        frames = jnp.clip((frames + 1.0) / 2.0, 0.0, 1.0)
        return (frames, z) if return_latents else frames

    def image_to_video(
        self,
        params: VideoSamplingParams,
        image,  # [1, H, W, 3] (or [H, W, 3]) in [-1, 1]
        rng: Optional[jax.Array] = None,
    ):
        """SVD image→video generation (scripts/demo/video_sampling.py:1-200
        driving streamlit_helpers.do_sample's video path :478-685): condition
        the SVD 5-embedder stack on the still frame (CLIP image emb →
        crossattn, VAE-encoded noise-augmented frame → concat channels,
        fps/motion/aug scalars → vector), denoise T latent frames from pure
        noise under a per-frame LinearPredictionGuider CFG ramp, and decode
        with the temporal VAE. Returns [T, H, W, 3] in [0, 1]."""
        p = self.pipeline
        if not p.spec.unet_config.video:
            raise ValueError("image_to_video requires a video (SVD) pipeline")
        if p.conditioner is None:
            raise ValueError("image_to_video requires the SVD conditioner")
        t = params.num_frames
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_aug, r_init = jax.random.split(rng)

        image = jnp.asarray(image)
        if image.ndim == 3:
            image = image[None]
        # value_dict construction (video_sampling.py:136-142): the cond
        # frame both clean (CLIP) and cond_aug-noised (VAE concat)
        batch = {
            "cond_frames_without_noise": image,
            "cond_frames": image
            + params.cond_aug * jax.random.normal(r_aug, image.shape),
            "fps_id": jnp.array([float(params.fps_id)]),
            "motion_bucket_id": jnp.array([float(params.motion_bucket_id)]),
            "cond_aug": jnp.array([params.cond_aug]),
        }
        c1, uc1 = p.conditioner.get_unconditional_conditioning(
            batch,
            force_uc_zero_embeddings=[
                "cond_frames", "cond_frames_without_noise",
            ],
        )
        # crossattn/concat repeated per frame (do_sample :529-538)
        per_frame = lambda d: {k: jnp.repeat(v, t, axis=0) for k, v in d.items()}
        c, uc = per_frame(c1), per_frame(uc1)

        sampler = EulerEDMSampler(
            discretization=EDMDiscretization(
                params.sigma_min, params.sigma_max, params.rho
            ),
            num_steps=params.steps,
        )
        guider = LinearPredictionGuider(
            max_scale=params.max_cfg, num_frames=t, min_scale=params.min_cfg
        )
        x = jax.random.normal(
            r_init, (t, params.height // 8, params.width // 8, 4)
        )

        def denoise_fn(xx, sigma, i):
            b = xx.shape[0]
            s = jnp.full((b,), sigma, dtype=xx.dtype)
            x_in, s_in, cond = guider.prepare_inputs(xx, s, c, uc)
            # zeros [2b/t, t] for CFG guiders (do_sample :542-550)
            ioi = jnp.zeros((x_in.shape[0] // t, t), dtype=xx.dtype)

            def network(xs, c_noise, cond_d):
                if "concat" in cond_d:
                    xs = jnp.concatenate(
                        [xs, cond_d["concat"].astype(xs.dtype)], -1
                    )
                return p.unet.apply(
                    {"params": p.unet_params}, xs, c_noise,
                    cond_d.get("crossattn"), cond_d.get("vector"),
                    num_video_frames=t, image_only_indicator=ioi,
                )

            out = p.spec.denoiser(network, x_in, s_in, cond)
            return guider(out, sigma), None

        z, _ = sampler(denoise_fn, x)
        frames = p.first_stage.decode(z, chunk=params.decoding_t)
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
        self, params, z, prompt_tokens, negative_prompt_tokens, rng,
        add_noise: bool = True,
    ):
        """Shared img2img tail: strength→t_start, noise, sample, decode
        (reference do_img2img; skip_encode callers pass latents directly).
        add_noise=False = finish_denoising (streamlit do_img2img :767-773):
        the input is already a noisy latent at the schedule's σ₀ — only the
        1/sqrt(1+σ₀²) pre-scale cancellation applies, no fresh noise."""
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
            if add_noise:
                noised = sampler.add_noise(r_noise, z, noise_level=t_start)
            else:
                # the reference divides by its (pruned) schedule's σ₀ and the
                # loop prescale multiplies it back — net z exactly. Our loop
                # prescales by the FULL schedule's σ₀ (t_start indexes into
                # it), so cancel against that same value.
                sig = sampler.sigmas(params.steps)
                noised = z / jnp.sqrt(1.0 + sig[0] ** 2.0)
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
        add_noise: bool = True,
    ):
        """Refine base-model latents with an SDXL-refiner pipeline: img2img
        that skips the encode (reference api.py:245-277, do_img2img
        skip_encode=True) with orig/crop sizes derived from the latents and
        aesthetic scores 6.0 / 2.5. add_noise=False is the demo's
        finish_denoising handoff (sampling.py:317-318, 350-360): the base ran
        with txt2noisy_strength and the latent is already noisy — pair
        img2img_strength here with the SAME value so the refiner resumes at
        the σ the base stopped at."""
        z = jnp.asarray(latents)
        h, w = z.shape[1] * 8, z.shape[2] * 8
        rp = dataclasses.replace(
            params,
            width=w, height=h, orig_width=w, orig_height=h,
            crop_coords_top=0, crop_coords_left=0,
            aesthetic_score=6.0, negative_aesthetic_score=2.5,
        )
        return self._denoise_from_latent(
            rp, z, prompt_tokens, negative_prompt_tokens, rng,
            add_noise=add_noise,
        )
