"""Assemble a full DiffusionEngine from a reference-format YAML + checkpoint.

Counterpart of `load_model` (svd_single_video_inference.py:564-587) +
`DiffusionEngine.init_from_ckpt` (models/diffusion.py:85-103): parse the
YAML (config.load_model_spec), initialize flax params, and fill them from
the converted torch/safetensors state dict. With no checkpoint (smoke/bench
runs in checkpoint-less environments) parameters stay randomly initialized.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vidseg_diffusion_tpu.config import ModelSpec, load_model_spec
from vidseg_diffusion_tpu.engine.diffusion_engine import DiffusionEngine, FirstStage
from vidseg_diffusion_tpu.engine.modulation import ModulationConfig
from vidseg_diffusion_tpu.engine.vidseg import HarvestSpec, VidSegEngine
from vidseg_diffusion_tpu.io.checkpoint import (
    convert_state_dict,
    load_torch_checkpoint,
    sub_dict,
    unet_key_fn,
    vae_key_fn,
)
from vidseg_diffusion_tpu.models import vae as fvae
from vidseg_diffusion_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextTransformer,
    CLIPVisionConfig,
    CLIPVisionTransformer,
    clip_preprocess,
    clip_text_key_fn,
    clip_vision_key_fn,
    hf_clip_text_key_fn,
    split_packed_qkv,
)
from vidseg_diffusion_tpu.models.conditioner import (
    Conditioner,
    build_sd_text_conditioner,
    build_sdxl_conditioner,
    build_sdxl_refiner_conditioner,
    build_svd_conditioner,
)
from vidseg_diffusion_tpu.models.unet import UNetModel


def _param_shapes(init_fn) -> Any:
    """Abstract param tree via eval_shape — no tracing-to-device, no compile.

    Initializing a 1.5B-param UNet by executing `init` on the TPU costs a
    full-model compile just to learn shapes; the converter only needs the
    shapes (checkpoint values replace everything), and smoke mode fills them
    with synthesized randoms on device."""
    return jax.eval_shape(init_fn)["params"]


def _synthesize_params(shapes, rng: jax.Array, dtype):
    """Random params from a shape tree, generated on device under one jit
    (smoke/bench mode — values only need to be well-scaled, not trained).

    On the CPU backend (tests) the jitted per-leaf program costs ~3 s of
    XLA:CPU compile per component (~40 s per tiny-pipeline build); values
    are throwaway randoms, so numpy generates them instead — no compile."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    if jax.default_backend() == "cpu":
        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1])
        gen = np.random.default_rng(seed)
        outs = []
        for s in leaves:
            if s.ndim <= 1:
                outs.append(jnp.full(s.shape, 0.5, dtype))
            else:
                fan_in = int(np.prod(s.shape[:-1]))
                std = (1.0 / max(fan_in, 1)) ** 0.5
                vals = gen.standard_normal(s.shape, dtype=np.float32) * std
                outs.append(jnp.asarray(vals, dtype))
        return jax.tree_util.tree_unflatten(treedef, outs)

    @jax.jit
    def make(key):
        outs = []
        for i, s in enumerate(leaves):
            k = jax.random.fold_in(key, i)
            if s.ndim <= 1:
                # biases zero, norm scales ~1 (scale leaves share this rank)
                outs.append(jnp.ones(s.shape, dtype) * 0.5)
            else:
                fan_in = int(np.prod(s.shape[:-1]))
                std = (1.0 / max(fan_in, 1)) ** 0.5
                outs.append(jax.random.normal(k, s.shape, dtype) * std)
        return jax.tree_util.tree_unflatten(treedef, outs)

    return make(rng)


def _unet_shapes(unet: UNetModel, rng: jax.Array):
    cfg = unet.config
    t = 2
    bt = 2 * t
    kwargs = {}
    args = [
        jnp.zeros((bt, 16, 16, cfg.in_channels)),
        jnp.zeros((bt,)),
        jnp.zeros((bt, 1, cfg.context_dim)),
    ]
    if cfg.adm_in_channels is not None:
        args.append(jnp.zeros((bt, cfg.adm_in_channels)))
    if cfg.video:
        kwargs = dict(num_video_frames=t, image_only_indicator=jnp.zeros((2, t)))
    return _param_shapes(lambda: unet.init(rng, *args, **kwargs))


@dataclasses.dataclass
class Pipeline:
    """A fully-assembled model stack ready for the VidSeg pipeline."""

    spec: ModelSpec
    unet: UNetModel
    unet_params: Any
    first_stage: FirstStage
    conditioner: Optional[Conditioner]
    clip_apply: Optional[Any] = None  # image or text tower apply fn
    # fused SVD conditioning: ONE jitted program for the whole c/uc build
    # (CLIP tower + cond-frame VAE encode + scalar embedders + uc zeroing +
    # per-frame repeat). The embedder-by-embedder Conditioner path dispatches
    # ~30 eager glue ops per video (repeat/concat/zeros/normal) — each a
    # host→device round-trip, seconds per call through a degraded tunnel
    # (the r4 sweep spent 169.7 s in "conditioning"). Signature:
    # (image, r_aug_key, fps_id, motion_bucket, cond_aug, t) -> (c, uc)
    condition_video: Optional[Any] = None
    # engine cache: the SAME engine instance must be returned for identical
    # (mod_cfg, harvest) so the engine's cached jit wrappers survive across
    # run_single_video calls (fresh wrappers re-trace + re-load the compiled
    # 1.5B-param executables from the persistent cache every run)
    _engines: dict = dataclasses.field(default_factory=dict, repr=False)

    def make_engine(self, mod_cfg: ModulationConfig, harvest: HarvestSpec) -> VidSegEngine:
        key = (mod_cfg, harvest)
        if key not in self._engines:
            self._engines[key] = VidSegEngine(
                unet=self.unet,
                denoiser=self.spec.denoiser,
                sampler=self.spec.sampler,
                guider=self.spec.guider,
                mod_cfg=mod_cfg,
                harvest=harvest,
            )
        return self._engines[key]


def build_pipeline(
    config_path: str,
    ckpt_path: Optional[str] = None,
    num_steps: Optional[int] = None,
    num_frames: Optional[int] = None,
    dtype=jnp.float32,
    seed: int = 0,
    param_dtype=None,
) -> Pipeline:
    """param_dtype defaults to `dtype`: with bf16 compute the weights are
    stored bf16 too (the reference keeps fp32 weights under fp16 autocast;
    on TPU bf16 weights halve HBM — the 1.5B UNet + ViT-H CLIP + VAE drop
    from ~9 GB to ~4.5 GB — with no extra loss vs bf16 compute)."""
    param_dtype = param_dtype if param_dtype is not None else dtype

    def cast(tree):
        return jax.tree.map(lambda a: a.astype(param_dtype), tree)

    spec = load_model_spec(
        config_path, num_steps=num_steps, num_frames=num_frames, dtype=dtype
    )
    rng = jax.random.PRNGKey(seed)
    unet = UNetModel(spec.unet_config)
    unet_shapes = _unet_shapes(unet, rng)

    enc = fvae.Encoder(spec.vae_config)
    dec = fvae.Decoder(spec.vae_config)
    z = spec.vae_config.z_channels
    enc_shapes = _param_shapes(lambda: enc.init(rng, jnp.zeros((1, 64, 64, 3))))
    dec_shapes = _param_shapes(
        lambda: dec.init(
            rng, jnp.zeros((1, 8, 8, z)),
            **({"timesteps": 1} if spec.vae_config.video_decoder else {}),
        )
    )

    quant = post_quant = None
    clip_apply = None
    conditioner = None
    condition_video = None

    import os

    sd = None
    ckpt = ckpt_path or spec.ckpt_path
    if ckpt_path is not None and not os.path.exists(ckpt_path):
        raise FileNotFoundError(ckpt_path)
    if ckpt and not os.path.exists(ckpt):
        # YAML default ckpt not present in this environment → smoke mode
        print(f"WARNING: checkpoint {ckpt!r} not found — random weights")
        ckpt = None
    if ckpt:
        sd = load_torch_checkpoint(ckpt)
        unet_sd = sub_dict(sd, "model.diffusion_model.")
        unet_params, unused = convert_state_dict(unet_shapes, unet_sd, unet_key_fn, dtype=dtype)
        enc_sd = sub_dict(sd, "first_stage_model.encoder.")
        dec_sd = sub_dict(sd, "first_stage_model.decoder.")
        enc_params, _ = convert_state_dict(enc_shapes, enc_sd, vae_key_fn, dtype=dtype)
        dec_params, _ = convert_state_dict(dec_shapes, dec_sd, vae_key_fn, dtype=dtype)
        if "first_stage_model.quant_conv.weight" in sd:
            quant = (
                np.asarray(sd["first_stage_model.quant_conv.weight"]).transpose(2, 3, 1, 0),
                np.asarray(sd["first_stage_model.quant_conv.bias"]),
            )
            post_quant = (
                np.asarray(sd["first_stage_model.post_quant_conv.weight"]).transpose(2, 3, 1, 0),
                np.asarray(sd["first_stage_model.post_quant_conv.bias"]),
            )
    else:
        unet_params = _synthesize_params(unet_shapes, jax.random.fold_in(rng, 1), dtype)
        enc_params = _synthesize_params(enc_shapes, jax.random.fold_in(rng, 2), dtype)
        dec_params = _synthesize_params(dec_shapes, jax.random.fold_in(rng, 3), dtype)

    first_stage = FirstStage(
        enc, dec, cast(enc_params), cast(dec_params),
        scale_factor=spec.scale_factor,
        quant_conv=quant, post_quant_conv=post_quant,
    )

    # conditioner
    if spec.conditioner_node is not None:
        emb_models = spec.conditioner_node.get("params", {}).get("emb_models", [])
        targets = [e["target"].rsplit(".", 1)[-1] for e in emb_models]
        if "FrozenOpenCLIPImagePredictionEmbedder" in targets:
            node = emb_models[targets.index("FrozenOpenCLIPImagePredictionEmbedder")]
            vc = (node.get("params") or {}).get("vision_cfg") or {}
            vision = CLIPVisionTransformer(CLIPVisionConfig(dtype=dtype, **vc))
            img_sz = vc.get("image_size", 224)
            vshapes = _param_shapes(
                lambda: vision.init(rng, jnp.zeros((1, img_sz, img_sz, 3)))
            )
            if sd is not None:
                vkeys = split_packed_qkv(
                    sub_dict(sd, "conditioner.embedders.0.open_clip.model.")
                )
                vparams, _ = convert_state_dict(vshapes, vkeys, clip_vision_key_fn, dtype=dtype)
            else:
                vparams = _synthesize_params(vshapes, jax.random.fold_in(rng, 4), dtype)

            vparams = cast(vparams)

            # jitted with params as arguments (eager tower applies cost
            # ~30 s/call through the tunneled TPU; see ROUND_NOTES r2)
            _clip_fwd = jax.jit(
                lambda p, f: vision.apply({"params": p}, clip_preprocess(f))
            )

            def clip_image_fn(frames):
                return _clip_fwd(vparams, frames)

            # SVD cond-frame encoder (AutoencoderKLModeOnly) shares the
            # first-stage Encoder architecture; weights live under
            # conditioner.embedders.3.encoder.encoder.
            cenc_params = enc_params
            cquant = quant
            if sd is not None:
                ckeys = sub_dict(sd, "conditioner.embedders.3.encoder.encoder.")
                if ckeys:
                    cenc_params, _ = convert_state_dict(enc_shapes, ckeys, vae_key_fn, dtype=dtype)
                qk = "conditioner.embedders.3.encoder.quant_conv.weight"
                if qk in sd:
                    cquant = (
                        np.asarray(sd[qk]).transpose(2, 3, 1, 0),
                        np.asarray(sd[qk.replace("weight", "bias")]),
                    )

            cenc_params = cast(cenc_params)

            _has_q = cquant is not None
            _cq = tuple(jnp.asarray(a) for a in cquant) if _has_q else None

            @jax.jit
            def _cond_enc(p, q, frames):
                moments = enc.apply({"params": p}, frames)
                if _has_q:
                    kq, bq = q
                    moments = jnp.einsum("bhwc,cd->bhwd", moments, kq[0, 0]) + bq
                return fvae.gaussian_sample(moments, None)  # mode only

            def vae_encode_fn(frames):
                return _cond_enc(cenc_params, _cq, frames)

            conditioner = build_svd_conditioner(clip_image_fn, vae_encode_fn)
            clip_apply = clip_image_fn

            # fused conditioning program (see Pipeline.condition_video):
            # numerically identical to the Conditioner path — same embedder
            # order (crossattn=CLIP, vector=[fps|motion|aug], concat=VAE),
            # same uc zeroing (force_uc_zero on both cond_frames keys,
            # encoders/modules.py:166-184), same per-frame repeat — but one
            # dispatch instead of ~30 (equivalence: tests/test_pipeline_tiny
            # ::test_condition_video_fused_matches_conditioner)
            from vidseg_diffusion_tpu.models.conditioner import (
                concat_timestep_embedder,
            )

            def _cond_fused_impl(vp, cp, q, image, r_aug, fps_id,
                                 motion_bucket, cond_aug, t):
                z = vision.apply({"params": vp}, clip_preprocess(image))
                z = z[:, None, :]  # [1, 1, 1024]
                vec = jnp.concatenate(
                    [
                        concat_timestep_embedder(fps_id, 256),
                        concat_timestep_embedder(motion_bucket, 256),
                        concat_timestep_embedder(cond_aug, 256),
                    ],
                    axis=1,
                )
                cond_frames = image + cond_aug[0] * jax.random.normal(
                    r_aug, image.shape
                )
                moments = enc.apply({"params": cp}, cond_frames)
                if _has_q:
                    kq, bq = q
                    moments = jnp.einsum(
                        "bhwc,cd->bhwd", moments, kq[0, 0]
                    ) + bq
                cat = fvae.gaussian_sample(moments, None)
                rep = lambda a: jnp.repeat(a, t, axis=0)
                c = {"crossattn": rep(z), "vector": rep(vec),
                     "concat": rep(cat)}
                uc = {"crossattn": rep(jnp.zeros_like(z)),
                      "vector": rep(vec),
                      "concat": rep(jnp.zeros_like(cat))}
                return c, uc

            _cond_fused = jax.jit(_cond_fused_impl, static_argnames=("t",))

            def condition_video(image, r_aug, fps_id, motion_bucket,
                                cond_aug, t):
                return _cond_fused(
                    vparams, cenc_params, _cq, image, r_aug,
                    jnp.asarray(fps_id), jnp.asarray(motion_bucket),
                    jnp.asarray(cond_aug), t,
                )
        elif "FrozenOpenCLIPEmbedder2" in targets:
            # SDXL text conditioners. Base (sd_xl_base.yaml:35-73): HF CLIP-L
            # hidden layer 11 + open_clip ViT-bigG penultimate w/ pooled.
            # Refiner (sd_xl_refiner.yaml:36-63): bigG only, no CLIP-L.
            is_refiner = "FrozenCLIPEmbedder" not in targets
            node_g = emb_models[targets.index("FrozenOpenCLIPEmbedder2")]
            tc_g = (node_g.get("params") or {}).get("text_cfg") or dict(
                width=1280, heads=20, layers=32
            )
            text_g = CLIPTextTransformer(
                CLIPTextConfig(dtype=dtype, **tc_g),
                penultimate=True, final_ln=False, return_pooled=True,
            )
            tg_shapes = _param_shapes(
                lambda: text_g.init(rng, jnp.zeros((1, 77), jnp.int32))
            )
            # checkpoint layouts: base has embedders.0 = HF CLIPTextModel
            # keys, embedders.1 = open_clip (packed-qkv) keys; the refiner's
            # bigG is embedders.0
            g_prefix = "conditioner.embedders.0.model." if is_refiner else (
                "conditioner.embedders.1.model."
            )
            if sd is not None:
                gkeys = split_packed_qkv(sub_dict(sd, g_prefix))
                tg_params, _ = convert_state_dict(
                    tg_shapes, gkeys, clip_text_key_fn, dtype=dtype
                )
            else:
                tg_params = _synthesize_params(tg_shapes, jax.random.fold_in(rng, 7), dtype)
            tg_params = cast(tg_params)
            _g_fwd = jax.jit(lambda p, t: text_g.apply({"params": p}, t))

            def clip_g_fn(tokens):
                return _g_fwd(tg_params, tokens)

            outdims = [
                ((e.get("params") or {}).get("outdim", 256))
                for e, t in zip(emb_models, targets)
                if t == "ConcatTimestepEmbedderND"
            ]
            size_outdim = outdims[0] if outdims else 256
            if is_refiner:
                conditioner = build_sdxl_refiner_conditioner(
                    clip_g_fn, size_outdim=size_outdim
                )
                clip_apply = clip_g_fn
            else:
                node_l = emb_models[targets.index("FrozenCLIPEmbedder")]
                tc_l = (node_l.get("params") or {}).get("text_cfg") or dict(
                    width=768, heads=12, layers=12
                )
                text_l = CLIPTextTransformer(
                    CLIPTextConfig(dtype=dtype, act="quick_gelu", **tc_l),
                    penultimate=True, final_ln=False,
                )
                tl_shapes = _param_shapes(
                    lambda: text_l.init(rng, jnp.zeros((1, 77), jnp.int32))
                )
                if sd is not None:
                    lkeys = sub_dict(sd, "conditioner.embedders.0.transformer.")
                    tl_params, _ = convert_state_dict(
                        tl_shapes, lkeys, hf_clip_text_key_fn, dtype=dtype
                    )
                else:
                    tl_params = _synthesize_params(
                        tl_shapes, jax.random.fold_in(rng, 6), dtype
                    )
                tl_params = cast(tl_params)
                _l_fwd = jax.jit(lambda p, t: text_l.apply({"params": p}, t))

                def clip_l_fn(tokens):
                    return _l_fwd(tl_params, tokens)

                conditioner = build_sdxl_conditioner(
                    clip_l_fn, clip_g_fn, size_outdim=size_outdim
                )
                clip_apply = clip_l_fn
        elif "FrozenOpenCLIPEmbedder" in targets:
            node = emb_models[targets.index("FrozenOpenCLIPEmbedder")]
            tc = (node.get("params") or {}).get("text_cfg") or {}
            text = CLIPTextTransformer(
                CLIPTextConfig(dtype=dtype, **tc), penultimate=True
            )
            tshapes = _param_shapes(
                lambda: text.init(rng, jnp.zeros((1, 77), jnp.int32))
            )
            if sd is not None:
                tkeys = split_packed_qkv(sub_dict(sd, "conditioner.embedders.0.model."))
                tparams, _ = convert_state_dict(tshapes, tkeys, clip_text_key_fn, dtype=dtype)
            else:
                tparams = _synthesize_params(tshapes, jax.random.fold_in(rng, 5), dtype)

            tparams = cast(tparams)

            _t_fwd = jax.jit(lambda p, t: text.apply({"params": p}, t))

            def clip_text_fn(tokens):
                return _t_fwd(tparams, tokens)

            conditioner = build_sd_text_conditioner(clip_text_fn)
            clip_apply = clip_text_fn
        elif "FrozenT5Embedder" in targets or "FrozenByT5Embedder" in targets:
            from vidseg_diffusion_tpu.models.conditioner import (
                build_t5_text_conditioner,
            )
            from vidseg_diffusion_tpu.models.t5 import (
                T5Config, T5Encoder, t5_config_from_state_dict, t5_key_fn,
            )

            tname = ("FrozenT5Embedder" if "FrozenT5Embedder" in targets
                     else "FrozenByT5Embedder")
            idx = targets.index(tname)
            node = emb_models[idx]
            # reference wraps T5EncoderModel as .transformer (modules.py:255)
            prefix = f"conditioner.embedders.{idx}.transformer."
            t5keys = sub_dict(sd, prefix) if sd is not None else {}
            if t5keys:
                t5cfg = t5_config_from_state_dict(t5keys, dtype=dtype)
            else:
                # architecture comes from the checkpoint normally; allow an
                # explicit t5_cfg override for synthetic builds
                t5cfg = T5Config(
                    dtype=dtype, **((node.get("params") or {}).get("t5_cfg") or {})
                )
            t5 = T5Encoder(t5cfg)
            t5_shapes = _param_shapes(
                lambda: t5.init(rng, jnp.zeros((1, 77), jnp.int32))
            )
            if t5keys:
                t5_params, _ = convert_state_dict(
                    t5_shapes, t5keys, t5_key_fn, dtype=dtype
                )
            else:
                t5_params = _synthesize_params(
                    t5_shapes, jax.random.fold_in(rng, 8), dtype
                )
            t5_params = cast(t5_params)
            _t5_fwd = jax.jit(lambda p, t: t5.apply({"params": p}, t))

            def t5_fn(tokens):
                return _t5_fwd(t5_params, tokens)

            conditioner = build_t5_text_conditioner(t5_fn)
            clip_apply = t5_fn
        elif "ClassEmbedder" in targets:
            from vidseg_diffusion_tpu.models.aux_encoders import ClassEmbedder
            from vidseg_diffusion_tpu.models.conditioner import (
                build_class_conditioner,
            )

            idx = targets.index("ClassEmbedder")
            node = emb_models[idx]
            p = node.get("params") or {}
            ce = ClassEmbedder(
                embed_dim=p["embed_dim"],
                n_classes=p.get("n_classes", 1000),
                add_sequence_dim=p.get("add_sequence_dim", False),
            )
            ce_shapes = _param_shapes(
                lambda: ce.init(rng, jnp.zeros((1,), jnp.int32))
            )
            ekey = f"conditioner.embedders.{idx}.embedding.weight"
            if sd is not None and ekey in sd:
                ce_params, _ = convert_state_dict(
                    ce_shapes, {ekey: sd[ekey]}, lambda path: ekey, dtype=dtype
                )
            else:
                ce_params = _synthesize_params(
                    ce_shapes, jax.random.fold_in(rng, 9), dtype
                )
            ce_params = cast(ce_params)
            _ce_fwd = jax.jit(lambda p, c: ce.apply({"params": p}, c))

            def class_fn(labels):
                return _ce_fwd(ce_params, labels)

            conditioner = build_class_conditioner(class_fn)
            clip_apply = class_fn

    return Pipeline(
        spec=spec,
        unet=unet,
        unet_params=cast(unet_params),
        first_stage=first_stage,
        conditioner=conditioner,
        clip_apply=clip_apply,
        condition_video=condition_video,
    )
