"""The five-step VidSeg pipeline on one video (library form).

Behavioral counterpart of scripts/sampling/svd_single_video_inference.py's
`sample()` (:31-517) and the shared core of the VSPW sweeps — re-architected
so every intermediate (attention features, x_t trajectory, masks, modulated
latents, difference maps) stays in HBM. Filesystem writes happen only for
user-facing artifacts (mask PNG trees, modulated frames, segmentation maps)
in the reference's output layout.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidseg_diffusion_tpu.engine.build import Pipeline
from vidseg_diffusion_tpu.engine.masks import (
    GTMatchState,
    correct_low_res_mask,
    kmeans_masks,
    match_gt_mask,
)
from vidseg_diffusion_tpu.engine.modulation import ModulationConfig
from vidseg_diffusion_tpu.engine.segmentation import (
    compute_difference,
    segmentation_argmax,
    soft_color_map,
)
from vidseg_diffusion_tpu.engine.vidseg import (
    HarvestSpec,
    masks_to_latent,
    sd_harvest_spec,
    svd_harvest_spec,
)
from vidseg_diffusion_tpu.io import video as vio
from vidseg_diffusion_tpu.ops.image import resize_bicubic


@dataclasses.dataclass
class VidSegArgs:
    """CLI-parity knobs (svd_single_video_inference.py:31-64, 600-625)."""

    exp_name: str = "default"
    num_steps: int = 25
    seed: int = 1
    fps_id: int = 14
    motion_bucket_id: int = 127
    cond_aug: float = 0.02
    decoding_t: int = 1
    modulate_block_idx: Tuple[int, ...] = (8,)
    modulate_timestep: Tuple[int, ...] = (17,)
    feature_timestep: Tuple[int, ...] = (24,)
    modulate_schedule: str = "constant"
    modulate_lambda_start: float = 50.0
    modulate_lambda_end: float = 50.0
    modulate_layer_type: Tuple[str, ...] = ("spatial",)
    modulate_attn_type: Tuple[str, ...] = ("cross_attn",)
    modulate_timestep_frames_schedule: str = "constant"
    num_masks: int = 10
    feature_extraction_mode: str = "kmeans_masks"
    gt_mask_path: Optional[str] = None
    is_injected_features: bool = False
    is_latent_blending: bool = True
    is_refine_mask: bool = False
    is_aggre_attn: bool = False
    feature_folder: str = "features_outputs"
    inversion_type: str = "add_noise"
    # single-chip runs dispatch: 1 = per-step host dispatch with each run's
    # DECODE enqueued as soon as its denoise finishes (no decode stage
    # bubble); >1 = chunked whole-run programs. Default 1: chunk=2 measured
    # ZERO step-time win (the 28-frame CFG batch already saturates the MXU,
    # ROUND_NOTES r1) while forfeiting the interleaved decode (the r4 sweep
    # paid a visible 60 s decode stage for it — BENCH_SWEEP r4 vs r5)
    runs_chunk: int = 1
    # injected q/k caches larger than this stay in HOST RAM and stream per
    # step (v5e 16 GB cannot hold the ~8.7 GB swan-scale injected cache next
    # to the 3 GB params + runs working set)
    injected_cache_budget_gb: float = 6.0
    # multi-chip dispatch: "auto" shards the (mask, ±λ) runs grid + decode
    # over a 'runs' device mesh whenever >1 device is visible; "off" forces
    # the single-chip host-dispatch paths; "runs" forces the mesh
    mesh: str = "auto"
    # SVD modulation t_start for the modulated runs. The reference hardcodes
    # 14 when an input video is given (svd_single_video_inference.py:425-428),
    # 3 steps before the default modulate_timestep 17; None generalizes to
    # max(0, min(modulate_timestep) - 3) so non-default step counts work.
    modulate_t_start: Optional[int] = None
    # SD pipeline: latent_mask_end = min(modulate_timestep)+1
    # (sd_pipeline_vspw.py:490); SVD uses num_steps
    sd_blend_window: bool = False


@dataclasses.dataclass
class VidSegResult:
    seg_raw: np.ndarray            # [T, H, W] labels (unfiltered)
    seg_filtered: np.ndarray       # [T, H, W] labels (filter_s)
    masks: np.ndarray              # [K, T, fh, fw]
    unique_labels: np.ndarray      # [K]
    gt_state: Optional[GTMatchState] = None
    cluster_features: Optional[np.ndarray] = None  # [2T, fh*fw, C] harvested q
    diff_maps: Optional[np.ndarray] = None         # [K, T, H, W] uint8-valued


def _cluster_block_names(args: VidSegArgs, video: bool) -> Tuple[int, ...]:
    """Clustering blocks: 8 (or 8,7,6 with --is_aggre_attn) for SVD
    (svd_single_video_inference.py:361-364); SD uses 7 by default
    (sd_pipeline_vspw.py:639)."""
    base = 8 if video else 7
    if args.is_aggre_attn:
        return (base, base - 1, base - 2)
    return (base,)


def _resolve_blocks(unet_cfg, blocks: Sequence[int], mod_cfg: ModulationConfig):
    """Map reference output-block indices to this model's layout.

    On the full 12-block UNet this is the identity. On reduced topologies
    (tiny test configs) a requested index is re-targeted to the last
    attention block whose resolution matches the reference block's role
    (the /8,/4,/2,/1 map, svd_single_video_inference.py:484-495), so the
    same CLI flags drive any scale of model. Returns (resolved indices,
    {index: latent-divisor})."""
    _, _, out_layout = unet_cfg.block_layout()
    attn = {i: s["ds"] for i, s in enumerate(out_layout) if s.get("attn")}
    max_ds = max(attn.values())
    resolved, divisors = [], {}
    used = set()
    for b in blocks:
        if len(out_layout) == 12 and b not in attn:
            # full reference topology: a non-attention index is a user
            # error, not a retarget case — silently modulating a different
            # block than the reference would diverges without a trace
            raise ValueError(
                f"block {b} has no attention on the full 12-block UNet "
                f"(attention blocks: {sorted(attn)})"
            )
        if b in attn and len(out_layout) == 12:
            idx = b
        else:
            target = min(mod_cfg.block_resolution_divisor(b), max_ds)
            candidates = [i for i, d in attn.items() if d == target and i not in used]
            if not candidates:
                candidates = [i for i, d in attn.items() if i not in used] or list(attn)
            idx = max(candidates)
        used.add(idx)
        resolved.append(idx)
        divisors[idx] = attn[idx]
    return tuple(resolved), divisors


def cluster_feature_hw(
    pipeline: Pipeline, args: VidSegArgs, hpx: int, wpx: int, num_frames: int
) -> Tuple[int, int]:
    """Token resolution (fh, fw) of the clustering block for a given pixel
    resolution — the resolution GT masks must be loaded at (match_gt_mask,
    feature_extraction.py:580-584). Uses the same block-resolution map as
    `run_single_video` step 3 so callers never hardcode the /2 divisor."""
    video = pipeline.spec.unet_config.video
    base_cfg = make_mod_config(args, num_frames, video)
    cluster_blocks, cluster_div = _resolve_blocks(
        pipeline.spec.unet_config, _cluster_block_names(args, video), base_cfg
    )
    div = cluster_div[cluster_blocks[0]]
    return (hpx // 8) // div, (wpx // 8) // div


def make_mod_config(args: VidSegArgs, num_frames: int, video: bool) -> ModulationConfig:
    return ModulationConfig(
        modulate_block_idx=tuple(args.modulate_block_idx),
        modulate_timestep=tuple(args.modulate_timestep),
        feature_timestep=tuple(args.feature_timestep),
        modulate_schedule=args.modulate_schedule,
        modulate_lambda_start=args.modulate_lambda_start,
        modulate_lambda_end=args.modulate_lambda_end,
        modulate_layer_type=tuple(args.modulate_layer_type),
        modulate_attn_type=tuple(args.modulate_attn_type),
        modulate_timestep_frames_schedule=args.modulate_timestep_frames_schedule,
        num_steps=args.num_steps,
        num_frames=num_frames,
        is_injected_features=args.is_injected_features,
        is_latent_blending=args.is_latent_blending,
        latent_mask_end=(
            min(args.modulate_timestep) + 1 if args.sd_blend_window else args.num_steps
        ),
    )


def make_harvest(
    args: VidSegArgs,
    video: bool,
    cluster_blocks: Sequence[int],
    track_blocks: Sequence[int],
    injection_blocks: Sequence[int],
) -> HarvestSpec:
    cluster = tuple(cluster_blocks)
    # refinement tracking uses output block 7's spatial q
    # (svd_single_video_inference.py:393)
    for b in track_blocks:
        if b not in cluster:
            cluster = cluster + (b,)
    if video:
        return svd_harvest_spec(
            cluster_blocks=cluster,
            injection=args.is_injected_features,
            injection_blocks=tuple(injection_blocks),
        )
    return sd_harvest_spec(
        cluster_blocks=cluster,
        injection=args.is_injected_features,
        injection_blocks=tuple(injection_blocks),
    )


def estimate_injected_cache_bytes(
    harvest, out_layout, dtype, h_lat: int, w_lat: int, t: int,
    num_steps: int, t_start: int, cluster_blocks: Sequence[int],
    track_blocks: Sequence[int] = (),
) -> Dict[str, int]:
    """Per-entry HBM bytes of the windowed injected q/k cache (excluding
    the cluster AND refine-tracking blocks' spatial q, which must stay
    device-resident for the mask stage — offloading the track block made
    the is_refine_mask lookup KeyError). Used both by run_single_video's
    host-offload decision and by the memory-budget tests."""
    from vidseg_diffusion_tpu.engine.vidseg import HarvestSpec

    itemsize = jnp.dtype(dtype).itemsize
    w_steps = num_steps - t_start
    cluster_names = {
        HarvestSpec.name(b, "spatial_self", "q")
        for b in tuple(cluster_blocks) + tuple(track_blocks)
    }
    est: Dict[str, int] = {}
    for b, site, tensor in harvest.entries:
        name = HarvestSpec.name(b, site, tensor)
        if name in cluster_names:
            continue
        ds = out_layout[b]["ds"]
        tokens = (h_lat // ds) * (w_lat // ds)
        est[name] = w_steps * 2 * t * tokens * out_layout[b]["ch"] * itemsize
    return est


def _decode_runs_sharded(fs, flat: jnp.ndarray, decoding_t: int, mesh) -> jnp.ndarray:
    """Decode the [2·K, T, h, w, z] run latents with the run axis sharded
    over the mesh's 'runs' axis (one run per device per lax.map step —
    matching the modulated-runs layout, so latents stay on their device)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    nd = mesh.shape["runs"]
    total = flat.shape[0]
    g = -(-total // nd)
    idx = jnp.arange(g * nd) % total
    padded = flat[idx].reshape((g, nd) + flat.shape[1:])
    repl = NamedSharding(mesh, P())
    rsh = NamedSharding(mesh, P(None, "runs"))

    out = fs.jit_decode_sharded(mesh, decoding_t)(
        jax.device_put(fs.params_decoder, repl), jax.device_put(padded, rsh)
    )
    return out.reshape((g * nd,) + out.shape[2:])[:total]


def run_single_video(
    pipeline: Pipeline,
    frames: np.ndarray,        # [T, H, W, 3] in [-1, 1], H/W % 64 == 0
    frame_names: Sequence[str],
    args: VidSegArgs,
    ori_hw: Optional[Tuple[int, int]] = None,
    gt_mask: Optional[np.ndarray] = None,      # flattened first-frame GT at feature res
    gt_state: Optional[GTMatchState] = None,   # carried across VSPW batches
    text_tokens: Optional[np.ndarray] = None,  # SD 2.1 text path
    write_outputs: bool = True,
    mask_override: Optional[np.ndarray] = None,  # [K, T, fh*fw] precomputed masks
    timings: Optional[Dict[str, float]] = None,  # out-param: per-stage seconds
    mesh=None,  # explicit runs-axis Mesh (a device GROUP of a larger
    # ('data','runs') sweep mesh); overrides args.mesh device discovery so a
    # sweep can pin each video to its data-group's devices
) -> VidSegResult:
    def _mark(stage, *arrays):
        # stage timing: block on the stage's outputs so lazy dispatch doesn't
        # attribute work to the next stage (no-op unless timings requested)
        if timings is None:
            return
        for a in arrays:
            if hasattr(a, "block_until_ready"):
                a.block_until_ready()
        now = time.perf_counter()
        timings[stage] = now - timings.pop("_t0", now)
        timings["_t0"] = now

    if timings is not None:
        timings["_t0"] = time.perf_counter()
    t, hpx, wpx = frames.shape[:3]
    video = pipeline.spec.unet_config.video
    fdiv = 8
    h_lat, w_lat = hpx // fdiv, wpx // fdiv

    base_cfg = make_mod_config(args, t, video)
    unet_cfg = pipeline.spec.unet_config
    cluster_blocks, cluster_div = _resolve_blocks(
        unet_cfg, _cluster_block_names(args, video), base_cfg
    )
    mod_blocks, mod_div = _resolve_blocks(
        unet_cfg, tuple(args.modulate_block_idx), base_cfg
    )
    track_blocks, track_div = (
        _resolve_blocks(unet_cfg, (7,), base_cfg) if args.is_refine_mask else ((), {})
    )
    _, _, out_layout = unet_cfg.block_layout()
    attn_blocks = tuple(i for i, s in enumerate(out_layout) if s.get("attn"))
    mod_cfg = dataclasses.replace(
        base_cfg,
        modulate_block_idx=mod_blocks,
        output_block_indices=attn_blocks,
    )
    harvest = make_harvest(args, video, cluster_blocks, track_blocks, attn_blocks)
    engine = pipeline.make_engine(mod_cfg, harvest)
    fs = pipeline.first_stage
    rng = jax.random.PRNGKey(args.seed)

    # ---- conditioning (svd_single_video_inference.py:282-312) -------------
    frames_j = jnp.asarray(frames)
    if video:
        image = frames_j[:1]
        r_aug, rng = jax.random.split(rng)[0], jax.random.fold_in(rng, 1)
        if pipeline.condition_video is not None:
            # one fused dispatch (CLIP + cond-VAE + scalar embs + repeat);
            # numerically identical to the Conditioner path below
            c, uc = pipeline.condition_video(
                image, r_aug,
                jnp.array([float(args.fps_id)]),
                jnp.array([float(args.motion_bucket_id)]),
                jnp.array([args.cond_aug]),
                t,
            )
        else:
            batch = {
                "cond_frames_without_noise": image,
                "cond_frames": image
                + args.cond_aug * jax.random.normal(r_aug, image.shape),
                "fps_id": jnp.array([float(args.fps_id)]),
                "motion_bucket_id": jnp.array([float(args.motion_bucket_id)]),
                "cond_aug": jnp.array([args.cond_aug]),
            }
            c1, uc1 = pipeline.conditioner.get_unconditional_conditioning(
                batch,
                force_uc_zero_embeddings=[
                    "cond_frames", "cond_frames_without_noise",
                ],
            )

            def per_frame(d):
                return {k: jnp.repeat(v, t, axis=0) for k, v in d.items()}

            c, uc = per_frame(c1), per_frame(uc1)
        _mark("conditioning", *c.values(), *uc.values())
    else:
        assert text_tokens is not None, "SD path needs tokenized text"
        empty = jnp.asarray(text_tokens)  # [1, 77] empty-prompt tokens
        ctx = pipeline.clip_apply(empty)  # [1, 77, 1024]
        c = {"crossattn": jnp.repeat(ctx, t, axis=0)}
        uc = {"crossattn": jnp.repeat(ctx, t, axis=0)}
        _mark("conditioning", *c.values())

    # ---- steps 1+2: noise/invert + feature/xt pass --------------------------
    # t_start: modulate_timestep for add_noise, 0 for inversion
    # (svd_single_video_inference.py:250-254)
    t_start_feat = (
        min(args.modulate_timestep) if args.inversion_type == "add_noise" else 0
    )
    latent = fs.encode(frames_j, rng=None, chunk=args.decoding_t)
    _mark("encode", latent)
    r_noise = jax.random.fold_in(rng, 2)
    if args.inversion_type == "add_noise":
        noised = engine.jit_add_noise(latent, r_noise, noise_level=t_start_feat)
    elif args.inversion_type == "inversion":
        # full DDIM inversion over the flipped σ schedule
        # (svd_single_video_inference.py:341-342)
        noised = engine.jit_invert(pipeline.unet_params, latent, c, uc)
    else:
        raise ValueError(f"Invalid inversion type {args.inversion_type}")
    # decide up front whether the injected cache must live in host RAM:
    # the one-scan feature pass materializes its whole output on device, so
    # oversized caches must stream out per step (xt_cache_pass_host). The
    # same per-device budget applies under a mesh — the cache is replicated
    # per device there, and the sharded-stepped dispatch streams it from
    # host RAM exactly like the single-chip path.
    use_mesh = (
        mesh is not None
        or args.mesh == "runs"
        or (args.mesh == "auto" and jax.device_count() > 1)
    )
    host_names: Tuple[str, ...] = ()
    if args.is_injected_features:
        est = estimate_injected_cache_bytes(
            engine.harvest, out_layout, unet_cfg.dtype, h_lat, w_lat, t,
            args.num_steps, t_start_feat, cluster_blocks, track_blocks,
        )
        if sum(est.values()) > args.injected_cache_budget_gb * 1e9:
            host_names = tuple(sorted(est))

    host_inj = None
    if host_names:
        x0, cache, host_inj = engine.xt_cache_pass_host(
            pipeline.unet_params, latent, c, uc, r_noise, t_start_feat,
            pre_noised=noised, host_names=host_names,
        )
    else:
        x0, cache = engine.jit_xt_cache(
            pipeline.unet_params, latent, c, uc, r_noise, noised,
            t_start=t_start_feat,
        )
    _mark("feature_pass", x0)

    # ---- step 3: masks ------------------------------------------------------
    # caches are windowed from t0 (engine xt_cache_pass docstring)
    cache_t0 = int(cache.get("t0", 0))
    if len(args.feature_timestep) != 1:
        # the reference's feature_timestep is a single step
        # (svd_single_video_inference.py:48 "24"); silently using [0] would
        # drop the rest of a multi-entry tuple
        raise ValueError(
            f"feature_timestep takes exactly one step, got "
            f"{args.feature_timestep}"
        )
    feat_t = args.feature_timestep[0]
    if feat_t >= args.num_steps:
        # jax's clamped gather would otherwise silently return the last
        # cached step's features
        raise ValueError(
            f"feature_timestep {feat_t} out of range for num_steps "
            f"{args.num_steps}"
        )
    if feat_t < cache_t0:
        raise ValueError(
            f"feature_timestep {feat_t} precedes the cache window start "
            f"{cache_t0} (= min(modulate_timestep) for add_noise inversion): "
            "the feature pass only runs steps >= t_start, so features at "
            "earlier steps were never produced. Use feature_timestep >= "
            "min(modulate_timestep) or inversion_type='inversion'."
        )
    feats = [
        cache[HarvestSpec.name(b, "spatial_self", "q")][feat_t - cache_t0]
        for b in cluster_blocks
    ]
    feat = jnp.mean(jnp.stack(feats), axis=0) if len(feats) > 1 else feats[0]
    div = cluster_div[cluster_blocks[0]]
    fh, fw = h_lat // div, w_lat // div

    unique_labels = None
    new_gt_state = None
    if mask_override is not None:
        # externally supplied masks (the reference loads masks from whatever
        # PNG folder exists — load_feature_masks svd_single_video_inference.py:
        # 67-104 — so precomputed masks are a first-class input)
        masks_tok = jnp.asarray(mask_override).reshape(-1, t, fh * fw)
        unique_labels = jnp.arange(masks_tok.shape[0])
    elif args.feature_extraction_mode == "kmeans_masks":
        masks_tok, unique_labels = kmeans_masks(
            jax.random.fold_in(rng, 3), feat, args.num_masks, t
        )
    elif args.feature_extraction_mode == "match_gt_mask":
        masks_tok, new_gt_state = match_gt_mask(
            jax.random.fold_in(rng, 3), feat, args.num_masks, t,
            gt_mask=gt_mask, state=gt_state,
        )
        unique_labels = new_gt_state.unique_labels
    else:
        raise ValueError(args.feature_extraction_mode)

    if args.is_refine_mask:
        tb = track_blocks[0]
        track_feat = cache[HarvestSpec.name(tb, "spatial_self", "q")][feat_t - cache_t0]
        tdiv = track_div[tb]
        track_masks = masks_tok
        if tdiv != div:  # tracking block at a different token resolution
            tm = resize_bicubic(
                masks_tok.reshape(-1, t, fh, fw), (h_lat // tdiv, w_lat // tdiv)
            )
            track_masks = (tm > 0.5).astype(jnp.float32).reshape(
                masks_tok.shape[0], t, -1
            )
        refined = correct_low_res_mask(track_feat, track_masks, t, width=w_lat // tdiv)
        if tdiv != div:
            rm = resize_bicubic(
                refined.reshape(-1, t, h_lat // tdiv, w_lat // tdiv), (fh, fw)
            )
            masks_tok = (rm > 0.5).astype(jnp.float32).reshape(
                refined.shape[0], t, fh * fw
            )
        else:
            masks_tok = refined

    k = masks_tok.shape[0]
    masks_px = np.asarray(masks_tok).reshape(k, t, fh, fw)
    _mark("masks")

    # ---- step 4: modulated runs ---------------------------------------------
    mdiv = mod_div[mod_blocks[0]]
    mh, mw = h_lat // mdiv, w_lat // mdiv
    # per-run modulation masks at the modulated block's token resolution
    # (load_feature_masks PIL-bicubic resize, svd_single_video_inference.py:97)
    masks_block = resize_bicubic(jnp.asarray(masks_px), (mh, mw))
    masks_block = jnp.clip(masks_block, 0.0, 1.0).reshape(k, t, mh * mw)
    masks_latent = masks_to_latent(
        jnp.asarray(masks_px).reshape(k, t, fh, fw), (h_lat, w_lat)
    )

    t_start_mod = (
        args.modulate_t_start
        if args.modulate_t_start is not None
        else max(0, min(args.modulate_timestep) - 3)
    )


    # step 4 reuses the step-1 latent (add_noise output or inversion output;
    # the reference passes the same `latent` to every sample_video call,
    # svd_single_video_inference.py:497)
    interleaved: Dict[int, jnp.ndarray] = {}
    if use_mesh:
        if mesh is None:
            from vidseg_diffusion_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(axes=("runs",), shape=(jax.device_count(),))
        if host_inj is not None:
            # oversized injected cache: host-stepped under the mesh — each
            # step's slice streams host→devices replicated, the runs grid
            # stays sharded (per-device HBM never holds the full cache)
            finals = engine.modulated_runs_sharded_stepped(
                pipeline.unet_params, noised, c, uc, masks_block,
                masks_latent, cache, t_start_mod, mesh=mesh,
                host_inj=host_inj,
            )
        else:
            finals = engine.modulated_runs_sharded(
                pipeline.unet_params, noised, c, uc, masks_block, masks_latent,
                cache, t_start_mod, mesh=mesh,
            )
    elif args.runs_chunk <= 1 or host_inj is not None:
        # smallest compile unit: one jitted Euler step reused across all
        # steps and runs (see modulated_runs_host_stepped); also the only
        # dispatch that can stream a host-offloaded injected cache. When
        # no cache streams, runs go OUTER and each run's decode dispatch
        # is enqueued as soon as its denoise finishes — no decode-stage
        # dispatch bubble after the runs stage.
        on_run_done = None
        if host_inj is None:
            def on_run_done(r, x_final):
                interleaved[r] = fs.jit_decode(
                    fs.params_decoder, x_final, chunk=args.decoding_t
                )

        finals = engine.modulated_runs_host_stepped(
            pipeline.unet_params, noised, c, uc, masks_block, masks_latent,
            cache, t_start_mod, host_inj=host_inj, on_run_done=on_run_done,
        )
    else:
        finals = engine.modulated_runs_host_chunked(
            pipeline.unet_params, noised, c, uc, masks_block, masks_latent,
            cache, t_start_mod, chunk=min(args.runs_chunk, 2 * k),
        )

    # decode ±λ runs (chunked like decoding_t). Single chip: one dispatch
    # per run — a single program decoding all 2·K·T frames runs minutes
    # on-device and can exceed worker execution limits. Mesh: runs decode in
    # parallel, one per device per map step.
    _mark("modulated_runs", finals)
    flat = finals.reshape((-1,) + finals.shape[2:])
    if use_mesh:
        decoded = _decode_runs_sharded(fs, flat, args.decoding_t, mesh)
    elif interleaved:
        # decode dispatches already enqueued during the runs stage
        decoded = jnp.stack([interleaved[i] for i in range(flat.shape[0])])
    else:
        decoded = jnp.stack([
            fs.jit_decode(fs.params_decoder, flat[i], chunk=args.decoding_t)
            for i in range(flat.shape[0])
        ])
    decoded = decoded.reshape(finals.shape[:2] + decoded.shape[1:])
    decoded = jnp.clip((decoded + 1.0) / 2.0, 0.0, 1.0) * 255.0
    _mark("decode", decoded)

    # ---- step 5: difference maps + seg --------------------------------------
    diff = compute_difference(decoded[0], decoded[1], mode="uint8_wrap")
    labels_arr = jnp.asarray(unique_labels)
    seg_raw = np.asarray(segmentation_argmax(diff, labels=labels_arr))
    seg_filtered = np.asarray(
        segmentation_argmax(
            diff, masks=jnp.asarray(masks_px), filter_s=0.7, labels=labels_arr
        )
    )
    _mark("seg_assembly")
    if timings is not None:
        timings.pop("_t0", None)

    # ---- user-facing artifacts ----------------------------------------------
    if write_outputs:
        base = os.path.join(args.feature_folder, args.exp_name)
        mode_dir = args.feature_extraction_mode
        block_str = "_".join(f"output_block_{b}" for b in cluster_blocks)
        mask_dir = os.path.join(
            base, mode_dir, f"{block_str}_spatial_self_attn_q_masks_{args.num_masks}"
        )
        vio.save_binary_masks(masks_px, mask_dir, frame_names, feat_t, unique_labels)
        mod_dir = os.path.join(base, "modulated_output")
        from vidseg_diffusion_tpu.io.native import ParallelFrameWriter

        writer = ParallelFrameWriter(workers=4)
        for sign_idx, lam in ((0, args.modulate_lambda_start), (1, -args.modulate_lambda_start)):
            for ki, lab in enumerate(unique_labels):
                vio.save_frames_png(
                    np.asarray(decoded[sign_idx, ki]) / 255.0,
                    os.path.join(mod_dir, f"{0:06d}_l_{lam}_mask_{int(lab)}"),
                    frame_names,
                    ori_hw,
                    writer=writer,
                )
        writer.close()
        cm = soft_color_map()
        for name, seg in (("segmentation_map_raw", seg_raw),
                          ("segmentation_map_raw_f_0.7", seg_filtered)):
            vio.save_label_maps(
                seg,
                os.path.join(base, name, f"{0:06d}_l_{args.modulate_lambda_start}"),
                frame_names,
                color_map=cm,
                color_folder=os.path.join(
                    base, name.replace("_raw", ""), f"{0:06d}_l_{args.modulate_lambda_start}"
                ),
            )

    return VidSegResult(
        seg_raw=seg_raw,
        seg_filtered=seg_filtered,
        masks=masks_px,
        unique_labels=np.asarray(unique_labels),
        gt_state=new_gt_state,
        cluster_features=np.asarray(feat),
        diff_maps=np.asarray(diff),
    )
