"""Full five-step pipeline A/B against the PUBLIC reference.

Drives the reference's own stack end-to-end on a tiny SVD config (torch,
CPU): encode → add_noise → feature pass with the real img_callback xt/q
harvesting → sklearn KMeans masks (save_inidividual_masks_kmeans semantics,
feature_extraction.py:30-113) → ±λ modulated runs through the reference
EulerEDMSampler with disk-backed latent blending (sampling.py:229-250) →
decode → the reference's ACTUAL step-5 code (process_output.get_seg_map_main
over the written modulated-frame PNG tree). Then runs this framework's
run_single_video on the same weights/conditioning/noise and compares the
final label maps label-agnostically.

This covers exactly the seams unit tests miss: the mask resize chain, the
blend window, feature→cluster normalization, decode quantization, and the
difference-map argmax — with the only intentional divergences being (a) the
reference stores difference maps as lossy JPEGs before the argmax (we argmax
exact floats) and (b) k-means initialization (sklearn vs on-device
kmeans++), both absorbed by the label-agnostic agreement threshold.

RNG alignment shims (documented): both sides consume the same add_noise eps
and the same fixed conditioner embeddings; first-stage encode uses the
posterior mode on both sides.
"""

import itertools
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.slow

from reference_compat import (  # noqa: E402
    de_zero_,  # noqa: E402
    ensure_reference_importable,
    import_reference_vae,
    import_reference_video_unet,
)
from vidseg_diffusion_tpu.config import ModelSpec  # noqa: E402
from vidseg_diffusion_tpu.diffusion import (  # noqa: E402
    Denoiser,
    EDMDiscretization,
    LinearPredictionGuider,
    VScalingWithEDMcNoise,
)
from vidseg_diffusion_tpu.diffusion.sampling import EulerEDMSampler  # noqa: E402
from vidseg_diffusion_tpu.engine.build import Pipeline  # noqa: E402
from vidseg_diffusion_tpu.engine.diffusion_engine import FirstStage  # noqa: E402
from vidseg_diffusion_tpu.io.checkpoint import (  # noqa: E402
    convert_state_dict,
    unet_key_fn,
    vae_key_fn,
)
from vidseg_diffusion_tpu.models import vae as fvae  # noqa: E402
from vidseg_diffusion_tpu.models.conditioner import Conditioner, EmbedderSpec  # noqa: E402
from vidseg_diffusion_tpu.models.unet import UNetConfig, UNetModel  # noqa: E402
from vidseg_diffusion_tpu.pipelines.single_video import (  # noqa: E402
    VidSegArgs,
    _resolve_blocks,
    make_mod_config,
    run_single_video,
)

T, PX = 3, 64
LAT = PX // 8
CTX, ADM = 24, 12
NUM_STEPS, MOD_T, FEAT_T = 6, 3, 5
K, LAM = 2, 30.0
SEED = 1
SCALE = 0.18215
NAMES = ["00000", "00001", "00002"]


@pytest.fixture(scope="module")
def stack():
    ensure_reference_importable()
    from sgm.modules.diffusionmodules.denoiser import Denoiser as RefDenoiser
    from sgm.modules.diffusionmodules.sampling import EulerEDMSampler as RefSampler

    RefVideoUNet = import_reference_video_unet()
    RefEncoder, RefDecoder = import_reference_vae()

    torch.manual_seed(0)
    ref_unet = de_zero_(RefVideoUNet(
        in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=[2, 1], channel_mult=[1, 2], num_head_channels=16,
        transformer_depth=1, context_dim=CTX, use_linear_in_transformer=True,
        use_checkpoint=False, extra_ff_mix_layer=True, use_spatial_context=True,
        merge_strategy="learned_with_images", video_kernel_size=[3, 1, 1],
        num_classes="sequential", adm_in_channels=ADM,
    ).eval())
    dd = dict(ch=32, out_ch=3, ch_mult=[1, 2, 2, 2], num_res_blocks=1,
              attn_resolutions=[], dropout=0.0, in_channels=3, resolution=PX,
              z_channels=4, double_z=True, attn_type="vanilla")
    ref_enc = de_zero_(RefEncoder(**dd).eval())
    ref_dec = de_zero_(RefDecoder(**dd).eval())

    ref_denoiser = de_zero_(RefDenoiser(scaling_config={
        "target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"
    }))
    ref_sampler = RefSampler(
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
            "params": {"sigma_max": 700.0},
        },
        guider_config={
            "target": "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider",
            "params": {"max_scale": 2.5, "min_scale": 1.0, "num_frames": T},
        },
        num_steps=NUM_STEPS, device="cpu",
    )

    # flax twins on converted weights
    cfg = UNetConfig(
        in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=16,
        context_dim=CTX, adm_in_channels=ADM, video=True,
    )
    unet = UNetModel(cfg)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0), jnp.zeros((2 * T, LAT, LAT, 8)),
            jnp.zeros((2 * T,)), jnp.zeros((2 * T, 1, CTX)), jnp.zeros((2 * T, ADM)),
            num_video_frames=T, image_only_indicator=jnp.zeros((2, T)),
        )
    )["params"]
    usd = {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()}
    unet_params, unused = convert_state_dict(shapes, usd, unet_key_fn)
    assert not unused

    vcfg = fvae.VAEConfig(ch=32, ch_mult=(1, 2, 2, 2), num_res_blocks=1, z_channels=4)
    enc, dec = fvae.Encoder(vcfg), fvae.Decoder(vcfg)
    enc_shapes = jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), jnp.zeros((1, PX, PX, 3))))["params"]
    dec_shapes = jax.eval_shape(lambda: dec.init(jax.random.PRNGKey(0), jnp.zeros((1, LAT, LAT, 4))))["params"]
    esd = {k: v.detach().numpy() for k, v in ref_enc.state_dict().items()}
    dsd = {k: v.detach().numpy() for k, v in ref_dec.state_dict().items()}
    enc_params, _ = convert_state_dict(enc_shapes, esd, vae_key_fn)
    dec_params, _ = convert_state_dict(dec_shapes, dsd, vae_key_fn)

    spec = ModelSpec(
        unet_config=cfg, vae_config=vcfg,
        denoiser=Denoiser(scaling=VScalingWithEDMcNoise()),
        sampler=EulerEDMSampler(
            discretization=EDMDiscretization(sigma_max=700.0), num_steps=NUM_STEPS
        ),
        guider=LinearPredictionGuider(max_scale=2.5, num_frames=T),
        scale_factor=SCALE, conditioner_node=None, ckpt_path=None,
    )
    first_stage = FirstStage(enc, dec, enc_params, dec_params, scale_factor=SCALE)

    # fixed conditioning consumed identically by both sides
    crng = np.random.RandomState(7)
    emb_cross = crng.randn(1, 1, CTX).astype(np.float32)
    emb_vec = crng.randn(1, ADM).astype(np.float32)
    emb_concat = (crng.randn(1, LAT, LAT, 4) * 0.1).astype(np.float32)
    conditioner = Conditioner(
        embedders=(
            EmbedderSpec("cond_frames_without_noise", lambda v: jnp.asarray(emb_cross)),
            EmbedderSpec("fps_id", lambda v: jnp.asarray(emb_vec)),
            EmbedderSpec("cond_frames", lambda v: jnp.asarray(emb_concat)),
        ),
        kind="svd",
    )
    pipeline = Pipeline(
        spec=spec, unet=unet, unet_params=unet_params,
        first_stage=first_stage, conditioner=conditioner,
    )
    cond_np = {"crossattn": emb_cross, "vector": emb_vec, "concat": emb_concat}
    return pipeline, ref_unet, ref_enc, ref_dec, ref_denoiser, ref_sampler, cond_np


def _torch_denoiser(ref_unet, ref_denoiser, cond_np):
    """The reference pipeline's denoiser closure
    (svd_single_video_inference.py:314-330 + wrappers.py:23-34)."""
    c = {k: np.repeat(v, T, axis=0) for k, v in cond_np.items()}
    uc = {
        "crossattn": np.zeros_like(c["crossattn"]),
        "vector": c["vector"],
        "concat": np.zeros_like(c["concat"]),
    }

    def to_t(a, nchw=False):
        t = torch.from_numpy(np.asarray(a))
        if nchw and t.ndim == 4:
            t = t.permute(0, 3, 1, 2)
        return t

    cond = {
        "crossattn": to_t(c["crossattn"]), "vector": to_t(c["vector"]),
        "concat": to_t(c["concat"], True),
    }
    ucond = {
        "crossattn": to_t(uc["crossattn"]), "vector": to_t(uc["vector"]),
        "concat": to_t(uc["concat"], True),
    }
    ioi = torch.zeros(2, T)

    def network(x, c_noise, cd, **kwargs):
        xin = torch.cat([x, cd["concat"]], dim=1)
        return ref_unet(
            xin, c_noise, context=cd["crossattn"], y=cd["vector"],
            time_context=None, num_video_frames=T, image_only_indicator=ioi,
            **kwargs,
        )

    def denoiser(x, sigma, cd, **kw):
        return ref_denoiser(network, x, sigma, cd, **kw)

    return denoiser, cond, ucond


def _best_agreement(a: np.ndarray, b: np.ndarray, k: int) -> float:
    """Max pixel agreement over label permutations (label-agnostic)."""
    best = 0.0
    for perm in itertools.permutations(range(k)):
        mapped = np.asarray(perm)[b]
        best = max(best, float((a == mapped).mean()))
    return best


def test_five_step_ab(stack, tmp_path):
    pipeline, ref_unet, ref_enc, ref_dec, ref_denoiser, ref_sampler, cond_np = stack
    rng = np.random.RandomState(0)
    # piecewise-constant regions + noise so clustering has real structure
    frames = rng.rand(T, PX, PX, 3).astype(np.float32) * 0.2
    frames[:, :, : PX // 2, 0] += 0.7
    frames[:, :, PX // 2:, 2] += 0.7
    frames = frames * 2 - 1

    args = VidSegArgs(
        exp_name="ab", num_steps=NUM_STEPS, num_masks=K, seed=SEED,
        modulate_timestep=(MOD_T,), feature_timestep=(FEAT_T,),
        modulate_lambda_start=LAM, modulate_lambda_end=LAM,
        modulate_layer_type=("spatial", "temporal"),
        modulate_attn_type=("self_attn",),
        modulate_t_start=0, runs_chunk=4, mesh="off",
        feature_folder=str(tmp_path / "ours"),
    )

    # the physical block the CLI's block-8 request resolves to on this
    # reduced topology — used verbatim on the torch side
    mod_cfg = make_mod_config(args, T, True)
    (mod_block,), div = _resolve_blocks(
        pipeline.spec.unet_config, (8,), mod_cfg
    )
    fh = fw = LAT // div[mod_block]

    # ---- our side -----------------------------------------------------------
    res = run_single_video(pipeline, frames, NAMES, args, write_outputs=False)

    # ---- reference side -----------------------------------------------------
    base = str(tmp_path / "ref")
    exp = "ab"
    featdir = os.path.join(base, exp, "feature_maps")
    os.makedirs(featdir, exist_ok=True)
    denoiser, cond, ucond = _torch_denoiser(ref_unet, ref_denoiser, cond_np)

    # step 0: encode (posterior mode) + scale (diffusion.py:137-151)
    with torch.no_grad():
        moments = ref_enc(torch.from_numpy(frames.transpose(0, 3, 1, 2)))
        latent = SCALE * moments[:, :4]

    # step 1: add_noise with the SAME eps run_single_video derives from
    # its rng stream: the video path advances rng = fold_in(key, 1) for
    # cond_aug before deriving r_noise = fold_in(rng, 2)
    # (sampling.py:133-144 semantics)
    sigmas = np.asarray(pipeline.spec.sampler.sigmas())
    eps = np.asarray(
        jax.random.normal(
            jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(SEED), 1), 2
            ),
            (T, LAT, LAT, 4),
        )
    ).transpose(0, 3, 1, 2)
    noised = (latent.numpy() + eps * sigmas[MOD_T]) / np.sqrt(1 + sigmas[0] ** 2)
    noised = torch.from_numpy(noised.astype(np.float32))

    # step 2: feature pass with the real img_callback contract: save xt per
    # step for blending; grab the cluster block's spatial attn1 q at FEAT_T
    blocks = ref_unet.output_blocks
    captured = {}

    def img_callback(xt, i):
        torch.save(xt.detach().clone(), os.path.join(featdir, f"xt_time_{i}.pt"))
        if i == FEAT_T:
            captured["q"] = (
                blocks[mod_block][1].transformer_blocks[0].attn1.q.detach().clone()
            )

    with torch.no_grad():
        ref_sampler(
            denoiser, noised.clone(), cond=cond, uc=ucond,
            img_callback=img_callback, t_start=MOD_T,
        )
    assert "q" in captured

    # step 3: sklearn KMeans masks (save_inidividual_masks_kmeans :30-85:
    # max-abs channel normalize, cond half, joint fit over frames)
    from sklearn.cluster import KMeans

    fm = captured["q"].numpy()
    fmn = fm / np.max(np.abs(fm), axis=-1, keepdims=True)
    fit = fmn[T:].reshape(-1, fmn.shape[-1])
    km = KMeans(n_clusters=K, n_init=10, random_state=0).fit(fit)
    labels = km.predict(fit).reshape(T, fh, fw)
    # binary mask PNG roundtrip (mask_{label}.png, then load_feature_masks'
    # bicubic resize to the modulated block res — identity here)
    from PIL import Image

    masks_ref = np.stack([(labels == lab).astype(np.float32) for lab in range(K)])
    feature_masks = {
        lab: [
            torch.from_numpy(
                np.asarray(
                    Image.fromarray((masks_ref[lab, t_] * 255).astype(np.uint8)).resize(
                        (fw, fh), Image.BICUBIC
                    ),
                    dtype=np.float32,
                ).reshape(-1)
                / 255.0
            )
            for t_ in range(T)
        ]
        for lab in range(K)
    }

    # step 4: ±λ modulated runs with latent blending, decoded and written as
    # PNGs in the reference's modulated_output tree (sample_video :152-207)
    for lam in (LAM, -LAM):
        for lab in range(K):
            modulate_params = {
                "feature_masks": feature_masks[lab],
                "modulate_block_idx": [mod_block],
                "modulate_layer_type": ["spatial", "temporal"],
                "modulate_attn_type": ["self_attn"],
                "modulate_timestep": [MOD_T],
                "modulate_schedule": "constant",
                "modulate_lambda_start": lam,
                "modulate_lambda_end": lam,
                "num_frames": T,
                "modulate_uc": True,
                "is_injected_features": False,
                "injected_feature_types": None,
                "injected_block_types": None,
                "input_block_indices": None,
                "output_block_indices": None,
                "feature_folder": base,
                "exp_name": exp,
                "injected_features_group": {},
                "modulate_layer_frames": {},
                "modulate_block_frames": {},
                "modulate_timestep_frames": {},
                "modulate_lambda_layers": {},
                "latent_mask_start": MOD_T,
                "latent_mask_end": NUM_STEPS,
            }
            with torch.no_grad():
                z = ref_sampler(
                    denoiser, noised.clone(), cond=cond, uc=ucond,
                    t_start=0, is_modulate=True, modulate_params=modulate_params,
                    is_latent_blending=True, feature_height=fh, feature_width=fw,
                )
                x = ref_dec(z / SCALE)
            samples = torch.clamp((x + 1.0) / 2.0, 0.0, 1.0)
            vid = (samples.permute(0, 2, 3, 1).numpy() * 255).astype(np.uint8)
            fdir = os.path.join(
                base, exp, "modulated_output", f"{0:06d}_l_{lam}_mask_{lab}"
            )
            os.makedirs(fdir, exist_ok=True)
            for fi, frame in enumerate(vid):
                cv2.imwrite(
                    os.path.join(fdir, f"{NAMES[fi]}.png"),
                    cv2.cvtColor(frame, cv2.COLOR_RGB2BGR),
                )

    # step 5: the reference's own seg-map assembly over the written tree
    sys.path.insert(0, "/root/reference/scripts/sampling")
    try:
        import process_output as ref_po
    finally:
        sys.path.pop(0)
    ref_po.get_seg_map_main(
        exp, 0, LAM, K, T, filter_difference=False,
        unique_labels=np.arange(K), base_folder=base, frame_name_list=NAMES,
        color_map_path="/root/reference/scripts/util/color_map_soft.txt",
    )
    seg_ref = np.stack([
        np.asarray(Image.open(os.path.join(
            base, exp, "segmentation_map_raw", f"{0:06d}_l_{LAM}", f"{n}.png"
        )))
        for n in NAMES
    ])

    # ---- compare ------------------------------------------------------------
    assert seg_ref.shape == res.seg_raw.shape

    # (a) harvested cluster features must match the reference's cached q
    # (attention.py:330) — this is the signal that caught the round-1
    # Downsample padding bug masked by zero proj_out
    feat_diff = np.abs(res.cluster_features - fm).max()
    feat_scale = np.abs(fm).max()
    assert feat_diff <= 5e-3 * feat_scale, f"feature diff {feat_diff:.2e}"

    # (b) clustering quality: on these tiny random-weight features the
    # 2-partition is ambiguous (sklearn's own partitions across seeds agree
    # only 83-94%), so compare objectives, not labels: our kmeans must be at
    # least as good a local optimum as sklearn's n_init=10 best
    ours_lab = np.argmax(res.masks.reshape(K, T, fh * fw), axis=0)
    cent = np.stack([
        fit[(ours_lab.reshape(-1) == lab)].mean(axis=0) for lab in range(K)
    ])
    ours_inertia = float(((fit - cent[ours_lab.reshape(-1)]) ** 2).sum())
    assert ours_inertia <= km.inertia_ * 1.02, (
        f"kmeans inertia {ours_inertia:.2f} vs sklearn {km.inertia_:.2f}"
    )

    # (c) steps 4+5 apples-to-apples: drive OUR modulated runs + seg assembly
    # with the REFERENCE's masks (the reference always loads masks from a PNG
    # folder, so precomputed masks are a first-class input) and compare the
    # final label maps; residual differences are decode quantization + the
    # blur/argmax float-vs-uint8 path, absorbed by the threshold
    mask_ov = np.stack([
        np.stack([
            np.asarray(feature_masks[lab][t_]).reshape(fh * fw)
            for t_ in range(T)
        ])
        for lab in range(K)
    ])
    res_ov = run_single_video(
        pipeline, frames, NAMES, args, write_outputs=False,
        mask_override=mask_ov,
    )

    # (c1) difference maps, pre-JPEG: the reference's own compute_difference
    # over its written PNG tree returns the float map before the lossy .jpg
    # save; after the Image.convert("L") clip+truncate both sides are
    # uint8-valued and must agree up to decode-quantization boundary flips
    ref_maps = np.zeros((K, T) + seg_ref.shape[1:], np.float32)
    scratch = str(tmp_path / "dmap")
    os.makedirs(scratch, exist_ok=True)
    for ki in range(K):
        d1 = os.path.join(base, exp, "modulated_output", f"{0:06d}_l_{LAM}_mask_{ki}")
        d2 = os.path.join(base, exp, "modulated_output", f"{0:06d}_l_{-LAM}_mask_{ki}")
        for fi, n in enumerate(NAMES):
            d, _ = ref_po.compute_difference(
                os.path.join(d1, f"{n}.png"), os.path.join(d2, f"{n}.png"),
                scratch, scratch, n,
            )
            ref_maps[ki, fi] = np.clip(d, 0, 255).astype(np.uint8)
    map_err = np.abs(ref_maps - res_ov.diff_maps)
    frac_off = float((map_err > 3).mean())
    assert frac_off <= 0.05, f"diff maps: {frac_off:.1%} of pixels off by >3"

    # (c2) numeric argmax agreement (same normalization both sides, no JPEG)
    ref_norm = ref_maps / (ref_maps.max(axis=(-2, -1), keepdims=True) + 1e-5)
    seg_ref_num = np.argmax(ref_norm, axis=0)
    seg_agree = _best_agreement(res_ov.seg_raw, seg_ref_num, K)
    assert seg_agree >= 0.90, f"numeric segmentation agreement {seg_agree:.3f}"

    # (c3) the reference's ACTUAL artifact chain (argmax over reloaded lossy
    # JPEG maps) — looser: JPEG noise is comparable to the weak ±λ signal a
    # random-weight tiny model produces, so only gross agreement is expected
    seg_agree_jpg = _best_agreement(res_ov.seg_raw, seg_ref, K)
    assert seg_agree_jpg >= 0.70, f"jpeg-path agreement {seg_agree_jpg:.3f}"
