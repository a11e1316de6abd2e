"""End-to-end VidSeg slice through the public package API (tiny video model,
random weights). This is the project's verification drive: it exercises the
full seam chain add_noise → scan denoise with Q/K harvest → on-device KMeans
masks → 2·M modulated (±λ) runs with injection + latent blending → VAE decode
→ difference maps → argmax segmentation.

Run: cd /root/repo && PYTHONPATH=/root/repo python examples/tiny_e2e.py
"""
import numpy as np
import jax

try:
    _backend = jax.default_backend()
except RuntimeError:
    # the single TPU is claimed by another process (axon grants are
    # exclusive) — fall back to CPU
    jax.config.update("jax_platforms", "cpu")
    _backend = jax.default_backend()

import os as _os

_os.makedirs(".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import flax

print("backend:", _backend)

from vidseg_diffusion_tpu.models.unet import UNetConfig, UNetModel
from vidseg_diffusion_tpu.models import vae as fvae
from vidseg_diffusion_tpu.models.conditioner import build_svd_conditioner
from vidseg_diffusion_tpu.diffusion import (
    EDMDiscretization, Denoiser, VScalingWithEDMcNoise, LinearPredictionGuider,
)
from vidseg_diffusion_tpu.diffusion.sampling import EulerEDMSampler
from vidseg_diffusion_tpu.engine.modulation import ModulationConfig
from vidseg_diffusion_tpu.engine.vidseg import (
    VidSegEngine, svd_harvest_spec, masks_to_latent,
)
from vidseg_diffusion_tpu.engine.masks import kmeans_masks, correct_low_res_mask
from vidseg_diffusion_tpu.engine.segmentation import (
    compute_difference, segmentation_argmax,
)
from vidseg_diffusion_tpu.engine.diffusion_engine import FirstStage

T, HPX, WPX = 3, 64, 64       # pixel frame size
H, W = HPX // 8, WPX // 8     # latent 8x8
NUM_STEPS, T_START = 8, 4
NUM_MASKS = 2

cfg = UNetConfig(
    in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=16,
    context_dim=24, adm_in_channels=12, video=True,
)
unet = UNetModel(cfg)
_, _, out_blocks = cfg.block_layout()
mod_block = max(i for i, s in enumerate(out_blocks) if s.get("attn") and s["ds"] == 1)

mod_cfg = ModulationConfig(
    modulate_block_idx=(mod_block,), modulate_timestep=(T_START,),
    num_steps=NUM_STEPS, num_frames=T,
    modulate_layer_type=("spatial", "temporal"),
    modulate_attn_type=("self_attn",),
    modulate_lambda_start=30.0, modulate_lambda_end=30.0,
    is_injected_features=True,
    output_block_indices=tuple(range(1, len(out_blocks))),
    is_latent_blending=True,
)
engine = VidSegEngine(
    unet=unet,
    denoiser=Denoiser(scaling=VScalingWithEDMcNoise()),
    sampler=EulerEDMSampler(
        discretization=EDMDiscretization(sigma_max=700.0), num_steps=NUM_STEPS
    ),
    guider=LinearPredictionGuider(max_scale=2.5, num_frames=T),
    mod_cfg=mod_cfg,
    harvest=svd_harvest_spec(
        cluster_blocks=(mod_block,), injection=True,
        injection_blocks=tuple(i for i, s in enumerate(out_blocks) if s.get("attn")),
    ),
)

# --- tiny VAE first stage ----------------------------------------------------
vcfg = fvae.VAEConfig(ch=16, ch_mult=(1, 2, 2, 2), num_res_blocks=1,
                      video_decoder=True)
enc = fvae.Encoder(vcfg)
dec = fvae.Decoder(vcfg)
frames_in = jax.random.uniform(jax.random.PRNGKey(20), (T, HPX, WPX, 3)) * 2 - 1
enc_params = enc.init(jax.random.PRNGKey(21), frames_in)["params"]
dec_params = dec.init(jax.random.PRNGKey(22), jnp.zeros((T, H, W, 4)), timesteps=1)["params"]
fs = FirstStage(enc, dec, enc_params, dec_params)

# --- conditioner ------------------------------------------------------------
def fake_clip(frames):
    return jnp.mean(frames, axis=(1, 2)) @ jnp.ones((3, 24)) * 0.1

cond_builder = build_svd_conditioner(
    clip_image_fn=fake_clip,
    vae_encode_fn=lambda f: fs.encode(f, rng=None),
)
batch = {
    "cond_frames_without_noise": frames_in[:1],
    "cond_frames": frames_in[:1] + 0.02 * jax.random.normal(jax.random.PRNGKey(23), frames_in[:1].shape),
    "fps_id": jnp.array([6.0]),
    "motion_bucket_id": jnp.array([127.0]),
    "cond_aug": jnp.array([0.02]),
}
c1, uc1 = cond_builder.get_unconditional_conditioning(
    batch, force_uc_zero_embeddings=["cond_frames", "cond_frames_without_noise"]
)
# repeat per-frame like the pipeline (svd_single_video_inference.py:308-312)
def per_frame(d):
    return {
        "crossattn": jnp.repeat(d["crossattn"], T, axis=0),
        "concat": jnp.repeat(d["concat"], T, axis=0),
        "vector": jnp.repeat(d["vector"], T, axis=0)[:, :12],  # tiny adm dim
    }
c, uc = per_frame(c1), per_frame(uc1)
print("cond shapes:", {k: v.shape for k, v in c.items()})

# --- params ------------------------------------------------------------------
latent = fs.encode(frames_in, rng=None)
print("latent:", latent.shape)
x0 = jnp.zeros((2 * T, H, W, 8))
params = unet.init(
    jax.random.PRNGKey(7), x0, jnp.zeros((2 * T,)),
    jnp.zeros((2 * T, 1, 24)), jnp.zeros((2 * T, 12)),
    num_video_frames=T, image_only_indicator=jnp.zeros((2, T)),
)["params"]
params = flax.core.unfreeze(params)
k = params["out_2"]["kernel"]
params["out_2"]["kernel"] = jax.random.normal(jax.random.PRNGKey(9), k.shape) * 0.05

# tiny context dim mismatch guard: conditioner produced 24-dim crossattn via fake_clip
assert c["crossattn"].shape[-1] == 24

# --- steps 1+2 ----------------------------------------------------------------
x0_out, cache = jax.jit(
    lambda p, l, r: engine.xt_cache_pass(p, l, c, uc, r, T_START)
)(params, latent, jax.random.PRNGKey(11))
qname = [kk for kk in cache if "spatial_self_q" in kk][0]
feat = cache[qname][NUM_STEPS - 1]
print("harvested:", qname, feat.shape)

# --- step 3: masks via engine.masks -------------------------------------------
masks_tok, labels = kmeans_masks(jax.random.PRNGKey(5), feat, NUM_MASKS, T)
masks_tok = correct_low_res_mask(feat, masks_tok, T, width=W)  # refine
masks_px = masks_tok.reshape(NUM_MASKS, T, H, W)
print("masks:", masks_px.shape, "labels:", labels)

# --- step 4 --------------------------------------------------------------------
masks_latent = masks_to_latent(masks_px, (H, W))
noised = engine.sampler.add_noise(jax.random.PRNGKey(11), latent, noise_level=T_START)
finals = jax.jit(
    lambda p, n: engine.modulated_runs_batched(
        p, n, c, uc, masks_tok, masks_latent, cache, T_START, chunk=2 * NUM_MASKS
    )
)(params, noised)
assert finals.shape == (2, NUM_MASKS, T, H, W, 4)
dpm = float(jnp.max(jnp.abs(finals[0] - finals[1])))
print("max |+λ − −λ| latent diff:", dpm)
assert dpm > 1e-3

# blending pins outside-mask to cached trajectory
m0 = masks_latent[0][..., None]
# caches are windowed from t0 (engine cache contract)
outside = jnp.abs((finals[0, 0] - cache["xt"][NUM_STEPS - 1 - int(cache["t0"])]) * (1 - m0))
assert float(outside.max()) < 1e-4, outside.max()

# --- decode + step 5 -----------------------------------------------------------
def decode_runs(z):  # [2, M, T, H, W, 4] → frames uint8-ish
    flatz = z.reshape((-1,) + z.shape[2:])
    frames = jax.vmap(lambda zz: fs.decode(zz, chunk=1))(flatz)
    frames = jnp.clip((frames + 1) / 2, 0, 1) * 255.0
    return frames.reshape(z.shape[:2] + frames.shape[1:])

frames_pm = decode_runs(finals)
print("decoded:", frames_pm.shape)
diff = compute_difference(frames_pm[0], frames_pm[1], mode="uint8_wrap")
seg = segmentation_argmax(diff, masks=masks_px, filter_s=0.7,
                          labels=jnp.asarray(labels))
print("seg:", seg.shape, "labels used:", np.unique(np.asarray(seg)))
print("END-TO-END SLICE OK")
