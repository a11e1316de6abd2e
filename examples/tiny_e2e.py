"""Verification drive: end-to-end VidSeg slice through the public package API.

Tiny video UNet, random weights — exercises the full seam chain:
add_noise → scan denoise with Q/K harvest → KMeans masks on harvested
features → 2·M modulated (±λ) runs with latent blending + injection →
difference maps → argmax segmentation.
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend())

from vidseg_diffusion_tpu.models.unet import UNetConfig, UNetModel
from vidseg_diffusion_tpu.diffusion import (
    EDMDiscretization, Denoiser, VScalingWithEDMcNoise, LinearPredictionGuider,
)
from vidseg_diffusion_tpu.diffusion.sampling import EulerEDMSampler
from vidseg_diffusion_tpu.engine.modulation import ModulationConfig
from vidseg_diffusion_tpu.engine.vidseg import (
    VidSegEngine, svd_harvest_spec, masks_to_latent,
)
from vidseg_diffusion_tpu.ops.kmeans import kmeans_fit
from vidseg_diffusion_tpu.ops.image import gaussian_blur

T, H, W = 3, 16, 16  # latent size
NUM_STEPS, T_START = 8, 4
NUM_MASKS = 2

cfg = UNetConfig(
    in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=16,
    context_dim=24, adm_in_channels=12, video=True,
)
unet = UNetModel(cfg)

# modulated block: last output block with attention at ds=1 (full latent res)
_, _, out_blocks = cfg.block_layout()
mod_block = max(i for i, s in enumerate(out_blocks) if s.get("attn") and s["ds"] == 1)
print("modulated block:", mod_block)

mod_cfg = ModulationConfig(
    modulate_block_idx=(mod_block,),
    modulate_timestep=(T_START,),
    num_steps=NUM_STEPS,
    num_frames=T,
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
        injection_blocks=tuple(
            i for i, s in enumerate(out_blocks) if s.get("attn")
        ),
    ),
)

rng = jax.random.PRNGKey(0)
latent = jax.random.normal(rng, (T, H, W, 4))
c = {
    "crossattn": jax.random.normal(jax.random.PRNGKey(1), (T, 1, 24)),
    "vector": jax.random.normal(jax.random.PRNGKey(2), (T, 12)),
    "concat": jax.random.normal(jax.random.PRNGKey(3), (T, H, W, 4)) * 0.1,
}
uc = {"crossattn": jnp.zeros_like(c["crossattn"]),
      "vector": c["vector"], "concat": jnp.zeros_like(c["concat"])}

x0 = jnp.zeros((2 * T, H, W, 8))
params = unet.init(
    jax.random.PRNGKey(7), x0, jnp.zeros((2 * T,)),
    jnp.zeros((2 * T, 1, 24)), jnp.zeros((2 * T, 12)),
    num_video_frames=T, image_only_indicator=jnp.zeros((2, T)),
)["params"]
# randomize the zero-init final conv so modulation visibly propagates
import flax
params = flax.core.unfreeze(params)
k = params["out_2"]["kernel"]
params["out_2"]["kernel"] = jax.random.normal(jax.random.PRNGKey(9), k.shape) * 0.05

# ---- Step 1+2: feature pass with xt cache --------------------------------
x0_out, cache = jax.jit(
    lambda p, l, r: engine.xt_cache_pass(p, l, c, uc, r, T_START)
)(params, latent, jax.random.PRNGKey(11))
print("feature pass done; cache keys:", len(cache), "xt:", cache["xt"].shape)
qname = [kk for kk in cache if "spatial_self_q" in kk][0]
feat = cache[qname][NUM_STEPS - 1]  # feature_timestep = last step
print("cluster features:", qname, feat.shape)

# ---- Step 3: on-device KMeans masks ---------------------------------------
cond_feat = feat[T:]  # cond half [T, L, C]
fh = fw = H // 1  # block at ds=1 → latent res tokens
norm = cond_feat / jnp.max(jnp.abs(cond_feat), axis=-1, keepdims=True)
flat = norm.reshape(-1, norm.shape[-1])
centers, labels, _ = kmeans_fit(jax.random.PRNGKey(5), flat, k=NUM_MASKS)
masks_flat = jax.nn.one_hot(labels, NUM_MASKS, axis=0)  # [M, T*L]
masks_tokens = masks_flat.reshape(NUM_MASKS, T, H * W)
masks_px = masks_tokens.reshape(NUM_MASKS, T, H, W)
print("masks:", masks_px.shape, "sizes:", np.asarray(masks_tokens.sum(axis=(1, 2))))

# ---- Step 4: 2·M modulated runs -------------------------------------------
masks_latent = masks_to_latent(masks_px, (H, W))
noised = engine.sampler.add_noise(jax.random.PRNGKey(11), latent, noise_level=T_START)
finals = jax.jit(
    lambda p, n: engine.modulated_runs_batched(
        p, n, c, uc, masks_tokens, masks_latent, cache, T_START, chunk=2 * NUM_MASKS
    )
)(params, noised)
print("modulated finals:", finals.shape)
assert finals.shape == (2, NUM_MASKS, T, H, W, 4)
plus, minus = finals[0], finals[1]
diff_pm = float(jnp.max(jnp.abs(plus - minus)))
print("max |+λ − −λ| latent diff:", diff_pm)
assert diff_pm > 1e-3, "modulation had no effect!"

# ---- Step 5: difference maps → segmentation --------------------------------
d = jnp.sqrt(jnp.sum((plus - minus) ** 2, axis=-1))  # [M, T, H, W]
d = gaussian_blur(d, 5, 3.0)
seg = jnp.argmax(d, axis=0)  # [T, H, W]
print("seg labels:", np.unique(np.asarray(seg)))

# probe: blending must pin x outside the mask to the cached trajectory
m0 = masks_latent[0][..., None]
xt_final = cache["xt"][NUM_STEPS - 1]
outside = jnp.abs((finals[0, 0] - xt_final) * (1 - m0))
print("max |outside-mask deviation from cached traj|:", float(outside.max()))
assert float(outside.max()) < 1e-4, "latent blending failed to pin outside-mask region"

# probe: injection gate off (fresh engine without injection) still runs
eng2 = VidSegEngine(
    unet=unet, denoiser=engine.denoiser, sampler=engine.sampler,
    guider=engine.guider,
    mod_cfg=ModulationConfig(
        modulate_block_idx=(mod_block,), modulate_timestep=(T_START,),
        num_steps=NUM_STEPS, num_frames=T, is_injected_features=False,
        is_latent_blending=False,
    ),
    harvest=svd_harvest_spec(cluster_blocks=(mod_block,)),
)
f2 = eng2.modulated_run(
    params, noised, c, uc, masks_tokens[0], masks_latent[0],
    jnp.asarray(1.0), cache, T_START,
)
print("no-injection no-blend run:", f2.shape, "finite:", bool(jnp.all(jnp.isfinite(f2))))

print("END-TO-END SLICE OK")
