"""The VidSeg engine: feature harvest → modulated runs, all in HBM.

Re-designs the reference's five-step pipeline
(svd_single_video_inference.py:337-508) TPU-first:

- Step 2 (feature extraction pass): one jitted scan over denoise steps; the
  attention Q/K the method consumes are functional side-outputs (flax
  'intermediates'), stacked by the scan into [num_steps, ...] HBM caches —
  replacing per-step GPU→CPU→disk `.pt` dumps
  (svd_single_video_inference.py:113-149). The post-step latent x_t is
  cached the same way for latent blending (vs `load_xt` disk reads,
  sampling.py:229-250).
- Step 4 (modulation runs): one jitted function of (masks, ±λ); the
  reference's serial `for pn in {±λ}: for mask_id in range(num_masks)` loop
  (svd_single_video_inference.py:438-500) becomes a batch axis of
  2·num_masks runs, vmapped and shardable over a device mesh — the
  embarrassing parallelism the reference leaves on the table.
- Feature injection: the harvested caches are indexed at the traced step
  inside the scan (vs re-loading the same `.pt` files from disk for every
  block × step × mask run, video_model.py:480-562).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidseg_diffusion_tpu.diffusion.denoiser import Denoiser
from vidseg_diffusion_tpu.diffusion.sampling import EulerEDMSampler
from vidseg_diffusion_tpu.engine.modulation import ModulationConfig
from vidseg_diffusion_tpu.models.layers import (
    AttnInjection,
    BlockInjection,
    BlockModulation,
    Modulation,
)
from vidseg_diffusion_tpu.models.unet import UNetConfig, UNetHooks, UNetModel
from vidseg_diffusion_tpu.models.video_layers import SiteInjection, SiteModulation
from vidseg_diffusion_tpu.ops.image import resize_nearest

Cond = Dict[str, jnp.ndarray]


def _packed_stream_enabled() -> bool:
    """Stream each step's injected slice as ONE contiguous buffer (default)
    instead of one device_put per harvest entry. The 18 per-entry puts issue
    18 transport round-trips per step; through the tunneled runtime those
    serialize against the queued compute dispatches and the copies stop
    hiding behind compute (host_stream_bench r4: together 7.5 s vs 1.0 s
    copy + 1.4 s compute). One flat buffer = one DMA, which hides fully
    behind a deep dispatch queue (overlap_probe). VIDSEG_PACKED_STREAM=0
    opts back into per-entry puts."""
    return os.environ.get("VIDSEG_PACKED_STREAM", "1") == "1"


def _pack_step_slices(host_inj: Dict, idx: int):
    """Pack step `idx`'s per-entry host slices into one contiguous 1-D numpy
    buffer. Returns (flat, layout) with layout a static tuple of
    (name, offset, shape), or None when entry dtypes differ (mixed-dtype
    caches fall back to per-entry puts). A fresh buffer is allocated per
    call: the previous step's put may still be in flight and jax only holds
    a reference to — not a copy of — the source numpy array."""
    dtypes = {a.dtype for a in host_inj.values()}
    if len(dtypes) != 1:
        return None
    layout = []
    off = 0
    for name in sorted(host_inj):
        shape = tuple(int(d) for d in host_inj[name].shape[1:])
        layout.append((name, off, shape))
        off += int(np.prod(shape))
    flat = np.empty((off,), dtype=next(iter(dtypes)))
    for name, o, shape in layout:
        cnt = int(np.prod(shape))
        flat[o:o + cnt] = host_inj[name][idx].reshape(-1)
    return flat, tuple(layout)


def _unpack_step_slices(flat: jnp.ndarray, layout) -> Dict[str, jnp.ndarray]:
    """Traced inverse of _pack_step_slices: static-offset views of the flat
    streamed buffer, reshaped to each entry's per-step shape."""
    out = {}
    for name, off, shape in layout:
        cnt = 1
        for d in shape:
            cnt *= d
        out[name] = flat[off:off + cnt].reshape(shape)
    return out

# harvest site name → (module child, attn name) inside output_blocks_{i}_1
_SITES = {
    "spatial_self": ("transformer_blocks_0", "attn1"),
    "spatial_cross": ("transformer_blocks_0", "attn2"),
    "temporal_self": ("time_stack_0", "attn1"),
    "temporal_cross": ("time_stack_0", "attn2"),
}


@dataclasses.dataclass(frozen=True)
class HarvestSpec:
    """Which attention tensors the feature pass keeps in HBM.

    The reference saves every q/k of every output block
    (svd_single_video_inference.py:113-130) but consumes only a few
    (SURVEY.md §7); we harvest exactly the consumed set.
    entries: tuple of (block_idx, site, tensor) with site ∈ _SITES and
    tensor ∈ {q, k}."""

    entries: Tuple[Tuple[int, str, str], ...] = ()

    @staticmethod
    def name(block: int, site: str, tensor: str) -> str:
        return f"output_{block}_{site}_{tensor}"

    def extract(self, intermediates: Dict) -> Dict[str, jnp.ndarray]:
        out = {}
        for block, site, tensor in self.entries:
            child, attn = _SITES[site]
            leaf = intermediates[f"output_blocks_{block}_1"][child][attn][tensor]
            out[self.name(block, site, tensor)] = leaf[0]
        return out


def svd_harvest_spec(
    cluster_blocks: Sequence[int] = (8,),
    injection: bool = False,
    injection_blocks: Sequence[int] = tuple(range(3, 12)),
) -> HarvestSpec:
    """SVD defaults: spatial self-attn Q of the clustering blocks
    (svd_single_video_inference.py:362-367); temporal self-attn Q/K of
    attention-bearing output blocks when injecting (:411-417 — the
    temporal_cross types listed there are loaded but never consumed,
    video_attention.py:166-195, so they are not harvested)."""
    entries = [(b, "spatial_self", "q") for b in cluster_blocks]
    if injection:
        for b in injection_blocks:
            entries.append((b, "temporal_self", "q"))
            entries.append((b, "temporal_self", "k"))
    return HarvestSpec(tuple(entries))


def sd_harvest_spec(
    cluster_blocks: Sequence[int] = (7,),
    injection: bool = False,
    injection_blocks: Sequence[int] = tuple(range(3, 12)),
) -> HarvestSpec:
    """SD 2.1: spatial-only features; injection uses spatial self+cross Q/K
    (sd_pipeline_vspw.py:421-428; attention.py:616-687)."""
    entries = [(b, "spatial_self", "q") for b in cluster_blocks]
    if injection:
        for b in injection_blocks:
            for site in ("spatial_self", "spatial_cross"):
                entries.append((b, site, "q"))
                entries.append((b, site, "k"))
    return HarvestSpec(tuple(entries))


@dataclasses.dataclass(frozen=True)
class VidSegEngine:
    """Bundles UNet + denoiser + sampler + guider with the VidSeg hooks."""

    unet: UNetModel
    denoiser: Denoiser
    sampler: EulerEDMSampler
    guider: object  # VanillaCFG | LinearPredictionGuider | IdentityGuider
    mod_cfg: ModulationConfig
    harvest: HarvestSpec = HarvestSpec()

    # -- plumbing ------------------------------------------------------------

    def _apply_unet(
        self,
        params,
        x: jnp.ndarray,
        c_noise: jnp.ndarray,
        cond: Cond,
        hooks: Optional[UNetHooks],
        collect: bool,
        num_video_frames: int,
        image_only_indicator: Optional[jnp.ndarray],
    ):
        """OpenAIWrapper semantics (wrappers.py:23-34): concat-cond channels,
        crossattn→context, vector→y; plus intermediates collection."""
        if "concat" in cond:
            x = jnp.concatenate([x, cond["concat"].astype(x.dtype)], axis=-1)
        kwargs = dict(
            context=cond.get("crossattn"),
            y=cond.get("vector"),
            num_video_frames=num_video_frames,
            image_only_indicator=image_only_indicator,
            hooks=hooks,
        )
        if collect:
            out, state = self.unet.apply(
                {"params": params}, x, c_noise, mutable=["intermediates"], **kwargs
            )
            return out, self.harvest.extract(state["intermediates"])
        out = self.unet.apply({"params": params}, x, c_noise, **kwargs)
        return out, {}

    def _denoise_fn(
        self,
        params,
        c: Cond,
        uc: Cond,
        num_video_frames: int,
        hooks_fn: Optional[Callable[[jnp.ndarray], UNetHooks]] = None,
        collect: bool = False,
        collect_xt: bool = False,
    ):
        """Build denoise_fn(x, sigma, i) for the sampler scan.

        aux = harvested tensors (+ nothing else); the sampler stacks it over
        steps. CFG batching follows the guider ([uc; c] on axis 0)."""

        def denoise_fn(x, sigma, i):
            b = x.shape[0]
            s = jnp.full((b,), sigma, dtype=x.dtype)
            x_in, s_in, cond = self.guider.prepare_inputs(x, s, c, uc)
            # rows follow the guider's batch factor (2 for CFG guiders, 1
            # for IdentityGuider — the hardcoded 2 broke the latter)
            ioi = jnp.zeros(
                (x_in.shape[0] // num_video_frames, num_video_frames),
                dtype=x.dtype,
            )
            hooks = hooks_fn(i) if hooks_fn is not None else None
            if collect and hooks is None:
                # sow only at harvested sites — sowing every block's q/k
                # under mutable=['intermediates'] writes GBs per step
                hooks = UNetHooks(
                    sow_blocks=tuple(sorted({b for b, _, _ in self.harvest.entries}))
                )

            def network(xs, c_noise, cond_d):
                return self._apply_unet(
                    params, xs, c_noise, cond_d, hooks, collect,
                    num_video_frames, ioi,
                )

            denoised, aux = _denoiser_with_aux(self.denoiser, network, x_in, s_in, cond)
            return self.guider(denoised, sigma), aux

        return denoise_fn

    # -- engine-lifetime jitted entry points -----------------------------------
    # jax.jit wrappers must NOT be rebuilt per pipeline call: a fresh wrapper
    # re-traces and re-loads the compiled 1.5B-param executable from the
    # persistent cache every run (tens of seconds of jitter per stage,
    # r2 swan measurements). cached_property pins them to the engine, and
    # Pipeline.make_engine caches engines by (mod_cfg, harvest).

    @functools.cached_property
    def jit_add_noise(self):
        def f(latent, rng, *, noise_level):
            return self.sampler.add_noise(rng, latent, noise_level=noise_level)

        return jax.jit(f, static_argnames=("noise_level",))

    @functools.cached_property
    def jit_invert(self):
        return jax.jit(
            lambda params, latent, c, uc: self.invert(params, latent, c, uc)
        )

    @functools.cached_property
    def jit_xt_cache(self):
        def f(params, latent, c, uc, rng, pre_noised, *, t_start):
            return self.xt_cache_pass(
                params, latent, c, uc, rng, t_start, pre_noised=pre_noised
            )

        return jax.jit(f, static_argnames=("t_start",))

    @functools.cached_property
    def jit_mod_step(self):
        cfg = self.mod_cfg
        sampler = self.sampler
        b_start, b_end = cfg.blend_window()
        blend = cfg.is_latent_blending

        # params / cache / conds are ARGUMENTS, not closures: closed-over
        # concrete arrays become giant embedded constants (1.5B params +
        # the GB-scale feature cache) that multiply compile time ~10×.
        def step_impl(params_, cache_, c_, uc_, x, i, sigma, next_sigma,
                      gamma, masks_tok, masks_lat, lam):
            hooks_fn = self._build_hooks_fn(masks_tok, lam, cache_)
            denoise_fn = self._denoise_fn(
                params_, c_, uc_, cfg.num_frames, hooks_fn=hooks_fn, collect=False
            )
            x, _ = sampler.step(denoise_fn, x, sigma, next_sigma, i, gamma)
            if blend and "xt" in cache_:
                mlat = masks_lat[:, :, :, None]
                gate = (i >= b_start) & (i <= b_end)
                ori = _cache_step(cache_, "xt", i)
                blended = x * mlat + ori.astype(x.dtype) * (1.0 - mlat)
                x = jnp.where(gate, blended, x)
            return x

        return jax.jit(step_impl)

    @functools.cached_property
    def jit_mod_step_sliced(self):
        """jit_mod_step variant for host-offloaded injected caches: the
        big per-step q/k slices arrive pre-selected (streamed from host RAM
        each step), only the small xt/t0 cache lives on device. v5e HBM
        (16 GB) cannot hold the full injected cache (~8.7 GB windowed at
        swan scale) next to the 3 GB params and the runs working set."""
        return jax.jit(self._mod_step_sliced_impl)

    def _mod_step_sliced_impl(self, params_, dev_cache_, step_inj_, c_, uc_,
                              x, i, sigma, next_sigma, gamma, masks_tok,
                              masks_lat, lam):
        """Shared (traceable) body of the host-streamed-injection step —
        jitted directly by jit_mod_step_sliced (per-entry dict) and via the
        flat-buffer unpack by jit_mod_step_packed."""
        cfg = self.mod_cfg
        sampler = self.sampler
        b_start, b_end = cfg.blend_window()
        blend = cfg.is_latent_blending
        # harvest entries that stayed in the DEVICE cache (e.g. the
        # cluster blocks' spatial_self q, which the mask stage needs
        # resident) must still inject: merge their per-step slice into
        # the host-streamed slice. Without this, an SD run whose cluster
        # block is also an injection block silently skipped that
        # block's q injection whenever the cache was host-offloaded.
        merged = dict(step_inj_)
        for b_, site_, tensor_ in self.harvest.entries:
            name_ = HarvestSpec.name(b_, site_, tensor_)
            if name_ in dev_cache_ and name_ not in merged:
                merged[name_] = _cache_step(dev_cache_, name_, i)
        hooks_fn = self._build_hooks_fn(
            masks_tok, lam, merged, sliced=True
        )
        denoise_fn = self._denoise_fn(
            params_, c_, uc_, cfg.num_frames, hooks_fn=hooks_fn, collect=False
        )
        x, _ = sampler.step(denoise_fn, x, sigma, next_sigma, i, gamma)
        if blend and "xt" in dev_cache_:
            mlat = masks_lat[:, :, :, None]
            gate = (i >= b_start) & (i <= b_end)
            ori = _cache_step(dev_cache_, "xt", i)
            blended = x * mlat + ori.astype(x.dtype) * (1.0 - mlat)
            x = jnp.where(gate, blended, x)
        return x

    @functools.cached_property
    def jit_mod_step_packed(self):
        """jit_mod_step_sliced taking the step's injected slices as ONE
        flat streamed buffer + a static layout (see _pack_step_slices)."""

        def step_impl(params_, dev_cache_, flat_, c_, uc_, x, i, sigma,
                      next_sigma, gamma, masks_tok, masks_lat, lam, *,
                      layout):
            step_inj_ = _unpack_step_slices(flat_, layout)
            return self._mod_step_sliced_impl(
                params_, dev_cache_, step_inj_, c_, uc_, x, i, sigma,
                next_sigma, gamma, masks_tok, masks_lat, lam,
            )

        return jax.jit(step_impl, static_argnames=("layout",))

    @functools.cached_property
    def jit_feat_step(self):
        """One harvesting Euler step for the host-stepped feature pass:
        returns (x_next, aux) so each step's harvest can leave HBM before
        the next step runs — the one-scan feature pass would otherwise hold
        the full injected cache (~8.7 GB at swan scale) on device."""
        cfg = self.mod_cfg
        sampler = self.sampler

        def f(params_, c_, uc_, x, i, sigma, next_sigma, gamma):
            denoise_fn = self._denoise_fn(
                params_, c_, uc_, cfg.num_frames, collect=True
            )
            xn, aux = sampler.step(denoise_fn, x, sigma, next_sigma, i, gamma)
            aux = dict(aux)
            aux["xt"] = xn
            return xn, aux

        return jax.jit(f)

    def xt_cache_pass_host(
        self,
        params,
        latent: jnp.ndarray,
        c: Cond,
        uc: Cond,
        rng: jax.Array,
        t_start: int,
        pre_noised: Optional[jnp.ndarray] = None,
        host_names: Sequence[str] = (),
    ):
        """xt_cache_pass with host-level stepping: entries named in
        `host_names` are copied to host RAM as they are produced (numpy
        [W, ...] arrays in the returned second dict); everything else is
        stacked on device. Same cache contract ('t0' window origin).
        Returns (x0, device_cache, host_cache)."""
        cfg = self.mod_cfg
        if pre_noised is not None:
            noised = pre_noised
        else:
            noised = self.sampler.add_noise(rng, latent, noise_level=t_start)
        sigmas = self.sampler.sigmas()
        x = self.sampler.prescale(noised, sigmas)
        dev_steps: Dict[str, list] = {}
        host_steps: Dict[str, list] = {}
        import numpy as np

        gammas = self.sampler._gamma(sigmas, self.sampler.num_steps + 1)
        pending = None  # previous step's host-bound arrays, copy in flight

        def drain(p):
            for name, arr in p:
                host_steps.setdefault(name, []).append(np.asarray(arr))

        for i in range(t_start, self.sampler.num_steps):
            x, aux = self.jit_feat_step(
                params, c, uc, x, jnp.asarray(i), sigmas[i], sigmas[i + 1],
                gammas[i],
            )
            to_host = []
            for name, arr in aux.items():
                if name in host_names:
                    # start the async D2H now; materialize AFTER the next
                    # step is dispatched so transfer overlaps compute (a
                    # blocking np.asarray here serialized ~1 GB/step of
                    # copies with the denoise steps)
                    arr.copy_to_host_async()
                    to_host.append((name, arr))
                else:
                    dev_steps.setdefault(name, []).append(arr)
            if pending is not None:
                drain(pending)
            pending = to_host
        if pending is not None:
            drain(pending)
        dev_cache = {n: jnp.stack(v) for n, v in dev_steps.items()}
        dev_cache["t0"] = jnp.asarray(t_start, jnp.int32)
        host_cache = {n: np.stack(v) for n, v in host_steps.items()}
        return x, dev_cache, host_cache

    @functools.cached_property
    def jit_run_one(self):
        def f(p_, n_, c_, u_, k_, mt, ml, sg, *, t_start):
            return self.modulated_run(p_, n_, c_, u_, mt, ml, sg, k_, t_start)

        return jax.jit(f, static_argnames=("t_start",))

    @functools.cached_property
    def jit_run_vmapped(self):
        def f(p_, n_, c_, u_, k_, mt, ml, sg, *, t_start):
            return jax.vmap(
                lambda mt_, ml_, sg_: self.modulated_run(
                    p_, n_, c_, u_, mt_, ml_, sg_, k_, t_start
                )
            )(mt, ml, sg)

        return jax.jit(f, static_argnames=("t_start",))

    # -- step 1+2: noise + feature pass ---------------------------------------

    def feature_pass(
        self,
        params,
        latent: jnp.ndarray,  # [T, h, w, z] clean video latents (pre-noise)
        c: Cond,
        uc: Cond,
        rng: jax.Array,
        t_start: int,
    ):
        """add_noise at σ[t_start] then denoise t_start..end, harvesting.

        Returns (x0, cache) where cache maps harvest names → WINDOWED
        [num_steps - t_start, ...] arrays plus "t0" (the window's first step
        index) and "xt" → the post-step latent trajectory used for blending.
        Consumers index step i at [i - t0] (see _cache_step); a cache built
        without "t0" is treated as full-length (t0 = 0). Windowed storage
        matters: a zero-padded full-length injected-feature cache is 3.1×
        larger and OOMs a 16 GB v5e at swan scale."""
        cfg = self.mod_cfg
        noised = self.sampler.add_noise(rng, latent, noise_level=t_start)
        denoise_fn = self._denoise_fn(
            params, c, uc, cfg.num_frames, collect=True
        )
        x0, aux = self.sampler(denoise_fn, noised, t_start=t_start)
        cache = {name: arr for name, arr in aux.items()}
        cache["t0"] = jnp.asarray(t_start, jnp.int32)
        return x0, cache

    def invert(self, params, latent: jnp.ndarray, c: Cond, uc: Cond) -> jnp.ndarray:
        """Step-1 DDIM inversion (svd_single_video_inference.py:341-342,
        sampling.py:264-296): un-modulated CFG denoising over the flipped σ
        schedule. Returns the noised latent in the same √(1+σ₀²)-normalized
        frame `add_noise` produces, so it slots into the feature pass and
        the modulated runs unchanged."""
        denoise_fn = self._denoise_fn(
            params, c, uc, self.mod_cfg.num_frames, collect=False
        )
        x, _ = self.sampler.inversion(denoise_fn, latent)
        return x

    def xt_cache_pass(
        self,
        params,
        latent: jnp.ndarray,
        c: Cond,
        uc: Cond,
        rng: jax.Array,
        t_start: int,
        pre_noised: Optional[jnp.ndarray] = None,
    ):
        """Like feature_pass but additionally records x after every step
        (the reference's xt_time_{i}.pt, svd_single_video_inference.py:130).

        Note the reference harvests features from `t_start` of the *feature*
        pass but blends latents cached at the same step indices; one pass
        produces both here. `pre_noised` (e.g. an inversion output) replaces
        the internal add_noise when given."""
        cfg = self.mod_cfg
        if pre_noised is not None:
            noised = pre_noised
        else:
            noised = self.sampler.add_noise(rng, latent, noise_level=t_start)
        denoise_fn = self._denoise_fn(params, c, uc, cfg.num_frames, collect=True)
        # _sample_with_xt re-runs the scan logic because the sampler's aux
        # comes from denoise_fn (pre-step) while x_t is the post-step latent
        x0, aux = _sample_with_xt(self.sampler, denoise_fn, noised, t_start)
        cache = {name: arr for name, arr in aux.items()}
        cache["t0"] = jnp.asarray(t_start, jnp.int32)
        return x0, cache

    # -- step 4: modulated runs ------------------------------------------------

    def _build_hooks_fn(
        self,
        masks_tokens: jnp.ndarray,  # [T, L_block] at the modulated block's res
        lam: jnp.ndarray,           # [T] signed per-frame λ
        cache: Optional[Dict[str, jnp.ndarray]],
        sliced: bool = False,       # cache entries already selected per step
    ) -> Callable[[jnp.ndarray], UNetHooks]:
        cfg = self.mod_cfg
        step_frames = cfg.step_frame_table()  # [S, T] bool
        video = self.unet.config.video

        def hooks_fn(i):
            frame_gate = step_frames[i]
            enabled = jnp.any(frame_gate)
            mod = Modulation(
                masks=masks_tokens, lam=lam, frame_gate=frame_gate,
                enabled=enabled, modulate_uc=cfg.modulate_uc,
            )
            block_mod = BlockModulation(
                self_attn=mod if "self_attn" in cfg.modulate_attn_type else None,
                cross_attn=mod if "cross_attn" in cfg.modulate_attn_type else None,
                ff_out=mod if "ff_out" in cfg.modulate_attn_type else None,
            )
            site_mod = SiteModulation(
                spatial=block_mod if "spatial" in cfg.modulate_layer_type else None,
                temporal=(
                    block_mod
                    if (video and "temporal" in cfg.modulate_layer_type)
                    else None
                ),
            )
            output_mod = {b: site_mod for b in cfg.modulate_block_idx}

            output_inj: Dict[int, SiteInjection] = {}
            if cfg.is_injected_features and cache is not None:
                gate = cfg.inject_gate_for_step(i)
                for b in cfg.output_block_indices:
                    site = _injection_site_for_block(
                        b, cache, None if sliced else i, gate, video, self.harvest
                    )
                    if site is not None:
                        output_inj[b] = site
            return UNetHooks(output_mod=output_mod, output_inj=output_inj)

        return hooks_fn

    def modulated_run(
        self,
        params,
        noised: jnp.ndarray,        # output of sampler.add_noise on the video latents
        c: Cond,
        uc: Cond,
        masks_tokens: jnp.ndarray,  # [T, L_block]
        masks_latent: jnp.ndarray,  # [T, h, w] nearest-resized to latent res
        lam_sign: jnp.ndarray,      # scalar ±1
        cache: Dict[str, jnp.ndarray],
        t_start: int,
    ) -> jnp.ndarray:
        """One (mask, ±λ) modulated denoise (svd_single_video_inference.py:497
        inner call). Returns the final latent [T, h, w, z]."""
        cfg = self.mod_cfg
        lam = cfg.lam() * lam_sign
        hooks_fn = self._build_hooks_fn(masks_tokens, lam, cache)
        denoise_fn = self._denoise_fn(
            params, c, uc, cfg.num_frames, hooks_fn=hooks_fn, collect=False
        )

        post_step_fn = None
        if cfg.is_latent_blending:
            b_start, b_end = cfg.blend_window()
            m = masks_latent[:, :, :, None]  # [T, h, w, 1]

            def post_step_fn(x, i):
                gate = (i >= b_start) & (i <= b_end)
                ori = _cache_step(cache, "xt", i)
                blended = x * m + ori.astype(x.dtype) * (1.0 - m)
                return jnp.where(gate, blended, x)

        x_final, _ = self.sampler(
            denoise_fn, noised, t_start=t_start, post_step_fn=post_step_fn
        )
        return x_final

    def modulated_runs_batched(
        self,
        params,
        noised: jnp.ndarray,
        c: Cond,
        uc: Cond,
        masks_tokens: jnp.ndarray,  # [M, T, L]
        masks_latent: jnp.ndarray,  # [M, T, h, w]
        cache: Dict[str, jnp.ndarray],
        t_start: int,
        chunk: int = 1,
    ) -> jnp.ndarray:
        """All 2·M (±λ, mask) runs as one batched computation.

        Layout: runs r = sign_idx·M + mask_id with sign +λ for sign_idx 0.
        Returns final latents [2, M, T, h, w, z]. `chunk` bounds how many
        runs execute concurrently per device (lax.map over chunks of a
        vmapped body) — the (runs) axis is the natural mesh-sharding axis."""
        m = masks_tokens.shape[0]
        signs = jnp.array([1.0, -1.0], dtype=jnp.float32)
        run_masks_t = jnp.concatenate([masks_tokens, masks_tokens], 0)  # [2M,T,L]
        run_masks_l = jnp.concatenate([masks_latent, masks_latent], 0)
        run_signs = jnp.repeat(signs, m)  # [2M]

        def one(mt, ml, sg):
            return self.modulated_run(
                params, noised, c, uc, mt, ml, sg, cache, t_start
            )

        total = 2 * m
        if chunk >= total:
            out = jax.vmap(one)(run_masks_t, run_masks_l, run_signs)
        else:
            assert total % chunk == 0, (total, chunk)
            rm_t = run_masks_t.reshape((total // chunk, chunk) + run_masks_t.shape[1:])
            rm_l = run_masks_l.reshape((total // chunk, chunk) + run_masks_l.shape[1:])
            rs = run_signs.reshape(total // chunk, chunk)
            out = jax.lax.map(
                lambda args: jax.vmap(one)(*args), (rm_t, rm_l, rs)
            )
            out = out.reshape((total,) + out.shape[2:])
        return out.reshape((2, m) + out.shape[1:])

    def modulated_runs_sharded(
        self,
        params,
        noised: jnp.ndarray,
        c: Cond,
        uc: Cond,
        masks_tokens: jnp.ndarray,  # [M, T, L]
        masks_latent: jnp.ndarray,  # [M, T, h, w]
        cache: Dict[str, jnp.ndarray],
        t_start: int,
        mesh,
    ) -> jnp.ndarray:
        """The runs grid sharded over the mesh's 'runs' axis: one jitted
        program computes all 2·M (mask, ±λ) runs with each device executing
        its own run-column (params / latents / feature cache replicated, no
        collectives on the hot path). This is the multi-chip form of the
        reference's serial `for pn: for mask_id:` loop
        (svd_single_video_inference.py:438-500).

        Runs are padded to a multiple of the runs-axis size and processed
        one-per-device per lax.map step (same per-device footprint as the
        host-chunked path)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        nd = mesh.shape["runs"]
        repl = NamedSharding(mesh, P())
        rsh = NamedSharding(mesh, P(None, "runs"))

        m = masks_tokens.shape[0]
        total = 2 * m
        run_mt = jnp.concatenate([masks_tokens, masks_tokens], 0)
        run_ml = jnp.concatenate([masks_latent, masks_latent], 0)
        run_sg = jnp.repeat(jnp.array([1.0, -1.0], jnp.float32), m)
        g = -(-total // nd)  # ceil: pad with wrapped duplicates, drop later
        idx = jnp.arange(g * nd) % total
        rm_t = run_mt[idx].reshape((g, nd) + run_mt.shape[1:])
        rm_l = run_ml[idx].reshape((g, nd) + run_ml.shape[1:])
        rs = run_sg[idx].reshape(g, nd)

        out = self._sharded_runs_jit(mesh, t_start)(
            jax.device_put(params, repl),
            jax.device_put(noised, repl),
            jax.device_put(c, repl),
            jax.device_put(uc, repl),
            jax.device_put(cache, repl),
            jax.device_put(rm_t, rsh),
            jax.device_put(rm_l, rsh),
            jax.device_put(rs, rsh),
        )
        out = out.reshape((g * nd,) + out.shape[2:])[:total]
        return out.reshape((2, m) + out.shape[1:])

    @functools.cached_property
    def _sharded_jit_cache(self):
        return {}

    def _sharded_runs_jit(self, mesh, t_start: int):
        """Engine-pinned jit wrapper for the sharded runs grid, keyed on
        (mesh, t_start): rebuilding the wrapper per call re-traces the
        full program per video — the same tens-of-seconds jitter the
        cached_property wrappers eliminate on the host paths."""
        key = ("runs", mesh, t_start)
        if key not in self._sharded_jit_cache:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            rsh = NamedSharding(mesh, P(None, "runs"))

            def runs_fn(p, n_, c_, u_, k_, mt, ml, sg):
                def body(grp):
                    mt_, ml_, sg_ = grp
                    return jax.vmap(
                        lambda a, b, s: self.modulated_run(
                            p, n_, c_, u_, a, b, s, k_, t_start
                        )
                    )(mt_, ml_, sg_)

                return jax.lax.map(body, (mt, ml, sg))

            self._sharded_jit_cache[key] = jax.jit(
                runs_fn,
                in_shardings=(repl, repl, repl, repl, repl, rsh, rsh, rsh),
                out_shardings=rsh,
            )
        return self._sharded_jit_cache[key]

    def _sharded_step_jit(self, mesh, sliced):
        """One mesh-sharded Euler step over the [g, nd, ...] runs grid
        (runs axis sharded, everything else replicated), cached per
        (mesh, sliced). The sliced variant takes the current step's
        host-streamed injected q/k slices as a replicated argument —
        the full injected cache never resides in HBM (the v5e cannot hold
        the ~8.7 GB swan-scale cache replicated next to params + runs
        working set, VERDICT r2 weak #2). sliced='packed' takes them as
        ONE flat replicated buffer + static layout (_pack_step_slices) —
        one DMA per device per step instead of one per harvest entry."""
        key = ("step", mesh, sliced)
        if key not in self._sharded_jit_cache:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            rsh = NamedSharding(mesh, P(None, "runs"))
            cfg = self.mod_cfg
            sampler = self.sampler
            b_start, b_end = cfg.blend_window()
            blend = cfg.is_latent_blending

            def step_impl(params_, dev_cache_, step_inj_, c_, uc_, x, i,
                          sigma, next_sigma, gamma, mt, ml, lam,
                          layout=None):
                if layout is not None:
                    step_inj_ = _unpack_step_slices(step_inj_, layout)

                def single(x1, mt1, ml1, lam1):
                    if sliced:
                        merged = dict(step_inj_)
                        for b_, site_, tensor_ in self.harvest.entries:
                            name_ = HarvestSpec.name(b_, site_, tensor_)
                            if name_ in dev_cache_ and name_ not in merged:
                                merged[name_] = _cache_step(dev_cache_, name_, i)
                        hooks_fn = self._build_hooks_fn(
                            mt1, lam1, merged, sliced=True
                        )
                    else:
                        hooks_fn = self._build_hooks_fn(mt1, lam1, dev_cache_)
                    denoise_fn = self._denoise_fn(
                        params_, c_, uc_, cfg.num_frames, hooks_fn=hooks_fn
                    )
                    xn, _ = sampler.step(denoise_fn, x1, sigma, next_sigma, i,
                                         gamma)
                    if blend and "xt" in dev_cache_:
                        mlat = ml1[:, :, :, None]
                        gate = (i >= b_start) & (i <= b_end)
                        ori = _cache_step(dev_cache_, "xt", i)
                        blended = xn * mlat + ori.astype(xn.dtype) * (1.0 - mlat)
                        xn = jnp.where(gate, blended, xn)
                    return xn

                return jax.lax.map(
                    lambda grp: jax.vmap(single)(*grp), (x, mt, ml, lam)
                )

            self._sharded_jit_cache[key] = jax.jit(
                step_impl,
                in_shardings=(
                    repl, repl, repl, repl, repl, rsh,
                    repl, repl, repl, repl, rsh, rsh, rsh,
                ),
                out_shardings=rsh,
                static_argnums=(13,),
            )
        return self._sharded_jit_cache[key]

    def modulated_runs_sharded_stepped(
        self,
        params,
        noised: jnp.ndarray,
        c: Cond,
        uc: Cond,
        masks_tokens: jnp.ndarray,  # [M, T, L]
        masks_latent: jnp.ndarray,  # [M, T, h, w]
        cache: Dict[str, jnp.ndarray],
        t_start: int,
        mesh,
        host_inj: Optional[Dict] = None,
        progress: Optional[Callable[[int, int], None]] = None,
    ) -> jnp.ndarray:
        """Mesh form of modulated_runs_host_stepped: the runs grid is
        sharded over the mesh's 'runs' axis while each step's oversized
        injected q/k slice streams host→devices replicated (one host→HBM
        copy per device per STEP). This is how --is_injected_features runs
        multi-chip on 16 GB v5e parts: HBM per device holds params + the
        per-device run state + ONE step's injected slice, never the full
        windowed cache. Injection gating semantics preserved from
        video_model.py:480-562."""
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        rsh = NamedSharding(mesh, P(None, "runs"))
        nd = mesh.shape["runs"]
        cfg = self.mod_cfg
        sampler = self.sampler
        sigmas = sampler.sigmas()
        t0 = int(cache.get("t0", 0))
        m = masks_tokens.shape[0]
        total = 2 * m
        g = -(-total // nd)
        idx = np.arange(g * nd) % total

        run_mt = jnp.concatenate([masks_tokens, masks_tokens], 0)[idx]
        run_ml = jnp.concatenate([masks_latent, masks_latent], 0)[idx]
        lam_base = cfg.lam()
        signs = jnp.repeat(jnp.array([1.0, -1.0], lam_base.dtype), m)[idx]
        run_lam = signs[:, None] * lam_base[None, :]
        rs = lambda a: a.reshape((g, nd) + a.shape[1:])

        x0 = sampler.prescale(noised, sigmas)
        xs = jnp.broadcast_to(x0, (g, nd) + x0.shape)

        params_r = jax.device_put(params, repl)
        cache_r = jax.device_put(cache, repl)
        c_r = jax.device_put(c, repl)
        uc_r = jax.device_put(uc, repl)
        mt_r = jax.device_put(rs(run_mt), rsh)
        ml_r = jax.device_put(rs(run_ml), rsh)
        lam_r = jax.device_put(rs(run_lam), rsh)
        xs = jax.device_put(xs, rsh)

        inject_steps = set()
        if host_inj:
            inject_steps = {
                i for i in range(t_start, sampler.num_steps)
                if cfg.inject_step_static(i)
            }
        n_steps = sampler.num_steps - t_start
        gammas = sampler._gamma(sigmas, sampler.num_steps + 1)
        # double-buffered H2D (same pattern as modulated_runs_host_stepped):
        # the replicated put for inject step j is issued right after the
        # previous step's dispatch so it hides behind queued device compute
        inject_list = sorted(inject_steps)
        packed_ok = _packed_stream_enabled()

        def put_slice(j):
            if packed_ok:
                packed = _pack_step_slices(host_inj, j - t0)
                if packed is not None:
                    flat, layout = packed
                    return jax.device_put(flat, repl), layout
            return {
                name: jax.device_put(jnp.asarray(arr[j - t0]), repl)
                for name, arr in host_inj.items()
            }

        pending: Dict[int, Dict] = {}
        if inject_list and inject_list[0] <= t_start + 1:
            # only when the first inject step is (nearly) immediate — a
            # later one is prefetched by the one-slot lookahead below
            pending[inject_list[0]] = put_slice(inject_list[0])
        for n, i in enumerate(range(t_start, sampler.num_steps)):
            args = (c_r, uc_r, xs, jnp.asarray(i), sigmas[i], sigmas[i + 1],
                    gammas[i], mt_r, ml_r, lam_r)
            step_inj = pending.pop(i, None)
            if isinstance(step_inj, tuple):
                flat, layout = step_inj
                xs = self._sharded_step_jit(mesh, sliced="packed")(
                    params_r, cache_r, flat, *args, layout
                )
            elif step_inj is not None:
                xs = self._sharded_step_jit(mesh, sliced=True)(
                    params_r, cache_r, step_inj, *args
                )
            else:
                xs = self._sharded_step_jit(mesh, sliced=False)(
                    params_r, cache_r, {}, *args
                )
            # one-slot lookahead ONLY: putting a slice many steps early has
            # no overlap benefit and pins a full replicated step slice
            # (~1.1 GB/device at swan scale) in HBM across every intervening
            # non-inject step — on sparse inject schedules that residency
            # eats the already-tight v5e headroom
            nxt = next((j for j in inject_list if j > i), None)
            if nxt is not None and nxt <= i + 1 and nxt not in pending:
                pending[nxt] = put_slice(nxt)
            del step_inj
            if progress is not None:
                progress(n + 1, n_steps)
        out = xs.reshape((g * nd,) + xs.shape[2:])[:total]
        return out.reshape((2, m) + out.shape[1:])

    def modulated_runs_host_stepped(
        self,
        params,
        noised: jnp.ndarray,
        c: Cond,
        uc: Cond,
        masks_tokens: jnp.ndarray,  # [M, T, L]
        masks_latent: jnp.ndarray,  # [M, T, h, w]
        cache: Dict[str, jnp.ndarray],
        t_start: int,
        progress: Optional[Callable[[int, int], None]] = None,
        host_inj: Optional[Dict] = None,  # injected q/k kept in HOST RAM
        on_run_done: Optional[Callable[[int, jnp.ndarray], None]] = None,
    ) -> jnp.ndarray:
        """Runs grid with host-level stepping: ONE jitted program = one
        Euler step (UNet forward + modulation + blending), reused across all
        steps and all (mask, ±λ) runs via traced arguments. The smallest
        possible compile unit — the scan-over-steps variants compile a much
        larger program (which the constrained local compile helper cannot
        always finish for the full-size UNet).

        host_inj: numpy arrays [W, ...] windowed at cache['t0']; each
        injected step's slice streams host→HBM on demand so the full
        injected cache never resides in device memory."""
        cfg = self.mod_cfg
        sampler = self.sampler
        sigmas = sampler.sigmas()
        t0 = int(cache.get("t0", 0))
        inject_steps = set()
        if host_inj:
            inject_steps = {
                i for i in range(t_start, sampler.num_steps)
                if cfg.inject_step_static(i)
            }

        gammas = sampler._gamma(sigmas, sampler.num_steps + 1)

        def step_fn(step_inj, x, i, sigma, next_sigma, masks_tok, masks_lat, lam):
            if isinstance(step_inj, tuple):  # packed (flat buffer, layout)
                flat, layout = step_inj
                return self.jit_mod_step_packed(
                    params, cache, flat, c, uc, x, jnp.asarray(i),
                    sigma, next_sigma, gammas[i], masks_tok, masks_lat, lam,
                    layout=layout,
                )
            if step_inj is not None:
                return self.jit_mod_step_sliced(
                    params, cache, step_inj, c, uc, x, jnp.asarray(i),
                    sigma, next_sigma, gammas[i], masks_tok, masks_lat, lam,
                )
            return self.jit_mod_step(
                params, cache, c, uc, x, jnp.asarray(i), sigma, next_sigma,
                gammas[i], masks_tok, masks_lat, lam,
            )

        m = masks_tokens.shape[0]
        x0 = sampler.prescale(noised, sigmas)
        total = 2 * m
        lams = [cfg.lam() * sign for sign in (1.0, -1.0) for _ in range(m)]
        mts = [masks_tokens[r % m] for r in range(total)]
        mls = [masks_latent[r % m] for r in range(total)]
        xs = [x0] * total
        n_steps = sampler.num_steps - t_start

        if host_inj is None and on_run_done is not None:
            # runs OUTER: each run's final latent is available as soon as
            # its last step is dispatched, so the caller can interleave
            # downstream work (decode dispatches) with the next run's
            # denoising — no end-of-stage dispatch bubble. Only valid
            # without host-streamed injection (steps-outer streams each
            # slice once for ALL runs).
            for r in range(total):
                x = x0
                for i in range(t_start, sampler.num_steps):
                    x = step_fn(
                        None, x, i, sigmas[i], sigmas[i + 1],
                        mts[r], mls[r], lams[r],
                    )
                xs[r] = x
                on_run_done(r, x)
                if progress is not None:
                    progress(r + 1, total)
            return jnp.stack(xs).reshape((2, m) + x0.shape)

        done = 0
        # steps OUTER, runs inner: every run consumes the same per-step
        # injected slice, so host→HBM streaming is once per STEP (≈1.1 GB)
        # instead of once per (run, step) — 2·M× less transfer.
        #
        # Double-buffered H2D: the put for inject step j is issued right
        # after the PREVIOUS step's 2·M run dispatches (one-slot lookahead),
        # so the transfer rides behind seconds of queued device compute.
        # Measured (scripts/tests/overlap_probe.py): transfers hide FULLY
        # behind a deep dispatch queue (hidden fraction 1.0) but not behind
        # a shallow one — hence prefetch-after-dispatch, never put-then-wait.
        inject_list = sorted(inject_steps)
        packed_ok = _packed_stream_enabled()

        def put_slice(j):
            if packed_ok:
                packed = _pack_step_slices(host_inj, j - t0)
                if packed is not None:
                    flat, layout = packed
                    return jnp.asarray(flat), layout
            return {
                name: jnp.asarray(arr[j - t0]) for name, arr in host_inj.items()
            }

        pending: Dict[int, Dict] = {}
        if inject_list and inject_list[0] <= t_start + 1:
            # first slice has no compute to hide behind (t_start == first
            # inject step on the reference schedule) — pay it up front; a
            # LATER first inject step is prefetched by the one-slot
            # lookahead below instead (no early HBM residency)
            pending[inject_list[0]] = put_slice(inject_list[0])
        for i in range(t_start, sampler.num_steps):
            step_inj = pending.pop(i, None)
            for r in range(total):
                xs[r] = step_fn(
                    step_inj, xs[r], i, sigmas[i], sigmas[i + 1],
                    mts[r], mls[r], lams[r],
                )
            # prefetch the next inject slice while this step's runs execute;
            # dropping step_inj releases the consumed device buffers. One-
            # slot lookahead ONLY (nxt == i+1): an earlier put has no
            # overlap benefit and pins the ~1.1 GB slice in HBM across all
            # intervening non-inject steps on sparse schedules
            nxt = next((j for j in inject_list if j > i), None)
            if nxt is not None and nxt <= i + 1 and nxt not in pending:
                pending[nxt] = put_slice(nxt)
            del step_inj
            done += 1
            if progress is not None:
                progress(done, n_steps)
        return jnp.stack(xs).reshape((2, m) + x0.shape)

    def modulated_runs_host_chunked(
        self,
        params,
        noised: jnp.ndarray,
        c: Cond,
        uc: Cond,
        masks_tokens: jnp.ndarray,  # [M, T, L]
        masks_latent: jnp.ndarray,  # [M, T, h, w]
        cache: Dict[str, jnp.ndarray],
        t_start: int,
        chunk: int = 1,
        progress: Optional[Callable[[int, int], None]] = None,
    ) -> jnp.ndarray:
        """Same runs grid as modulated_runs_batched, but dispatched one
        chunk-program at a time from the host: identical compute, much
        shorter device executions (a single program looping all 2·M runs
        can exceed worker execution limits), and per-chunk progress. Use
        the batched/sharded variant for multi-chip meshes."""
        m = masks_tokens.shape[0]
        signs = jnp.array([1.0, -1.0], dtype=jnp.float32)
        run_masks_t = jnp.concatenate([masks_tokens, masks_tokens], 0)
        run_masks_l = jnp.concatenate([masks_latent, masks_latent], 0)
        run_signs = jnp.repeat(signs, m)
        total = 2 * m
        chunk = min(chunk, total)
        # the chunk loop needs an exact tiling; M is user/data dependent
        # (num_masks, or the GT label count), so round DOWN to the largest
        # divisor — never crash after the expensive feature pass
        while total % chunk:
            chunk -= 1

        # params/noised/conds/cache as jit ARGUMENTS (closed-over arrays
        # embed as compile-time constants and explode compile time)
        if chunk == 1:
            # no vmap layer — smaller program, same math
            outs = []
            for i in range(total):
                outs.append(
                    self.jit_run_one(
                        params, noised, c, uc, cache,
                        run_masks_t[i], run_masks_l[i], run_signs[i],
                        t_start=t_start,
                    )
                )
                if progress is not None:
                    progress(i + 1, total)
            out = jnp.stack(outs)
        else:
            outs = []
            n_chunks = total // chunk
            for i in range(n_chunks):
                s = slice(i * chunk, (i + 1) * chunk)
                outs.append(
                    self.jit_run_vmapped(
                        params, noised, c, uc, cache,
                        run_masks_t[s], run_masks_l[s], run_signs[s],
                        t_start=t_start,
                    )
                )
                if progress is not None:
                    progress(i + 1, n_chunks)
            out = jnp.concatenate(outs, axis=0)
        return out.reshape((2, m) + out.shape[1:])


def _cache_step(cache: Dict[str, jnp.ndarray], name: str, i: jnp.ndarray):
    """Index a (possibly windowed) step cache at absolute step i. Caches
    carry their window origin under "t0" (absent = full-length). The clip
    keeps traced indices in-bounds; gating guarantees out-of-window values
    are never consumed."""
    arr = cache[name]
    t0 = cache.get("t0", 0)
    idx = jnp.clip(i - t0, 0, arr.shape[0] - 1)
    return arr[idx]


def _injection_site_for_block(
    block: int,
    cache: Dict[str, jnp.ndarray],
    i: jnp.ndarray,
    gate: jnp.ndarray,
    video: bool,
    harvest: HarvestSpec,
) -> Optional[SiteInjection]:
    """Assemble the SiteInjection for one output block from the HBM cache,
    indexing the step axis at traced i. Missing harvest entries mean the
    site is statically un-injected (mirrors the reference skipping absent
    .pt files, video_model.py:494-495)."""

    def get(site, tensor):
        name = HarvestSpec.name(block, site, tensor)
        if name not in cache:
            return None
        if i is None:  # pre-sliced per-step cache (host-offload streaming)
            return cache[name]
        return _cache_step(cache, name, i)

    if video:
        q, k = get("temporal_self", "q"), get("temporal_self", "k")
        if q is None and k is None:
            return None
        return SiteInjection(
            temporal=BlockInjection(attn1=AttnInjection(gate=gate, q=q, k=k))
        )
    q1, k1 = get("spatial_self", "q"), get("spatial_self", "k")
    q2, k2 = get("spatial_cross", "q"), get("spatial_cross", "k")
    if q1 is None and k1 is None and q2 is None and k2 is None:
        return None
    return SiteInjection(
        spatial=BlockInjection(
            attn1=AttnInjection(gate=gate, q=q1, k=k1)
            if (q1 is not None or k1 is not None)
            else None,
            attn2=AttnInjection(gate=gate, q=q2, k=k2)
            if (q2 is not None or k2 is not None)
            else None,
        )
    )


def _denoiser_with_aux(denoiser: Denoiser, network, x, sigma, cond):
    """Denoiser.__call__ math with a network returning (out, aux)."""
    from vidseg_diffusion_tpu.utils import append_dims

    sigma = denoiser.possibly_quantize_sigma(sigma)
    sigma_shape = sigma.shape
    sigma_b = append_dims(sigma, x.ndim)
    c_skip, c_out, c_in, c_noise = denoiser.scaling(sigma_b)
    c_noise = denoiser.possibly_quantize_c_noise(c_noise.reshape(sigma_shape))
    out, aux = network(x * c_in, c_noise, cond)
    return out * c_out + x * c_skip, aux


def _sample_with_xt(sampler: EulerEDMSampler, denoise_fn, x, t_start):
    """Sampler loop that also emits the post-step latent each step (the
    reference's img_callback(x, i) xt dump)."""
    sigmas = sampler.sigmas()
    num_sigmas = sampler.num_steps + 1
    x = sampler.prescale(x, sigmas)
    idxs = jnp.arange(t_start, num_sigmas - 1)
    gammas = sampler._gamma(sigmas, num_sigmas)[idxs]

    def body(carry, per_step):
        xc = carry
        i, sigma, next_sigma, gamma = per_step
        xn, aux = sampler.step(denoise_fn, xc, sigma, next_sigma, i, gamma)
        aux = dict(aux)
        aux["xt"] = xn
        return xn, aux

    x, aux = jax.lax.scan(
        body, x, (idxs, sigmas[idxs], sigmas[idxs + 1], gammas)
    )
    return x, aux


def masks_to_latent(masks: jnp.ndarray, latent_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-resize per-frame masks [M, T, fh, fw] → [M, T, h, w] for
    latent blending (sampling.py:239-249)."""
    return resize_nearest(masks, latent_hw)
