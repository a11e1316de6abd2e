"""DiffusionEngine facade: model + denoiser + sampler + conditioner + VAE.

Counterpart of sgm/models/diffusion.py DiffusionEngine (:19-151): owns the
UNet, denoiser, sampler, conditioner and first-stage VAE; provides
encode/decode_first_stage with the 0.18215 scale factor and chunked
processing (`en_and_decode_n_samples_a_time`, diffusion.py:117-151 — the
reference decodes 1 frame at a time; here the chunk is a static lax.map
batch so the whole decode stays one compiled program).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vidseg_diffusion_tpu.models import vae as vae_mod
from vidseg_diffusion_tpu.models.conditioner import Conditioner
from vidseg_diffusion_tpu.models.unet import UNetModel
from vidseg_diffusion_tpu.engine.vidseg import VidSegEngine


@functools.partial(jax.jit, static_argnames=("module",))
def _jit_apply(module, params, x):
    """Jitted module.apply — the first-stage VAE must never run eagerly:
    per-op dispatch of the full-res encoder costs ~7 s/frame through the
    tunneled TPU vs ~0.1 s compiled (measured, swan e2e round 2)."""
    return module.apply({"params": params}, x)


@functools.partial(jax.jit, static_argnames=("module", "timesteps"))
def _jit_apply_video(module, params, x, timesteps):
    return module.apply({"params": params}, x, timesteps=timesteps)


@dataclasses.dataclass(frozen=True)
class FirstStage:
    """VAE pair with scale factor (diffusion.py:117-151).

    quant/post_quant 1×1 convs are the legacy AutoencoderKL path used by SD
    2.1 (models/autoencoder.py:437-508); the SVD AutoencodingEngine has
    neither."""

    encoder: vae_mod.Encoder
    decoder: vae_mod.Decoder
    params_encoder: Any
    params_decoder: Any
    scale_factor: float = 0.18215
    quant_conv: Optional[Any] = None       # (kernel [1,1,2z,2z], bias)
    post_quant_conv: Optional[Any] = None  # (kernel [1,1,z,z], bias)

    def encode(
        self, x: jnp.ndarray, rng: Optional[jax.Array] = None, chunk: Optional[int] = None
    ) -> jnp.ndarray:
        """[-1,1] frames [B, H, W, 3] → scaled latents [B, H/8, W/8, z].
        rng None → posterior mode (AutoencoderKLModeOnly semantics)."""

        def enc(xc, idx):
            moments = _jit_apply(self.encoder, self.params_encoder, xc)
            if self.quant_conv is not None:
                k, b = self.quant_conv
                moments = jnp.einsum("bhwc,cd->bhwd", moments, k[0, 0]) + b
            # per-chunk key: a single key closed over the chunk map would
            # draw IDENTICAL noise for every chunk
            r = jax.random.fold_in(rng, idx) if rng is not None else None
            return vae_mod.gaussian_sample(moments, r)

        z = _chunked(enc, x, chunk, with_index=True)
        return self.scale_factor * z

    def decode(
        self, z: jnp.ndarray, chunk: Optional[int] = None, video_chunk_is_time: bool = True
    ) -> jnp.ndarray:
        """Scaled latents → [-1,1] frames. For the temporal VideoDecoder the
        chunk is the `timesteps` the 3-D convs see (decoding_t,
        svd_single_video_inference.py:42; diffusion.py:126-128)."""
        z = z / self.scale_factor

        def dec(zc):
            if self.post_quant_conv is not None:
                k, b = self.post_quant_conv
                zc = jnp.einsum("bhwc,cd->bhwd", zc, k[0, 0]) + b
            if self.decoder.config.video_decoder:
                ts = zc.shape[0] if video_chunk_is_time else 1
                return _jit_apply_video(self.decoder, self.params_decoder, zc, ts)
            return _jit_apply(self.decoder, self.params_decoder, zc)

        return _chunked(dec, z, chunk)

    @functools.cached_property
    def jit_decode(self):
        """Whole-decode-in-one-program wrapper (chunks fused; params as
        arguments). Chunked per-call applies cost ~3x in eager glue +
        per-chunk dispatch at swan scale (decode 14 s -> 43 s measured)."""

        def f(params_dec, z, *, chunk, video_chunk_is_time=True):
            fs = dataclasses.replace(self, params_decoder=params_dec)
            return fs.decode(z, chunk=chunk, video_chunk_is_time=video_chunk_is_time)

        return jax.jit(f, static_argnames=("chunk", "video_chunk_is_time"))

    @functools.cached_property
    def _sharded_jit_cache(self):
        return {}

    def jit_decode_sharded(self, mesh, decoding_t: int):
        """Mesh-sharded decode wrapper pinned to the FirstStage, keyed on
        (mesh, decoding_t): one program decodes a [g, runs, T, h, w, z]
        grid with the 'runs' axis sharded (one run per device per lax.map
        step). Rebuilding the jit per call would re-trace per video."""
        key = (mesh, decoding_t)
        if key not in self._sharded_jit_cache:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            rsh = NamedSharding(mesh, P(None, "runs"))

            def decode_fn(dp, z):
                fs_d = dataclasses.replace(self, params_decoder=dp)
                return jax.lax.map(
                    lambda grp: jax.vmap(
                        lambda zz: fs_d.decode(zz, chunk=decoding_t)
                    )(grp),
                    z,
                )

            self._sharded_jit_cache[key] = jax.jit(
                decode_fn, in_shardings=(repl, rsh), out_shardings=rsh
            )
        return self._sharded_jit_cache[key]


def _chunked(
    fn, x: jnp.ndarray, chunk: Optional[int], with_index: bool = False
) -> jnp.ndarray:
    """Apply fn over batch chunks. A ragged final chunk runs at its
    natural length like the reference's en_and_decode_n_samples_a_time
    ceil loop (diffusion.py:117-151) — an assert here crashed user frame
    counts not divisible by decoding_t. with_index passes the chunk index
    as a second arg (per-chunk rng folding)."""
    b = x.shape[0]
    call = fn if with_index else (lambda xc, i: fn(xc))
    if chunk is None or chunk >= b:
        return call(x, jnp.asarray(0))
    nb = b // chunk
    main = x[: nb * chunk].reshape((nb, chunk) + x.shape[1:])
    out = jax.lax.map(lambda arg: call(arg[0], arg[1]), (main, jnp.arange(nb)))
    out = out.reshape((nb * chunk,) + out.shape[2:])
    rem = b - nb * chunk
    if rem:
        # ragged tail at its NATURAL length, exactly like the reference's
        # ceil loop — padding it would feed the video decoder's temporal
        # convs repeated frames inside the chunk (one extra compile)
        tail = call(x[nb * chunk:], jnp.asarray(nb))
        out = jnp.concatenate([out, tail], 0)
    return out


@dataclasses.dataclass(frozen=True)
class DiffusionEngine:
    """Top-level facade (models/diffusion.py:19-151)."""

    unet: UNetModel
    unet_params: Any
    vidseg: VidSegEngine  # carries denoiser/sampler/guider/mod config
    conditioner: Conditioner
    first_stage: FirstStage
    en_and_decode_n_samples_a_time: Optional[int] = 1  # decoding_t default

    def encode_first_stage(self, x, rng=None):
        return self.first_stage.encode(x, rng, chunk=self.en_and_decode_n_samples_a_time)

    def decode_first_stage(self, z):
        return self.first_stage.decode(z, chunk=self.en_and_decode_n_samples_a_time)

    @property
    def sampler(self):
        return self.vidseg.sampler
