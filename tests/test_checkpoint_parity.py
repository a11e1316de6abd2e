"""Numerical parity: reference torch modules (CPU) vs flax modules after
checkpoint conversion, on tiny configs.

These tests are the converter's ground truth: they instantiate the PUBLIC
reference implementation from /root/reference (torch, CPU), export its
state_dict, convert with io/checkpoint.py, and assert the flax forward
reproduces the torch forward.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from reference_compat import (  # noqa: E402
    de_zero_,  # noqa: E402
    import_reference_unet,
    import_reference_vae,
    import_reference_video_decoder,
    import_reference_video_unet,
)
from vidseg_diffusion_tpu.io.checkpoint import (  # noqa: E402
    convert_state_dict,
    unet_key_fn,
    vae_key_fn,
)
from vidseg_diffusion_tpu.models.unet import UNetConfig, UNetModel  # noqa: E402
from vidseg_diffusion_tpu.models import vae as fvae  # noqa: E402

ATOL = 2e-4  # fp32 CPU conv/matmul accumulation-order differences


def _sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TestImageUNetParity:
    def test_tiny_unet_matches_reference(self):
        RefUNet = import_reference_unet()
        torch.manual_seed(0)
        ref = de_zero_(RefUNet(
            in_channels=4,
            out_channels=4,
            model_channels=32,
            num_res_blocks=1,
            attention_resolutions=[2, 1],
            channel_mult=[1, 2],
            num_head_channels=16,
            transformer_depth=1,
            context_dim=24,
            use_linear_in_transformer=True,
            use_checkpoint=False,
        ).eval())

        cfg = UNetConfig(
            in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
            attention_resolutions=(2, 1), channel_mult=(1, 2),
            num_head_channels=16, context_dim=24,
        )
        model = UNetModel(cfg)

        b, h, w = 2, 16, 16
        rng = np.random.RandomState(1)
        x = rng.randn(b, 4, h, w).astype(np.float32)
        ts = np.array([5.0, 10.0], dtype=np.float32)
        ctx = rng.randn(b, 7, 24).astype(np.float32)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x), torch.from_numpy(ts), torch.from_numpy(ctx)
            ).numpy()

        var = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ts), jnp.asarray(ctx),
        )
        params, unused = convert_state_dict(var["params"], _sd_numpy(ref), unet_key_fn)
        assert not unused, sorted(unused)[:8]

        out = model.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ts), jnp.asarray(ctx),
        )
        out = np.asarray(out).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, out_ref, atol=ATOL, rtol=1e-3)


class TestVideoUNetParity:
    @pytest.mark.slow
    def test_tiny_video_unet_matches_reference(self):
        RefVideoUNet = import_reference_video_unet()
        torch.manual_seed(0)
        ref = de_zero_(RefVideoUNet(
            in_channels=8,
            out_channels=4,
            model_channels=32,
            num_res_blocks=1,
            attention_resolutions=[2, 1],
            channel_mult=[1, 2],
            num_head_channels=16,
            transformer_depth=1,
            context_dim=24,
            use_linear_in_transformer=True,
            use_checkpoint=False,
            extra_ff_mix_layer=True,
            use_spatial_context=True,
            merge_strategy="learned_with_images",
            video_kernel_size=[3, 1, 1],
            num_classes="sequential",
            adm_in_channels=12,
        ).eval())

        cfg = UNetConfig(
            in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
            attention_resolutions=(2, 1), channel_mult=(1, 2),
            num_head_channels=16, context_dim=24, adm_in_channels=12, video=True,
        )
        model = UNetModel(cfg)

        t, h, w = 3, 16, 16
        bt = 2 * t
        rng = np.random.RandomState(1)
        x = rng.randn(bt, 8, h, w).astype(np.float32)
        ts = np.full((bt,), 7.0, dtype=np.float32)
        ctx = rng.randn(bt, 1, 24).astype(np.float32)
        y = rng.randn(bt, 12).astype(np.float32)
        ioi = np.zeros((2, t), dtype=np.float32)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x), torch.from_numpy(ts), torch.from_numpy(ctx),
                y=torch.from_numpy(y), time_context=None, num_video_frames=t,
                image_only_indicator=torch.from_numpy(ioi),
            ).numpy()

        args = (
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ts), jnp.asarray(ctx),
            jnp.asarray(y),
        )
        kwargs = dict(num_video_frames=t, image_only_indicator=jnp.asarray(ioi))
        var = model.init(jax.random.PRNGKey(0), *args, **kwargs)
        params, unused = convert_state_dict(var["params"], _sd_numpy(ref), unet_key_fn)
        assert not unused, sorted(unused)[:8]

        out = model.apply({"params": params}, *args, **kwargs)
        out = np.asarray(out).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, out_ref, atol=ATOL, rtol=1e-3)


class TestVAEParity:
    DD = dict(
        ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
        dropout=0.0, in_channels=3, resolution=32, z_channels=4, double_z=True,
        attn_type="vanilla",
    )

    def _cfg(self, video=False):
        return fvae.VAEConfig(
            ch=32, out_ch=3, in_channels=3, z_channels=4, ch_mult=(1, 2),
            num_res_blocks=1, double_z=True, video_decoder=video,
        )

    def test_encoder_parity(self):
        RefEncoder, _ = import_reference_vae()
        torch.manual_seed(0)
        ref = de_zero_(RefEncoder(**self.DD).eval())
        enc = fvae.Encoder(self._cfg())
        rng = np.random.RandomState(2)
        x = rng.randn(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x)).numpy()
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))
        var = enc.init(jax.random.PRNGKey(0), xj)
        params, unused = convert_state_dict(var["params"], _sd_numpy(ref), vae_key_fn)
        assert not unused, sorted(unused)[:8]
        out = np.asarray(enc.apply({"params": params}, xj)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, out_ref, atol=ATOL, rtol=1e-3)

    def test_decoder_parity(self):
        _, RefDecoder = import_reference_vae()
        torch.manual_seed(0)
        ref = de_zero_(RefDecoder(**self.DD).eval())
        dec = fvae.Decoder(self._cfg())
        rng = np.random.RandomState(3)
        z = rng.randn(2, 4, 8, 8).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(z)).numpy()
        zj = jnp.asarray(z.transpose(0, 2, 3, 1))
        var = dec.init(jax.random.PRNGKey(0), zj)
        params, unused = convert_state_dict(var["params"], _sd_numpy(ref), vae_key_fn)
        assert not unused, sorted(unused)[:8]
        out = np.asarray(dec.apply({"params": params}, zj)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, out_ref, atol=ATOL, rtol=1e-3)

    @pytest.mark.slow
    def test_video_decoder_parity(self):
        RefVideoDecoder = import_reference_video_decoder()
        torch.manual_seed(0)
        ref = de_zero_(RefVideoDecoder(**self.DD, video_kernel_size=[3, 1, 1]).eval())
        dec = fvae.Decoder(self._cfg(video=True))
        t = 3
        rng = np.random.RandomState(4)
        z = rng.randn(t, 4, 8, 8).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(z), timesteps=t).numpy()
        zj = jnp.asarray(z.transpose(0, 2, 3, 1))
        var = dec.init(jax.random.PRNGKey(0), zj, timesteps=t)
        params, unused = convert_state_dict(var["params"], _sd_numpy(ref), vae_key_fn)
        assert not unused, sorted(unused)[:8]
        out = np.asarray(dec.apply({"params": params}, zj, timesteps=t))
        out = out.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, out_ref, atol=ATOL, rtol=1e-3)


class TestFullLayoutKeyInventory:
    """Day-1 real-checkpoint readiness (VERDICT r4 #6): the converter's name
    map must cover the reference graph's state_dict at the REAL shipped
    layouts — bidirectionally — so the first real `svd.safetensors` /
    `sd_2_1.ckpt` load is a formality. The reference torch graphs are
    instantiated WITHOUT weights on the meta device from the exact
    configs/inference/*.yaml network params (diffusion.py:85-103 loads with
    strict=False, which would hide such gaps; convert_state_dict must not).

    `spatial_transformer_attn_type` is forced to "softmax" (xformers is not
    importable here) — CrossAttention and MemoryEfficientCrossAttention
    expose identical param names (attention.py:257-364 vs :367-485), so the
    key inventory is unchanged.
    """

    @staticmethod
    def _meta_sd_shapes(module):
        return {k: tuple(v.shape) for k, v in module.state_dict().items()}

    @staticmethod
    def _assert_bidirectional(flax_shapes, ref_shapes, key_fn):
        """Every flax leaf maps onto a present reference key with an
        _adapt-compatible shape; every reference key is consumed."""
        from flax import traverse_util

        from vidseg_diffusion_tpu.io.checkpoint import _adapt

        flat = traverse_util.flatten_dict(flax_shapes)
        used = set()
        for path, val in flat.items():
            tkey = key_fn(path)
            assert tkey in ref_shapes, (
                f"flax path {'/'.join(path)} -> torch key {tkey!r} "
                "not in the reference state_dict"
            )
            # int8 zeros: _adapt only transposes/reshapes, so the layout
            # check runs at full 1.5B scale without 6 GB of fp32
            w = _adapt(
                np.zeros(ref_shapes[tkey], dtype=np.int8),
                tuple(val.shape), path[-1],
            )
            assert tuple(w.shape) == tuple(val.shape), (
                f"{tkey}: adapted {w.shape} vs flax {val.shape}"
            )
            used.add(tkey)
        missing = set(ref_shapes) - used
        assert not missing, (
            f"{len(missing)} reference keys unmapped, e.g. "
            f"{sorted(missing)[:8]}"
        )

    def test_svd_video_unet_full_layout(self):
        import yaml

        from vidseg_diffusion_tpu.config import load_model_spec
        from vidseg_diffusion_tpu.engine.build import _unet_shapes
        from vidseg_diffusion_tpu.models.unet import UNetModel

        with open("/root/reference/configs/inference/svd.yaml") as f:
            node = yaml.safe_load(f)
        kw = dict(node["model"]["params"]["network_config"]["params"])
        kw["use_checkpoint"] = False
        kw["spatial_transformer_attn_type"] = "softmax"
        RefVideoUNet = import_reference_video_unet()
        with torch.device("meta"):
            ref = RefVideoUNet(**kw)
        ref_shapes = self._meta_sd_shapes(ref)
        n_params = sum(
            int(np.prod(s)) for s in ref_shapes.values()
        )
        assert n_params > 1.5e9  # the real 1.5B layout, not a tiny config

        spec = load_model_spec("configs/inference/svd.yaml")
        shapes = _unet_shapes(
            UNetModel(spec.unet_config), jax.random.PRNGKey(0)
        )
        self._assert_bidirectional(shapes, ref_shapes, unet_key_fn)

    def test_sd21_unet_full_layout(self):
        import yaml

        from vidseg_diffusion_tpu.config import load_model_spec
        from vidseg_diffusion_tpu.engine.build import _unet_shapes
        from vidseg_diffusion_tpu.models.unet import UNetModel

        with open("/root/reference/configs/inference/sd_2_1.yaml") as f:
            node = yaml.safe_load(f)
        kw = dict(node["model"]["params"]["network_config"]["params"])
        kw["use_checkpoint"] = False
        RefUNet = import_reference_unet()
        with torch.device("meta"):
            ref = RefUNet(**kw)
        ref_shapes = self._meta_sd_shapes(ref)

        spec = load_model_spec("configs/inference/sd_2_1.yaml")
        shapes = _unet_shapes(
            UNetModel(spec.unet_config), jax.random.PRNGKey(0)
        )
        self._assert_bidirectional(shapes, ref_shapes, unet_key_fn)

    def test_svd_vae_full_layout(self):
        import yaml

        from vidseg_diffusion_tpu.config import load_model_spec
        from vidseg_diffusion_tpu.engine.build import _param_shapes

        with open("/root/reference/configs/inference/svd.yaml") as f:
            node = yaml.safe_load(f)
        fs = node["model"]["params"]["first_stage_config"]["params"]
        enc_kw = dict(fs["encoder_config"]["params"])
        dec_kw = dict(fs["decoder_config"]["params"])

        RefEncoder, _ = import_reference_vae()
        RefVideoDecoder = import_reference_video_decoder()
        with torch.device("meta"):
            ref_enc = RefEncoder(**enc_kw)
            ref_dec = RefVideoDecoder(**dec_kw)

        spec = load_model_spec("configs/inference/svd.yaml")
        enc = fvae.Encoder(spec.vae_config)
        dec = fvae.Decoder(spec.vae_config)
        rng = jax.random.PRNGKey(0)
        z = spec.vae_config.z_channels
        enc_shapes = _param_shapes(
            lambda: enc.init(rng, jnp.zeros((1, 64, 64, 3)))
        )
        dec_shapes = _param_shapes(
            lambda: dec.init(rng, jnp.zeros((1, 8, 8, z)), timesteps=1)
        )
        self._assert_bidirectional(
            enc_shapes, self._meta_sd_shapes(ref_enc), vae_key_fn
        )
        self._assert_bidirectional(
            dec_shapes, self._meta_sd_shapes(ref_dec), vae_key_fn
        )
