"""Import helpers for the PUBLIC reference implementation at /root/reference.

Used ONLY by parity tests: we instantiate the reference's torch modules on
CPU with tiny configs and check our flax modules + checkpoint converter
reproduce their numerics. The reference package pulls heavy optional deps at
import time (pytorch_lightning, omegaconf, kornia, open_clip, torchvision
transforms); we stub the unused ones so the model modules import cleanly.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub(name, attrs=()):
    if name in sys.modules:
        return
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for a in attrs:
        setattr(mod, a, type(a, (), {}))
    sys.modules[name] = mod


def ensure_reference_importable():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    _stub("pytorch_lightning", ["LightningModule", "LightningDataModule", "Callback"])
    _stub("omegaconf")
    omegaconf = sys.modules["omegaconf"]
    if not hasattr(omegaconf, "ListConfig"):
        class ListConfig(list):
            pass

        class DictConfig(dict):
            pass

        class OmegaConf:
            @staticmethod
            def to_container(x, **kw):
                return x

        omegaconf.ListConfig = ListConfig
        omegaconf.DictConfig = DictConfig
        omegaconf.OmegaConf = OmegaConf
    _stub("kornia")
    _stub("open_clip")
    _stub("torchvision")
    _stub("torchvision.transforms")
    _stub("torchvision.transforms.functional")
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    tvf = sys.modules["torchvision.transforms.functional"]
    # sampling.py:247 calls F.to_pil_image into a dead local — a no-op stub
    tvf.to_pil_image = lambda *a, **k: None
    sys.modules["torchvision.transforms"].functional = tvf


def import_reference_unet():
    """Returns the reference's UNetModel class (torch, CPU)."""
    ensure_reference_importable()
    from sgm.modules.diffusionmodules.openaimodel import UNetModel  # noqa

    return UNetModel


def import_reference_video_unet():
    ensure_reference_importable()
    from sgm.modules.diffusionmodules.video_model import VideoUNet  # noqa

    return VideoUNet


def import_reference_vae():
    ensure_reference_importable()
    from sgm.modules.diffusionmodules.model import Decoder, Encoder  # noqa

    return Encoder, Decoder


def import_reference_video_decoder():
    ensure_reference_importable()
    from sgm.modules.autoencoding.temporal_ae import VideoDecoder  # noqa

    return VideoDecoder


def de_zero_(module, seed=99, scale=0.02):
    """Replace every all-zero parameter tensor with small randoms, in place.

    The reference zero-initializes ResBlock second convs, transformer
    proj_out, and the final out conv (openaimodel.py zero_module), so a
    stock-init reference UNet's output is identically zero and forward
    parity against it is vacuous — a conversion/wiring bug upstream of any
    zeroed module would go unseen (this masked a Downsample padding bug in
    round 1). Parity tests must call this before converting the state dict.
    """
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.numel() and float(v.abs().max()) == 0.0:
            sd[k] = torch.randn(v.shape, generator=g) * scale
    module.load_state_dict(sd)
    return module
