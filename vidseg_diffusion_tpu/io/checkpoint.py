"""Checkpoint conversion: torch/safetensors state dicts → flax param pytrees.

The reference loads `.safetensors`/`.ckpt` weights into its torch module tree
(models/diffusion.py:85-103, sgm/util.py:202-230). Here, weights are
converted once into the flax pytree layout; orbax handles native snapshots.

The converters are *structural*: each maps a flax param path (tuple of module
names + leaf) to the corresponding torch state-dict key, and adapts the
tensor layout (torch Linear [out,in] → flax kernel [in,out]; torch Conv2d
[out,in,kh,kw] → flax [kh,kw,in,out]; Conv3d [out,in,kt,kh,kw] →
[kt,kh,kw,in,out]; Linear↔1x1-Conv mismatches are reshaped). Parity tests
instantiate the reference torch modules on CPU with tiny configs and assert
end-to-end numerical agreement after conversion.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import traverse_util

Path = Tuple[str, ...]


def _adapt(w: np.ndarray, target_shape: Tuple[int, ...], leaf: str) -> np.ndarray:
    """Adapt a torch tensor layout to the flax leaf's expected shape."""
    if leaf in ("scale", "bias", "mix_factor", "embedding",
                "token_embedding", "positional_embedding",
                "class_embedding", "proj", "text_projection"):
        if leaf in ("embedding", "token_embedding", "positional_embedding",
                    "proj", "text_projection"):
            return w  # layout identical in torch and flax
        return w.reshape(target_shape)
    if leaf == "kernel":
        if w.ndim == 2 and len(target_shape) == 2:
            return w.T
        if w.ndim == 4 and len(target_shape) == 4:
            return w.transpose(2, 3, 1, 0)
        if w.ndim == 5 and len(target_shape) == 5:
            return w.transpose(2, 3, 4, 1, 0)
        if w.ndim == 4 and len(target_shape) == 2:  # torch 1x1 conv → flax dense
            return w[:, :, 0, 0].T
        if w.ndim == 2 and len(target_shape) == 4:  # torch linear → flax 1x1 conv
            return w.T.reshape(target_shape)
    raise ValueError(f"cannot adapt {w.shape} -> {target_shape} for leaf {leaf}")


def convert_state_dict(
    flax_params: Dict,
    torch_sd: Dict[str, np.ndarray],
    key_fn: Callable[[Path], str],
    dtype=jnp.float32,
    strict_unused: bool = False,
):
    """Fill `flax_params`-shaped tree from `torch_sd` via `key_fn` path→key.

    Returns (params, unused_torch_keys). Raises on any missing torch key or
    shape mismatch — conversion must be exact, silent partial loads are how
    checkpoints rot."""
    flat = traverse_util.flatten_dict(flax_params)
    out = {}
    used = set()
    for path, val in flat.items():
        tkey = key_fn(path)
        if tkey not in torch_sd:
            raise KeyError(f"torch key {tkey!r} (for flax path {'/'.join(path)}) not found")
        w = np.asarray(torch_sd[tkey])
        w = _adapt(w, tuple(val.shape), path[-1])
        if tuple(w.shape) != tuple(val.shape):
            raise ValueError(f"shape mismatch {tkey}: {w.shape} vs {val.shape}")
        out[path] = jnp.asarray(w, dtype=dtype)
        used.add(tkey)
    unused = {k for k in torch_sd if k not in used}
    if strict_unused and unused:
        raise ValueError(f"unused torch keys: {sorted(unused)[:10]}…")
    return traverse_util.unflatten_dict(out), unused


_LEAF = {"kernel": "weight", "scale": "weight", "bias": "bias",
         "mix_factor": "mix_factor", "embedding": "weight"}

# module-local renames inside a ResBlock (openaimodel.py:220-370)
_RESBLOCK = {
    "in_norm": "in_layers.0",
    "in_conv": "in_layers.2",
    "emb_proj": "emb_layers.1",
    "out_norm": "out_layers.0",
    "out_conv": "out_layers.3",
    "skip": "skip_connection",
}
# time_stack of temporal_ae.VideoResBlock has skip_t_emb → no emb_layers,
# same in/out_layers indices
_RESBLOCK_NO_EMB = {
    "in_norm": "in_layers.0",
    "in_conv": "in_layers.2",
    "out_norm": "out_layers.0",
    "out_conv": "out_layers.3",
}


def _seq(name: str) -> str:
    """input_blocks_3_0 → input_blocks.3.0 ; time_stack_0 → time_stack.0 ;
    transformer_blocks_1 → transformer_blocks.1 ; time_embed_0 → time_embed.0"""
    return re.sub(r"_(\d+)", r".\1", name)


def unet_key_fn(path: Path) -> str:
    """flax path → torch key for UNetModel / VideoUNet."""
    parts = list(path)
    leaf = parts.pop()
    # drop the GroupNorm32 inner module
    parts = [p for p in parts if p != "gn"]

    segs = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p.startswith("label_emb"):
            # label_emb_0 → label_emb.0.0 ("sequential": nested Sequential,
            # video_model.py:182-190)
            idx = p.split("_")[-1]
            segs.append(f"label_emb.0.{idx}")
        elif p in _RESBLOCK and "time_stack" not in segs[-1:]:
            segs.append(_RESBLOCK[p])
        elif p == "spatial":
            pass  # VideoResBlock spatial params live at the block root
        elif p == "time_stack" and i + 1 < len(parts) and parts[i + 1] in _RESBLOCK:
            # VideoResBlock.time_stack is itself a ResBlock
            segs.append("time_stack")
            segs.append(_RESBLOCK[parts[i + 1]])
            i += 1
        elif p == "to_out":
            segs.append("to_out.0")  # nn.Sequential(Linear, Dropout)
        elif p == "net_in":
            segs.append("net.0")  # FeedForward GEGLU proj (attention.py:99-115)
        elif p == "net_out":
            segs.append("net.2")
        elif p == "proj" and segs and segs[-1].endswith("net.0"):
            segs.append("proj")  # GEGLU inner linear
        else:
            segs.append(_seq(p))
        i += 1
    segs.append(_LEAF[leaf])
    return ".".join(segs)


def vae_key_fn(path: Path) -> str:
    """flax path → torch key for VAE Encoder/Decoder/VideoDecoder."""
    parts = [p for p in path[:-1] if p != "gn"]
    leaf = path[-1]
    segs = []
    i = 0
    while i < len(parts):
        p = parts[i]
        m = re.match(r"(down|up)_(\d+)_block_(\d+)", p)
        m2 = re.match(r"(down|up)_(\d+)_(downsample|upsample)", p)
        m3 = re.match(r"mid_(block_[12]|attn_1)", p)
        if m:
            segs.append(f"{m.group(1)}.{m.group(2)}.block.{m.group(3)}")
        elif m2:
            segs.append(f"{m2.group(1)}.{m2.group(2)}.{m2.group(3)}")
        elif m3:
            segs.append(f"mid.{m3.group(1)}")
        elif p == "spatial":
            pass  # temporal_ae.VideoResBlock: spatial params at block root
        elif p == "time_stack" and i + 1 < len(parts) and parts[i + 1] in _RESBLOCK_NO_EMB:
            segs.append("time_stack")
            segs.append(_RESBLOCK_NO_EMB[parts[i + 1]])
            i += 1
        elif p == "conv_out_time_mix":
            segs.append("conv_out.time_mix_conv")  # AE3DConv (temporal_ae.py:86-108)
        else:
            segs.append(p)
        i += 1
    segs.append(_LEAF[leaf])
    return ".".join(segs)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors or torch .ckpt/.pt file into numpy arrays.

    Strips the reference's module prefixes so UNet keys start at
    'model.diffusion_model.' etc. (models/diffusion.py:85-103)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def sub_dict(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# -- native (orbax) snapshots -------------------------------------------------
# The reference only ever loads torch checkpoints (models/diffusion.py:85-103);
# converted pytrees are snapshotted natively so later runs skip conversion.


def save_params(path: str, params) -> None:
    import orbax.checkpoint as ocp
    import os

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params(path: str, like=None):
    import orbax.checkpoint as ocp
    import os

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        import jax

        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like) if hasattr(
            ocp.utils, "to_shape_dtype_struct"
        ) else like
        return ckptr.restore(os.path.abspath(path), target)
    return ckptr.restore(os.path.abspath(path))
