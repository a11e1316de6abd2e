"""SVD single-video VidSeg CLI — flag-compatible front-end.

Counterpart of the reference's scripts/sampling/svd_single_video_inference.py
(argparse surface :600-657). Same flags, same output tree; the pipeline
itself runs as jitted TPU programs (vidseg_diffusion_tpu.pipelines).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--input_video_path", type=str, default=None,
                   help="path to the input video which needs to be inverted")
    p.add_argument("--exp_name", type=str, default="default")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--motion_bucket_id", type=int, default=127)
    p.add_argument("--cond_aug", type=float, default=0.02)
    p.add_argument("--modulate_block_idx", type=str, default="8")
    p.add_argument("--modulate_timestep", type=str, default="17")
    p.add_argument("--feature_timestep", type=str, default="24")
    p.add_argument("--modulate_schedule", type=str, default="constant")
    p.add_argument("--modulate_lambda_start", type=float, default=50.0)
    p.add_argument("--modulate_lambda_end", type=float, default=50.0)
    p.add_argument("--num_masks", type=int, default=10)
    p.add_argument("--feature_extraction_mode", type=str, default="kmeans_masks")
    p.add_argument("--gt_mask_path", type=str, default=None)
    p.add_argument("--is_injected_features", default=False, action="store_true")
    p.add_argument("--modulate_layer_type", type=str, default="spatial")
    p.add_argument("--modulate_attn_type", type=str, default="cross_attn")
    p.add_argument("--modulate_timestep_frames_schedule", type=str, default="constant")
    p.add_argument("--disable_latent_blending", default=False, action="store_true")
    p.add_argument("--is_refine_mask", default=False, action="store_true")
    p.add_argument("--is_aggre_attn", default=False, action="store_true")
    # framework extensions (not in the reference)
    p.add_argument("--model_config", type=str, default="configs/inference/svd.yaml")
    p.add_argument("--ckpt_path", type=str, default=None,
                   help="override the YAML ckpt_path; omit + missing file → random weights smoke mode")
    p.add_argument("--num_steps", type=int, default=25)
    p.add_argument("--feature_folder", type=str, default="features_outputs")
    p.add_argument("--runs_chunk", type=int, default=1)
    p.add_argument("--decoding_t", type=int, default=1,
                   help="frames decoded per VAE-decoder call (reference default 1; larger values batch the temporal decoder)")
    p.add_argument("--dtype", type=str, default=None, choices=["bfloat16", "float32"],
                   help="compute dtype (default: bfloat16 on TPU — the reference runs fp16 autocast — else float32)")
    return p.parse_args()


def _csv_ints(s):
    return tuple(int(x) for x in s.split(",") if x)


def _csv_strs(s):
    return tuple(x for x in s.split(",") if x)


def main():
    args = parse_args()
    import numpy as np
    from PIL import Image

    from vidseg_diffusion_tpu.utils import ensure_backend

    print("backend:", ensure_backend())

    from vidseg_diffusion_tpu.engine.build import build_pipeline
    from vidseg_diffusion_tpu.io.video import list_video_frames, load_frames
    from vidseg_diffusion_tpu.pipelines.single_video import VidSegArgs, run_single_video

    assert args.input_video_path, "--input_video_path is required"
    paths = list_video_frames(args.input_video_path)
    frames, names, ori_hw = load_frames(paths)
    num_frames = len(names)
    print(f"loaded {num_frames} frames, model size {frames.shape[1]}x{frames.shape[2]}")

    import jax.numpy as jnp

    dtype = (
        jnp.bfloat16
        if (args.dtype == "bfloat16" or (args.dtype is None and ensure_backend() == "tpu"))
        else jnp.float32
    )
    ckpt = args.ckpt_path
    if ckpt and not os.path.exists(ckpt):
        # an explicitly requested checkpoint must not silently fall back —
        # a typo'd path would run a multi-hour sweep on the wrong weights
        raise FileNotFoundError(f"--ckpt_path {ckpt!r} does not exist")
    pipeline = build_pipeline(
        args.model_config,
        ckpt_path=ckpt if ckpt else _maybe_yaml_ckpt(args),
        num_steps=args.num_steps,
        num_frames=num_frames,
        dtype=dtype,
    )

    gt_mask = None
    if args.feature_extraction_mode == "match_gt_mask":
        assert args.gt_mask_path, "gt_mask_path required for match_gt_mask"
        # resized at feature resolution by the pipeline caller
        h_lat, w_lat = frames.shape[1] // 8, frames.shape[2] // 8
        fh, fw = h_lat // 2, w_lat // 2
        gt_mask = np.asarray(
            Image.open(args.gt_mask_path).resize((fw, fh), Image.NEAREST)
        ).reshape(-1)

    vargs = VidSegArgs(
        exp_name=args.exp_name,
        num_steps=args.num_steps,
        seed=args.seed,
        motion_bucket_id=args.motion_bucket_id,
        cond_aug=args.cond_aug,
        modulate_block_idx=_csv_ints(args.modulate_block_idx),
        modulate_timestep=_csv_ints(args.modulate_timestep),
        feature_timestep=_csv_ints(args.feature_timestep),
        modulate_schedule=args.modulate_schedule,
        modulate_lambda_start=args.modulate_lambda_start,
        modulate_lambda_end=args.modulate_lambda_end,
        modulate_layer_type=_csv_strs(args.modulate_layer_type),
        modulate_attn_type=_csv_strs(args.modulate_attn_type),
        modulate_timestep_frames_schedule=args.modulate_timestep_frames_schedule,
        num_masks=args.num_masks,
        feature_extraction_mode=args.feature_extraction_mode,
        gt_mask_path=args.gt_mask_path,
        is_injected_features=args.is_injected_features,
        is_latent_blending=not args.disable_latent_blending,
        is_refine_mask=args.is_refine_mask,
        is_aggre_attn=args.is_aggre_attn,
        feature_folder=args.feature_folder,
        runs_chunk=args.runs_chunk,
        decoding_t=args.decoding_t,
    )
    result = run_single_video(
        pipeline, frames, names, vargs, ori_hw=ori_hw, gt_mask=gt_mask
    )
    print(f"unique_labels: {result.unique_labels}")
    print(f"wrote outputs under {args.feature_folder}/{args.exp_name}")


def _maybe_yaml_ckpt(args):
    import yaml

    with open(args.model_config) as f:
        node = yaml.safe_load(f)
    ck = node.get("model", {}).get("params", {}).get("ckpt_path")
    if ck and os.path.exists(ck):
        return ck
    print("WARNING: no checkpoint found — running with random weights (smoke mode)")
    return None


if __name__ == "__main__":
    main()
