"""SVD VSPW sweep CLI — flag-compatible front-end.

Counterpart of the reference's scripts/sampling/svd_pipeline_vspw.py: loops
val-split videos in 14-frame sliding batches, seeds labels from the first
frame's GT mask, carries KNN state across batches, skips failed videos, and
additionally reports mIoU/mVC (the reference has no eval code).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, required=True,
                   help="VSPW root containing <video>/origin and <video>/mask")
    p.add_argument("--val_list", type=str, default=None,
                   help="file listing val video names (default: all dirs)")
    p.add_argument("--exp_name", type=str, default="vspw")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--num_steps", type=int, default=25)
    p.add_argument("--motion_bucket_id", type=int, default=127)
    p.add_argument("--cond_aug", type=float, default=0.02)
    p.add_argument("--modulate_block_idx", type=str, default="8")
    p.add_argument("--modulate_timestep", type=str, default="17")
    p.add_argument("--feature_timestep", type=str, default="24")
    p.add_argument("--modulate_schedule", type=str, default="constant")
    p.add_argument("--modulate_lambda_start", type=float, default=50.0)
    p.add_argument("--modulate_lambda_end", type=float, default=50.0)
    p.add_argument("--num_masks", type=int, default=20)
    p.add_argument("--feature_extraction_mode", type=str, default="match_gt_mask")
    p.add_argument("--is_injected_features", default=False, action="store_true")
    p.add_argument("--modulate_layer_type", type=str, default="spatial")
    p.add_argument("--modulate_attn_type", type=str, default="cross_attn")
    p.add_argument("--disable_latent_blending", default=False, action="store_true")
    p.add_argument("--is_refine_mask", default=False, action="store_true")
    p.add_argument("--is_aggre_attn", default=False, action="store_true")
    p.add_argument("--exp_start_idx", type=int, default=0)
    p.add_argument("--num_exp", type=int, default=None)
    # framework extensions
    p.add_argument("--model_config", type=str, default="configs/inference/svd.yaml")
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--feature_folder", type=str, default="features_outputs")
    p.add_argument("--runs_chunk", type=int, default=1)
    p.add_argument("--dtype", type=str, default=None, choices=["bfloat16", "float32"],
                   help="compute dtype (default: bfloat16 on TPU — the reference runs fp16 autocast — else float32)")
    p.add_argument("--num_classes", type=int, default=124)
    p.add_argument("--no_eval", default=False, action="store_true")
    p.add_argument("--manifest", type=str, default=None,
                   help="JSON-lines resume journal; completed videos are skipped on re-run")
    p.add_argument("--data_groups", type=int, default=1,
                   help="shard the sweep over N 'data'-axis device groups "
                   "(videos round-robin; each video's runs grid shards over "
                   "its group's devices). 1 = all local devices as one "
                   "group. TPU-native replacement for manual "
                   "--exp_start_idx/--num_exp job slicing.")
    return p.parse_args()


def main():
    args = parse_args()
    from vidseg_diffusion_tpu.utils import ensure_backend

    print("backend:", ensure_backend())

    import json

    from vidseg_diffusion_tpu.engine.build import build_pipeline
    from vidseg_diffusion_tpu.pipelines.single_video import VidSegArgs
    from vidseg_diffusion_tpu.pipelines.vspw import run_vspw_sweep

    if args.val_list:
        with open(args.val_list) as f:
            names = [l.strip() for l in f if l.strip()]
    else:
        names = sorted(
            d for d in os.listdir(args.data_root)
            if os.path.isdir(os.path.join(args.data_root, d))
        )

    ckpt = args.ckpt_path if (args.ckpt_path and os.path.exists(args.ckpt_path)) else None
    if ckpt is None:
        print("WARNING: no checkpoint — random weights smoke mode")
    import jax.numpy as jnp

    dtype = (
        jnp.bfloat16
        if (args.dtype == "bfloat16" or (args.dtype is None and ensure_backend() == "tpu"))
        else jnp.float32
    )
    pipeline = build_pipeline(
        args.model_config, ckpt_path=ckpt,
        num_steps=args.num_steps, num_frames=args.num_frames, dtype=dtype,
    )

    csv_i = lambda s: tuple(int(x) for x in s.split(",") if x)
    csv_s = lambda s: tuple(x for x in s.split(",") if x)
    vargs = VidSegArgs(
        exp_name=args.exp_name,
        num_steps=args.num_steps,
        seed=args.seed,
        motion_bucket_id=args.motion_bucket_id,
        cond_aug=args.cond_aug,
        modulate_block_idx=csv_i(args.modulate_block_idx),
        modulate_timestep=csv_i(args.modulate_timestep),
        feature_timestep=csv_i(args.feature_timestep),
        modulate_schedule=args.modulate_schedule,
        modulate_lambda_start=args.modulate_lambda_start,
        modulate_lambda_end=args.modulate_lambda_end,
        modulate_layer_type=csv_s(args.modulate_layer_type),
        modulate_attn_type=csv_s(args.modulate_attn_type),
        num_masks=args.num_masks,
        feature_extraction_mode=args.feature_extraction_mode,
        is_injected_features=args.is_injected_features,
        is_latent_blending=not args.disable_latent_blending,
        is_refine_mask=args.is_refine_mask,
        is_aggre_attn=args.is_aggre_attn,
        feature_folder=args.feature_folder,
        runs_chunk=args.runs_chunk,
    )
    mesh = None
    if args.data_groups > 1:
        import jax

        from vidseg_diffusion_tpu.parallel.mesh import make_mesh

        nd = jax.device_count()
        if nd % args.data_groups:
            raise SystemExit(
                f"--data_groups {args.data_groups} must divide the "
                f"{nd} visible devices"
            )
        mesh = make_mesh(
            nd, axes=("data", "runs"),
            shape=(args.data_groups, nd // args.data_groups),
        )
    out = run_vspw_sweep(
        pipeline, args.data_root, names, vargs,
        num_frames=args.num_frames,
        exp_start_idx=args.exp_start_idx, num_exp=args.num_exp,
        num_classes=args.num_classes, evaluate=not args.no_eval,
        manifest_path=args.manifest, mesh=mesh,
    )
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
