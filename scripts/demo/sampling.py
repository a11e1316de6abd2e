"""Sampling demo CLI (counterpart of the reference's Streamlit demos,
scripts/demo/{sampling,video_sampling}.py — a terminal front-end over the
same inference API; Streamlit is not part of this image).

Examples:
  python scripts/demo/sampling.py --mode txt2img --config configs/inference/sd_2_1.yaml \
      --ckpt checkpoints/sd21.safetensors --steps 40 --out out.png
  python scripts/demo/sampling.py --mode img2img --image in.png --strength 0.6 ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--mode", choices=["txt2img", "img2img", "img2vid"], default="txt2img"
    )
    p.add_argument("--config", default="configs/inference/sd_2_1.yaml")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--image", default=None)
    p.add_argument("--strength", type=float, default=0.75)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--sampler", default="EulerEDMSampler")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="demo_out.png")
    # img2vid knobs (reference video_sampling.py VERSION2SPECS defaults)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--fps_id", type=int, default=6)
    p.add_argument("--motion_bucket_id", type=int, default=127)
    p.add_argument("--cond_aug", type=float, default=0.02)
    p.add_argument("--min_cfg", type=float, default=1.0)
    p.add_argument("--max_cfg", type=float, default=2.5)
    p.add_argument("--decoding_t", type=int, default=1)
    args = p.parse_args()

    from vidseg_diffusion_tpu.utils import ensure_backend

    print("backend:", ensure_backend())

    import jax
    import numpy as np
    from PIL import Image

    from vidseg_diffusion_tpu.engine.build import build_pipeline
    from vidseg_diffusion_tpu.inference.api import (
        Sampler,
        SamplingParams,
        SamplingPipeline,
        VideoSamplingParams,
    )
    from vidseg_diffusion_tpu.io.tokenizer import tokenize_empty

    if args.mode == "img2vid" and args.config == "configs/inference/sd_2_1.yaml":
        args.config = "configs/inference/svd.yaml"  # video default
    ckpt = args.ckpt if (args.ckpt and os.path.exists(args.ckpt)) else None
    if ckpt is None:
        print("WARNING: no checkpoint — random weights (structure demo only)")
    if args.mode == "img2vid":
        steps = args.steps if args.steps != 40 else 25  # SVD default
        pipeline = build_pipeline(
            args.config, ckpt_path=ckpt,
            num_steps=steps, num_frames=args.num_frames,
        )
        api = SamplingPipeline(pipeline)
        vparams = VideoSamplingParams(
            width=args.width, height=args.height, steps=steps,
            num_frames=args.num_frames, fps_id=args.fps_id,
            motion_bucket_id=args.motion_bucket_id, cond_aug=args.cond_aug,
            min_cfg=args.min_cfg, max_cfg=args.max_cfg,
            decoding_t=args.decoding_t,
        )
        img = Image.open(args.image).convert("RGB")
        img = img.resize((args.width, args.height))
        arr = np.asarray(img, np.float32)[None] / 127.5 - 1.0
        out = api.image_to_video(
            vparams, arr, rng=jax.random.PRNGKey(args.seed)
        )
        frames = np.asarray(out * 255.0, dtype=np.uint8)
        base, ext = os.path.splitext(args.out)
        for i, f in enumerate(frames):
            Image.fromarray(f).save(f"{base}_{i:05d}{ext or '.png'}")
        print(f"wrote {len(frames)} frames to {base}_*.png")
        return

    pipeline = build_pipeline(args.config, ckpt_path=ckpt, num_steps=args.steps)
    api = SamplingPipeline(pipeline)
    params = SamplingParams(
        width=args.width, height=args.height, steps=args.steps,
        scale=args.scale, sampler=Sampler(args.sampler),
        img2img_strength=args.strength,
    )
    tokens = tokenize_empty(1)  # arbitrary prompts need a BPE vocab file
    rng = jax.random.PRNGKey(args.seed)
    if args.mode == "txt2img":
        out = api.text_to_image(params, tokens, rng=rng)
    else:
        img = Image.open(args.image).convert("RGB")
        img = img.resize((args.width, args.height))
        arr = np.asarray(img, np.float32)[None] / 127.5 - 1.0
        out = api.image_to_image(params, arr, tokens, rng=rng)
    arr = np.asarray(out[0] * 255.0, dtype=np.uint8)
    Image.fromarray(arr).save(args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
