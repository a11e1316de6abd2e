"""Sweep-level VSPW-style throughput on the real TPU — the BASELINE.md
metric of record ("VSPW frames/sec/chip").

Generates a synthetic multi-video dataset at swan-ish shapes (random
frames; weights are random too, so frame content doesn't change cost),
runs the REAL sweep loop (`run_vspw_video`: sliding 14-frame batches with
tail overlap, kmeans mask mode, 2·num_masks modulated runs + decode + seg
per batch), and records per-stage and per-video wall-clock plus
frames/sec/chip into BENCH_SWEEP.json.

The per-video work mirrors svd_pipeline_vspw.py:243-250, 649-676 (loop
shape) at the swan demo's resolution. Run serialized with other TPU jobs:

    python scripts/tests/sweep_bench.py [--videos 3] [--frames 21]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def synth_dataset(root: str, videos: int, frames: int, h: int, w: int) -> list:
    import numpy as np
    from PIL import Image

    names = []
    rs = np.random.RandomState(0)
    for v in range(videos):
        name = f"video_{v:03d}"
        d = os.path.join(root, name, "origin")
        os.makedirs(d, exist_ok=True)
        for f in range(frames):
            p = os.path.join(d, f"{f:08d}.png")
            if not os.path.exists(p):
                Image.fromarray(
                    rs.randint(0, 255, (h, w, 3), dtype=np.uint8)
                ).save(p)
        names.append(name)
    return names


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--videos", type=int, default=3)
    p.add_argument("--frames", type=int, default=21, help="frames per video "
                   "(>14 exercises the sliding tail-overlap batch)")
    p.add_argument("--height", type=int, default=448)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_masks", type=int, default=5)
    p.add_argument("--num_steps", type=int, default=25)
    p.add_argument("--decoding_t", type=int, default=7)
    p.add_argument("--runs_chunk", type=int, default=1)
    p.add_argument("--data_root", default="/tmp/vspw_synth")
    p.add_argument("--out", default="BENCH_SWEEP.json")
    args = p.parse_args()

    os.makedirs(".jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from vidseg_diffusion_tpu.engine.build import build_pipeline
    from vidseg_diffusion_tpu.pipelines.single_video import VidSegArgs
    from vidseg_diffusion_tpu.pipelines.vspw import run_vspw_video

    print("backend:", jax.default_backend(), flush=True)
    names = synth_dataset(
        args.data_root, args.videos, args.frames, args.height, args.width
    )

    t0 = time.perf_counter()
    pipeline = build_pipeline(
        "configs/inference/svd.yaml", ckpt_path=None,
        num_steps=args.num_steps, num_frames=14, dtype=jnp.bfloat16,
    )
    print(f"build: {time.perf_counter()-t0:.1f}s", flush=True)

    vargs = VidSegArgs(
        exp_name="sweep_bench",
        num_steps=args.num_steps,
        num_masks=args.num_masks,
        feature_extraction_mode="kmeans_masks",
        decoding_t=args.decoding_t,
        runs_chunk=args.runs_chunk,
        feature_folder="/tmp/sweep_bench_out",
    )

    per_video = []
    per_video_stages = []  # per-video × per-stage matrix (VERDICT r4 #1:
    # stage totals alone mixed compile into warm-video economics and could
    # not attribute the 172 vs 212 s warm-video variance)
    total_frames = 0
    t_sweep = time.perf_counter()
    for i, vname in enumerate(names):
        video_dir = os.path.join(args.data_root, vname, "origin")
        timings: dict = {}
        tv = time.perf_counter()
        res = run_vspw_video(
            pipeline, video_dir, vargs, num_frames=14,
            use_gt_mask=False, timings=timings,
        )
        dv = time.perf_counter() - tv
        per_video.append(round(dv, 2))
        per_video_stages.append({k: round(v, 2) for k, v in timings.items()})
        total_frames += len(res.seg)
        print(f"{vname}: {dv:.1f}s ({len(res.seg)} frames) "
              f"{ {k: round(v,1) for k,v in timings.items()} }", flush=True)
    total_s = time.perf_counter() - t_sweep

    n_chips = jax.device_count()
    stage_totals: dict = {}
    for tm in per_video_stages:
        for k, v in tm.items():
            stage_totals[k] = stage_totals.get(k, 0.0) + v
    # warm/cold separation: video 0 carries every jit trace/compile (cold);
    # videos 1+ are the steady-state regime the sweep metric of record
    # describes (compile is one-time, like the per-step bench's exclusion)
    warm = per_video_stages[1:] if len(per_video_stages) > 1 else per_video_stages
    stage_means_warm = {
        k: round(sum(tm.get(k, 0.0) for tm in warm) / len(warm), 2)
        for k in stage_totals
    }
    steady_videos = per_video[1:] if len(per_video) > 1 else per_video
    steady_frames = total_frames * len(steady_videos) / len(per_video)
    steady_s = sum(steady_videos)
    result = {
        "videos": args.videos,
        "frames_per_video": args.frames,
        "resolution": f"{args.width}x{args.height}",
        "num_masks": args.num_masks,
        "num_steps": args.num_steps,
        "decoding_t": args.decoding_t,
        "runs_chunk": args.runs_chunk,
        "chips": n_chips,
        "total_s": round(total_s, 1),
        "per_video_s": per_video,
        "per_video_stages_s": per_video_stages,
        "cold_video_stages_s": per_video_stages[0],
        "warm_stage_means_s": stage_means_warm,
        "stage_totals_s": {k: round(v, 1) for k, v in stage_totals.items()},
        "frames_per_sec_per_chip": round(
            total_frames / total_s / n_chips, 4
        ),
        "frames_per_sec_per_chip_steady": round(
            steady_frames / steady_s / n_chips, 4
        ) if steady_s > 0 else None,
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
