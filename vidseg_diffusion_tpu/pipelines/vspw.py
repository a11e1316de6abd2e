"""VSPW dataset sweep: sliding-window batches, GT-seeded label propagation,
per-video fault isolation, and on-the-fly mIoU/mVC evaluation.

Counterpart of scripts/sampling/svd_pipeline_vspw.py / sd_pipeline_vspw.py:
- 14-frame sliding batches with tail overlap (`start_idx = end_idx -
  num_frames` for the last partial window, svd_pipeline_vspw.py:243-250)
- first batch seeds labels from the first frame's GT mask
  (`input_video_path.replace("origin", "mask")`, :~376-385), later batches
  propagate via KNN against carried (ref_mask, ref_feature_map) state
  (:229-232; feature_extraction.py:567-613)
- per-video try/except skip (:651-676)
- manual sharding via --exp_start_idx/--num_exp (:610-611, 645-647), kept
  for CLI parity; the TPU-native scale-out is the ('data') mesh axis
- evaluation (mIoU, mVC_8/16) is new — the reference emits raw PNGs for
  external tooling only (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import os
import traceback
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from vidseg_diffusion_tpu.engine.build import Pipeline
from vidseg_diffusion_tpu.eval.metrics import SegmentationEvaluator
from vidseg_diffusion_tpu.io.video import list_video_frames, load_frames
from vidseg_diffusion_tpu.pipelines.single_video import (
    VidSegArgs,
    VidSegResult,
    cluster_feature_hw,
    run_single_video,
)


def sliding_batches(n: int, num_frames: int) -> List[Tuple[int, int]]:
    """[(start, end)] windows covering n frames; the final partial window is
    re-aligned to end at n (tail overlap, svd_pipeline_vspw.py:243-250)."""
    out = []
    start = 0
    while start < n:
        end = start + num_frames
        if end > n:
            end = n
            start = max(0, end - num_frames)
        out.append((start, end))
        if end >= n:
            break
        start = end
    return out


def load_gt_mask(
    video_dir: str, frame_name: str, fh: int, fw: int
) -> Optional[np.ndarray]:
    """First-frame GT mask at feature resolution (PIL NEAREST,
    feature_extraction.py:580-584). VSPW layout: .../origin/ ↔ .../mask/."""
    mask_dir = video_dir.replace("origin", "mask")
    for ext in (".png", ".jpg"):
        p = os.path.join(mask_dir, frame_name + ext)
        if os.path.exists(p):
            m = Image.open(p).resize((fw, fh), Image.NEAREST)
            return np.asarray(m).reshape(-1)
    return None


@dataclasses.dataclass
class VSPWVideoResult:
    seg: Dict[str, np.ndarray]  # frame name → label map
    unique_labels: np.ndarray


def run_vspw_video(
    pipeline: Pipeline,
    video_dir: str,
    args: VidSegArgs,
    num_frames: int = 14,
    text_tokens: Optional[np.ndarray] = None,
    use_gt_mask: bool = True,
    timings: Optional[Dict[str, float]] = None,  # out-param: per-stage
    # seconds accumulated across the video's sliding batches
    mesh=None,  # explicit runs-axis device group (see run_single_video)
) -> VSPWVideoResult:
    paths = list_video_frames(video_dir)
    frames_all, names_all, ori_hw = load_frames(paths)
    n = len(names_all)

    seg_out: Dict[str, np.ndarray] = {}
    gt_state = None
    unique_labels = None

    # GT masks load at the clustering block's token resolution, resolved
    # through the same block map run_single_video uses (not hardcoded ds=2,
    # so non-default cluster blocks / reduced topologies stay consistent)
    fh, fw = cluster_feature_hw(
        pipeline, args, frames_all.shape[1], frames_all.shape[2], num_frames
    )

    for bi, (s, e) in enumerate(sliding_batches(n, num_frames)):
        frames = frames_all[s:e]
        names = names_all[s:e]
        gt_mask = None
        if bi == 0 and use_gt_mask and args.feature_extraction_mode == "match_gt_mask":
            gt_mask = load_gt_mask(video_dir, names_all[0], fh, fw)
        batch_timings: Optional[Dict[str, float]] = (
            {} if timings is not None else None
        )
        result = run_single_video(
            pipeline,
            frames,
            names,
            args,
            ori_hw=ori_hw,
            gt_mask=gt_mask,
            gt_state=gt_state,
            text_tokens=text_tokens,
            write_outputs=False,
            timings=batch_timings,
            mesh=mesh,
        )
        if timings is not None:
            for k, v in batch_timings.items():
                if not k.startswith("_"):
                    timings[k] = timings.get(k, 0.0) + v
        gt_state = result.gt_state
        unique_labels = result.unique_labels
        for i, name in enumerate(names):
            # overlapping tail frames: later batch wins (reference overwrite
            # order)
            seg_out[name] = result.seg_filtered[i]

    return VSPWVideoResult(seg=seg_out, unique_labels=unique_labels)


def _mesh_groups(mesh) -> List:
    """Split a ('data','runs') sweep mesh into its per-group runs meshes.

    Returns [None] for mesh=None (per-video auto discovery), [mesh] when
    there is no 'data' axis (or it has size 1), and one runs-axis Mesh per
    'data' row otherwise."""
    if mesh is None:
        return [None]
    if "data" not in mesh.axis_names:
        return [mesh]
    from jax.sharding import Mesh
    import numpy as _np

    d_axis = mesh.axis_names.index("data")
    dev = _np.moveaxis(_np.asarray(mesh.devices), d_axis, 0)
    d = dev.shape[0]
    if d <= 1:
        return [Mesh(dev.reshape(-1), ("runs",))]
    return [Mesh(dev[g].reshape(-1), ("runs",)) for g in range(d)]


def run_vspw_sweep(
    pipeline: Pipeline,
    data_root: str,
    video_names: Sequence[str],
    args: VidSegArgs,
    num_frames: int = 14,
    exp_start_idx: int = 0,
    num_exp: Optional[int] = None,
    text_tokens: Optional[np.ndarray] = None,
    num_classes: int = 124,
    evaluate: bool = True,
    manifest_path: Optional[str] = None,
    process_shard: bool = False,
    mesh=None,
) -> Dict:
    """Sweep the val split, skipping failed videos (svd_pipeline_vspw.py
    :651-676), optionally scoring against GT masks.

    `manifest_path` enables explicit resume: completed/failed videos are
    journaled as JSON-lines and skipped on re-run — replacing the
    reference's implicit resume-by-artifacts-on-disk + manual
    --exp_start_idx bookkeeping (SURVEY.md §5).

    Scale-out layout (SURVEY §2.6 ('data','runs') mesh): pass `mesh` with
    axes ('data','runs') to shard the sweep itself — videos round-robin
    over the D 'data'-axis device groups (one host thread per group keeps
    every group's dispatch queue full; videos share nothing, so groups
    never communicate), and within a group each video's 2·num_masks
    (mask, ±λ) modulated runs shard over that group's 'runs' devices. A
    mesh with only a 'runs' axis pins the whole sweep to those devices
    serially. With `mesh=None`, each video uses run_single_video's
    mesh='auto' discovery (all local devices as one runs group).
    `process_shard=True` additionally slices the video list across
    `jax.process_count()` hosts (DCN data parallelism) — the multi-host
    analogue of the in-process 'data' axis."""
    import json
    import threading

    names = list(video_names)[exp_start_idx:]
    if num_exp is not None:
        names = names[:num_exp]
    if process_shard:
        from vidseg_diffusion_tpu.parallel.mesh import process_slice

        names = names[process_slice(len(names))]

    already = set()
    if manifest_path and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                    if rec.get("status") == "done":
                        already.add(rec["video"])
                except Exception:
                    continue

    lock = threading.Lock()  # journal file + evaluator + counters

    def journal(rec):
        if manifest_path:
            os.makedirs(os.path.dirname(manifest_path) or ".", exist_ok=True)
            with open(manifest_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    evaluator = SegmentationEvaluator(num_classes) if evaluate else None
    state = {"done": 0, "evaluated": 0}
    failed: List[Tuple[str, str]] = []
    skipped = sum(1 for v in names if v in already)
    todo = [v for v in names if v not in already]

    def run_one(vname: str, group_mesh) -> None:
        video_dir = os.path.join(data_root, vname, "origin")
        try:
            res = run_vspw_video(
                pipeline, video_dir, args, num_frames=num_frames,
                text_tokens=text_tokens, mesh=group_mesh,
            )
            if evaluator is not None:
                # evaluate BEFORE journaling done: an eval exception must
                # journal the video as failed, not both done and failed
                pred, gt = _load_gt_for_eval(video_dir, res)
                if pred is not None:
                    with lock:
                        evaluator.add_video(pred, gt)
                        state["evaluated"] += 1
            with lock:
                state["done"] += 1
                journal({"video": vname, "status": "done"})
        except Exception as e:  # per-video fault isolation
            traceback.print_exc()
            with lock:
                failed.append((vname, str(e)))
                journal({"video": vname, "status": "failed", "error": str(e)})

    groups = _mesh_groups(mesh)
    if len(groups) > 1:
        from concurrent.futures import ThreadPoolExecutor

        # one thread per device group; group g serially processes videos
        # g, g+D, g+2D, ... (deterministic assignment so manifest resume
        # and the round-robin layout are reproducible)
        with ThreadPoolExecutor(max_workers=len(groups)) as ex:
            futs = [
                ex.submit(
                    lambda g: [run_one(v, groups[g]) for v in todo[g::len(groups)]],
                    g,
                )
                for g in range(len(groups))
            ]
            for f in futs:
                f.result()
    else:
        for vname in todo:
            run_one(vname, groups[0])
    done, evaluated = state["done"], state["evaluated"]
    out = {"videos_done": done, "videos_failed": failed, "videos_skipped": skipped}
    if evaluator is not None and evaluator.has_videos:
        out.update(evaluator.results())
        # manifest-resumed 'done' videos are NOT re-evaluated (their seg
        # maps are not persisted), so on a resumed sweep the metrics cover
        # only the freshly-run subset — make that scope explicit instead
        # of silently reporting a partial number as the sweep metric
        out["videos_evaluated"] = evaluated
        if skipped:
            out["metrics_partial"] = True
    return out


def _load_gt_for_eval(video_dir: str, res: VSPWVideoResult):
    mask_dir = video_dir.replace("origin", "mask")
    preds, gts = [], []
    # res.seg preserves the loader's NUMERIC frame order (io/video.py sorts
    # stems as ints); a lexicographic sort here shuffled 0,1,10,11,...,2 and
    # made the mVC windows span non-adjacent frames
    for name, seg in res.seg.items():
        p = None
        for ext in (".png", ".jpg"):  # same extensions load_gt_mask accepts
            cand = os.path.join(mask_dir, name + ext)
            if os.path.exists(cand):
                p = cand
                break
        if p is None:
            return None, None
        gt = np.asarray(Image.open(p))
        sh, sw = seg.shape
        if gt.shape != seg.shape:
            gt = np.asarray(Image.open(p).resize((sw, sh), Image.NEAREST))
        preds.append(seg)
        gts.append(gt)
    return np.stack(preds), np.stack(gts)
