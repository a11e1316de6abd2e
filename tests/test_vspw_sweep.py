"""VSPW sweep end-to-end on synthetic data: multi-window sliding batches
with GT-state carry (svd_pipeline_vspw.py:229-250), match_gt_mask label
propagation, per-video fault isolation, manifest resume, on-the-fly eval,
and process-level sharding. Runs on the tiny SVD config (random weights,
8-device virtual CPU mesh from conftest — the runs grid shards via
run_single_video mesh='auto')."""

import json
import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

from vidseg_diffusion_tpu.engine.build import build_pipeline  # noqa: E402
from vidseg_diffusion_tpu.pipelines.single_video import VidSegArgs  # noqa: E402
from vidseg_diffusion_tpu.pipelines.vspw import (  # noqa: E402
    run_vspw_sweep,
    run_vspw_video,
)

T_WINDOW = 3
N_FRAMES = 7  # → windows (0,3), (3,6), (4,7): tail overlap + 2 state carries


def _make_video(root: str, name: str, seed: int, broken: bool = False):
    """64×64 frames: left half label 1 (reddish), right half label 2
    (bluish), plus noise; VSPW layout origin/ + mask/."""
    rng = np.random.RandomState(seed)
    odir = os.path.join(root, name, "origin")
    mdir = os.path.join(root, name, "mask")
    os.makedirs(odir), os.makedirs(mdir)
    mask = np.ones((64, 64), np.uint8)
    mask[:, 32:] = 2
    for i in range(N_FRAMES):
        img = rng.randint(0, 60, (64, 64, 3)).astype(np.uint8)
        img[:, :32, 0] += 180  # red-ish left
        img[:, 32:, 2] += 180  # blue-ish right
        if broken and i == 0:
            # truncated file → loader raises → fault isolation path
            with open(os.path.join(odir, f"{i:08d}.png"), "wb") as f:
                f.write(b"\x89PNG broken")
        else:
            Image.fromarray(img).save(os.path.join(odir, f"{i:08d}.png"))
        Image.fromarray(mask).save(os.path.join(mdir, f"{i:08d}.png"))


@pytest.fixture(scope="module")
def tiny_pipeline():
    return build_pipeline(
        "configs/inference/svd_tiny.yaml", num_steps=6, num_frames=T_WINDOW
    )


def _args(tmp_path):
    return VidSegArgs(
        exp_name="sweep", num_steps=6, num_masks=2, modulate_timestep=(3,),
        feature_timestep=(5,), runs_chunk=4,
        feature_extraction_mode="match_gt_mask",
        feature_folder=str(tmp_path),
    )


def test_sweep_end_to_end(tiny_pipeline, tmp_path):
    root = str(tmp_path / "data")
    _make_video(root, "vid_a", seed=0)
    _make_video(root, "vid_b", seed=1)
    _make_video(root, "vid_bad", seed=2, broken=True)
    manifest = str(tmp_path / "manifest.jsonl")

    out = run_vspw_sweep(
        tiny_pipeline, root, ["vid_a", "vid_b", "vid_bad"], _args(tmp_path),
        num_frames=T_WINDOW, num_classes=4, manifest_path=manifest,
    )
    # fault isolation: the broken video fails, the others complete
    assert out["videos_done"] == 2
    assert [v for v, _ in out["videos_failed"]] == ["vid_bad"]
    # evaluation accumulated over both completed videos
    assert "mIoU" in out and 0.0 <= out["mIoU"] <= 1.0
    # manifest journaled both outcomes
    recs = [json.loads(l) for l in open(manifest)]
    assert {r["video"]: r["status"] for r in recs} == {
        "vid_a": "done", "vid_b": "done", "vid_bad": "failed",
    }

    # resume: a second sweep skips completed videos without re-running
    out2 = run_vspw_sweep(
        tiny_pipeline, root, ["vid_a", "vid_b"], _args(tmp_path),
        num_frames=T_WINDOW, num_classes=4, manifest_path=manifest,
    )
    assert out2["videos_skipped"] == 2 and out2["videos_done"] == 0


def test_multiwindow_gt_state_carry(tiny_pipeline, tmp_path):
    """7 frames / window 3 → three windows incl. a tail-overlap window;
    labels propagate from the first frame's GT through carried KNN state
    and every frame gets a segmentation using the GT's label ids."""
    root = str(tmp_path / "data")
    _make_video(root, "vid_c", seed=3)
    res = run_vspw_video(
        tiny_pipeline, os.path.join(root, "vid_c", "origin"),
        _args(tmp_path), num_frames=T_WINDOW,
    )
    assert len(res.seg) == N_FRAMES
    assert sorted(res.unique_labels.tolist()) == [1, 2]  # GT label ids, not 0..K
    for name, seg in res.seg.items():
        assert set(np.unique(seg)) <= {1, 2}, name


def test_sweep_data_runs_mesh_equals_unsharded(tiny_pipeline, tmp_path):
    """run_vspw_sweep under a ('data','runs') mesh — videos round-robin over
    2 device groups, each video's runs grid sharded over its group's 4
    devices — produces the same label maps as the unsharded per-video run
    (the §2.6 pod-scale layout; supersedes the reference's manual
    --exp_start_idx/--num_exp job slicing, sd_pipeline_vspw.py:651-652)."""
    import dataclasses

    import jax

    from vidseg_diffusion_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8  # conftest's virtual CPU mesh
    root = str(tmp_path / "data")
    _make_video(root, "vid_a", seed=0)
    _make_video(root, "vid_b", seed=1)
    args = _args(tmp_path)

    mesh = make_mesh(8, axes=("data", "runs"), shape=(2, 4))
    out = run_vspw_sweep(
        tiny_pipeline, root, ["vid_a", "vid_b"], args,
        num_frames=T_WINDOW, num_classes=4, mesh=mesh,
    )
    assert out["videos_done"] == 2 and not out["videos_failed"]
    assert "mIoU" in out

    # unsharded single-device-dispatch baseline, same videos
    base_args = dataclasses.replace(args, mesh="off")
    for vname in ("vid_a", "vid_b"):
        res_base = run_vspw_video(
            tiny_pipeline, os.path.join(root, vname, "origin"), base_args,
            num_frames=T_WINDOW,
        )
        res_mesh = run_vspw_video(
            tiny_pipeline, os.path.join(root, vname, "origin"), args,
            num_frames=T_WINDOW,
            mesh=_group_of(mesh, 0 if vname == "vid_a" else 1),
        )
        assert res_mesh.seg.keys() == res_base.seg.keys()
        np.testing.assert_array_equal(
            res_mesh.unique_labels, res_base.unique_labels
        )
        for name in res_base.seg:
            # float-tolerance latent agreement + the uint8-wrap diff quirk
            # → compare by agreement, not bit-equality (see
            # test_runs_dispatch_equiv.test_run_single_video_mesh_equals_host)
            agree = (res_mesh.seg[name] == res_base.seg[name]).mean()
            assert agree > 0.95, (vname, name, agree)


def _group_of(mesh, g):
    from vidseg_diffusion_tpu.pipelines.vspw import _mesh_groups

    return _mesh_groups(mesh)[g]


def test_process_slice_balanced():
    from unittest import mock

    from vidseg_diffusion_tpu.parallel import mesh as pm

    with mock.patch.object(pm.jax, "process_count", return_value=4):
        slices = []
        for pi in range(4):
            with mock.patch.object(pm.jax, "process_index", return_value=pi):
                slices.append(pm.process_slice(10))
        items = list(range(10))
        parts = [items[s] for s in slices]
        assert sum(parts, []) == items  # full cover, in order
        assert [len(p) for p in parts] == [3, 3, 2, 2]  # balanced
