"""Safety-filter numerics vs an executable replica of the reference's
DeepFloydDataFiltering (scripts/util/detection/nsfw_and_watermark_dectection
.py:12-76): synthetic npz heads + a shared fake CLIP feature extractor,
score parity and blur-application parity. torchvision is absent from the
image, so the replica re-implements T.GaussianBlur(99, sigma=100) with
torch.nn.functional primitives (same kernel + reflect padding)."""

import io
import math

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from vidseg_diffusion_tpu.utils.safety import SafetyFilter, predict_proba


# --- executable replica of the reference math (numpy/torch) ---------------

def ref_predict_proba(X, weights, biases):
    """nsfw_and_watermark_dectection.py:12-17 verbatim semantics."""
    logits = X @ weights.T + biases
    proba = np.where(
        logits >= 0, 1 / (1 + np.exp(-logits)), np.exp(logits) / (1 + np.exp(logits))
    )
    return proba.T


def ref_gaussian_blur_99_100(images: torch.Tensor) -> torch.Tensor:
    """T.GaussianBlur(99, sigma=(100.0, 100.0)) replica: truncated
    normalized gaussian kernel, reflect padding, separable conv."""
    ksize, sigma = 99, 100.0
    x = torch.arange(ksize, dtype=torch.float64) - (ksize - 1) / 2.0
    k = torch.exp(-(x * x) / (2 * sigma * sigma))
    k = (k / k.sum()).to(images.dtype)
    b, c, h, w = images.shape
    pad = ksize // 2
    xpad = torch.nn.functional.pad(
        images.reshape(b * c, 1, h, w), (pad, pad, pad, pad), mode="reflect"
    )
    kr = k.reshape(1, 1, ksize, 1)
    kc = k.reshape(1, 1, 1, ksize)
    out = torch.nn.functional.conv2d(xpad, kr)
    out = torch.nn.functional.conv2d(out, kc)
    return out.reshape(b, c, h, w)


class RefFilterReplica:
    """DeepFloydDataFiltering.__call__ (:57-76) with injected CLIP fn and
    head arrays instead of the real ViT-L/14 + released npz files."""

    def __init__(self, clip_fn, p_head, w_head):
        self.clip_fn = clip_fn
        self.p_w, self.p_b = p_head
        self.w_w, self.w_b = w_head
        self.w_threshold, self.p_threshold = 0.5, 0.5

    def __call__(self, images: torch.Tensor) -> torch.Tensor:
        feats = self.clip_fn(images).numpy().astype(np.float16)
        p_pred = ref_predict_proba(feats, self.p_w, self.p_b)
        w_pred = ref_predict_proba(feats, self.w_w, self.w_b)
        images = images.clone()
        query = torch.from_numpy(p_pred[0] > self.p_threshold)
        if query.sum() > 0:
            images[query] = ref_gaussian_blur_99_100(images[query])
        query = torch.from_numpy(w_pred[0] > self.w_threshold)
        if query.sum() > 0:
            images[query] = ref_gaussian_blur_99_100(images[query])
        return images


# --- shared fake CLIP: one random projection used by both sides -----------

D_FEAT = 32


def make_clip_fns(seed=0):
    rng = np.random.RandomState(seed)
    w = rng.randn(3 * 64 * 64, D_FEAT).astype(np.float32)

    def torch_fn(images):  # [B, 3, H, W] -> [B, D]
        flat = images.reshape(images.shape[0], -1).to(torch.float32)
        return flat @ torch.from_numpy(w)

    def jax_fn(frames):  # [B, H, W, 3] -> [B, D]
        chw = jnp.moveaxis(frames, -1, 1)
        flat = chw.reshape(frames.shape[0], -1)
        return flat @ jnp.asarray(w)

    return torch_fn, jax_fn


def make_heads(seed):
    rng = np.random.RandomState(seed)
    return (
        (rng.randn(1, D_FEAT).astype(np.float32) * 0.05,
         rng.randn(1).astype(np.float32) * 0.1),
        (rng.randn(1, D_FEAT).astype(np.float32) * 0.05,
         rng.randn(1).astype(np.float32) * 0.1),
    )


class TestPredictProba:
    def test_matches_reference(self):
        rng = np.random.RandomState(1)
        X = rng.randn(6, D_FEAT).astype(np.float16)
        W = rng.randn(3, D_FEAT).astype(np.float32)
        b = rng.randn(3).astype(np.float32)
        np.testing.assert_allclose(
            predict_proba(X, W, b), ref_predict_proba(X, W, b), rtol=1e-6
        )

    def test_extreme_logits_stable(self):
        X = np.array([[1e4], [-1e4]], np.float32)
        W = np.ones((1, 1), np.float32)
        b = np.zeros(1, np.float32)
        p = predict_proba(X, W, b)
        assert np.isfinite(p).all()
        assert p[0, 0] == pytest.approx(1.0) and p[0, 1] == pytest.approx(0.0)


class TestFilterParity:
    def test_scores_and_blur_match_replica(self):
        torch_fn, jax_fn = make_clip_fns()
        rng = np.random.RandomState(3)
        imgs = rng.rand(4, 64, 64, 3).astype(np.float32)
        # heads aligned with specific images' features so the p head flags
        # image 0 and the w head flags image 2 (deterministic mixed outcome)
        feats0 = np.asarray(jax_fn(jnp.asarray(imgs))).astype(np.float32)
        centered = feats0 - feats0.mean(0)
        mk = lambda i: (
            (centered[i] / np.square(centered[i]).sum())[None].astype(np.float32),
            # margin bias: image i scores sigmoid(0.5) > 0.5; others need
            # cos-similarity > 0.5 with image i's centered feature to flag
            np.full(1, -0.5, np.float32),
        )
        p_head, w_head = mk(0), mk(2)

        ours = SafetyFilter(clip_image_fn=jax_fn, p_head=p_head, w_head=w_head)
        ref = RefFilterReplica(torch_fn, p_head, w_head)

        # score parity
        feats = np.asarray(jax_fn(jnp.asarray(imgs))).astype(np.float16)
        s = ours.scores(jnp.asarray(imgs))
        np.testing.assert_allclose(
            s[0], ref_predict_proba(feats, *p_head)[0], rtol=1e-5
        )
        np.testing.assert_allclose(
            s[1], ref_predict_proba(feats, *w_head)[0], rtol=1e-5
        )

        # applied-output parity (blur of flagged frames)
        out_ours = np.asarray(ours(jnp.asarray(imgs)))
        t_imgs = torch.from_numpy(np.moveaxis(imgs, -1, 1))
        out_ref = np.moveaxis(ref(t_imgs).numpy(), 1, -1)
        np.testing.assert_allclose(out_ours, out_ref, atol=2e-5)
        # sanity: the targeted images are flagged by their heads, so the
        # parity assertion above actually exercised the blur path
        assert s[0, 0] > 0.5 and s[1, 2] > 0.5
        assert np.abs(out_ours - imgs).max() > 1e-3  # blur visibly applied

    def test_from_npz_contract(self, tmp_path):
        # the reference npz carries `weights` + `biases` keys (:20-22)
        p_head, w_head = make_heads(4)
        pp, wp = tmp_path / "p.npz", tmp_path / "w.npz"
        np.savez(pp, weights=p_head[0], biases=p_head[1])
        np.savez(wp, weights=w_head[0], biases=w_head[1])
        _, jax_fn = make_clip_fns()
        f = SafetyFilter.from_npz(jax_fn, str(pp), str(wp))
        np.testing.assert_array_equal(f.p_head[0], p_head[0])
        np.testing.assert_array_equal(f.w_head[1], w_head[1])
