"""On-device analytics vs their CPU counterparts (sklearn / cv2 / numpy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidseg_diffusion_tpu.ops.kmeans import kmeans_fit, kmeans_predict
from vidseg_diffusion_tpu.ops.knn import knn_predict
from vidseg_diffusion_tpu.ops.image import gaussian_blur, resize_nearest
from vidseg_diffusion_tpu.ops.matching import (
    dense_tracking,
    positive_jump_filter,
    trajectory_majority_vote,
)


def _blobs(n_per=60, k=4, d=8, seed=0, spread=0.15):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 3
    x = np.concatenate([c + spread * rng.randn(n_per, d) for c in centers])
    y = np.repeat(np.arange(k), n_per)
    return x.astype(np.float32), y


class TestKMeans:
    def test_recovers_blobs(self):
        x, y_true = _blobs()
        centers, labels, inertia = kmeans_fit(jax.random.PRNGKey(0), jnp.asarray(x), k=4)
        labels = np.asarray(labels)
        # label-agnostic accuracy: every true cluster maps to one kmeans label
        for c in range(4):
            vals, counts = np.unique(labels[y_true == c], return_counts=True)
            assert counts.max() / counts.sum() > 0.99

    def test_matches_sklearn_inertia(self):
        sklearn = pytest.importorskip("sklearn.cluster")
        x, _ = _blobs(seed=3)
        km = sklearn.KMeans(n_clusters=4, n_init=10, random_state=0).fit(x)
        _, _, inertia = kmeans_fit(jax.random.PRNGKey(0), jnp.asarray(x), k=4)
        np.testing.assert_allclose(float(inertia), km.inertia_, rtol=0.02)

    def test_predict(self):
        x, _ = _blobs(seed=5)
        centers, labels, _ = kmeans_fit(jax.random.PRNGKey(1), jnp.asarray(x), k=4)
        pred = kmeans_predict(centers, jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(pred), np.asarray(labels))


class TestKNN:
    def test_matches_sklearn(self):
        skn = pytest.importorskip("sklearn.neighbors")
        rng = np.random.RandomState(0)
        ref_x = rng.randn(200, 16).astype(np.float32)
        ref_y = rng.randint(0, 5, 200)
        q = rng.randn(50, 16).astype(np.float32)
        sk = skn.KNeighborsClassifier(n_neighbors=4).fit(ref_x, ref_y)
        expected = sk.predict(q)
        got = np.asarray(
            knn_predict(jnp.asarray(ref_x), jnp.asarray(ref_y), jnp.asarray(q),
                        k=4, num_classes=5)
        )
        # ties can legitimately differ when two neighbors are equidistant;
        # require ≥96% agreement
        assert (got == expected).mean() >= 0.96


class TestGaussianBlur:
    def test_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.RandomState(0)
        img = (rng.rand(40, 56) * 255).astype(np.float64)
        expected = cv2.GaussianBlur(img, (5, 5), 3)
        got = np.asarray(gaussian_blur(jnp.asarray(img, jnp.float32), 5, 3.0))
        np.testing.assert_allclose(got, expected, atol=1e-2, rtol=1e-4)

    def test_batched(self):
        img = jnp.ones((3, 2, 16, 16))
        out = gaussian_blur(img)
        assert out.shape == (3, 2, 16, 16)
        np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


class TestResize:
    def test_nearest_matches_torch_semantics(self):
        # F.interpolate nearest on a 2x2 → 4x4 duplicates pixels
        x = jnp.array([[1.0, 2.0], [3.0, 4.0]])
        out = np.asarray(resize_nearest(x, (4, 4)))
        expected = np.array(
            [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]], dtype=np.float32
        )
        np.testing.assert_array_equal(out, expected)


def _reference_tracking_numpy(features, use_aux=True):
    """Literal numpy transcription of the reference matching semantics
    (feature_extraction.py:218-299) for golden comparison."""
    t, l, c = features.shape
    f = features / np.linalg.norm(features, axis=-1, keepdims=True)
    pos = np.arange(l)
    out = [pos]
    for fi in range(t - 1):
        src = f[fi][pos]
        cos = src @ f[fi + 1].T
        if use_aux:
            cos_aux = src @ f[0].T
            w = fi / (fi + 1)
            cos = w * cos + (1 - w) * cos_aux
        pos = np.argmax(cos, axis=1)
        out.append(pos)
    return np.stack(out)


class TestTracking:
    def test_matches_reference_semantics(self):
        rng = np.random.RandomState(0)
        feats = rng.randn(4, 30, 8).astype(np.float32)
        expected = _reference_tracking_numpy(feats)
        got = np.asarray(dense_tracking(jnp.asarray(feats)))
        np.testing.assert_array_equal(got, expected)

    def test_jump_filter_positive_only(self):
        # moving backwards (negative delta) is NOT filtered — reference quirk
        pos = jnp.array([[5, 9], [3, 9], [3, 9]])  # w=3: point0 jumps -h
        keep = np.asarray(positive_jump_filter(pos, width=3, threshold=1))
        assert keep[0] and keep[1]
        pos2 = jnp.array([[0, 0], [8, 0], [8, 0]])  # +2 rows jump
        keep2 = np.asarray(positive_jump_filter(pos2, width=3, threshold=1))
        assert not keep2[0] and keep2[1]

    def test_majority_vote(self):
        # 3 frames, 4 cells; one trajectory visits labels [1, 1, 2] → votes 1
        seg = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 2, 0]])
        positions = jnp.array([[0], [1], [2]])
        keep = jnp.array([True])
        new = np.asarray(trajectory_majority_vote(positions, seg, keep, num_classes=3))
        assert new[0, 0] == 1 and new[1, 1] == 1 and new[2, 2] == 1

    def test_vote_tie_breaks_to_first_seen(self):
        seg = jnp.array([[2, 0], [1, 0]])  # labels along traj: [2, 1] tie
        positions = jnp.array([[0], [0]])
        keep = jnp.array([True])
        new = np.asarray(trajectory_majority_vote(positions, seg, keep, num_classes=3))
        assert new[0, 0] == 2  # first-seen label wins
