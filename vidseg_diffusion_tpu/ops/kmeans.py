"""On-device KMeans (kmeans++ init, multi-restart Lloyd iterations).

Replaces the reference's CPU sklearn KMeans(n_clusters, n_init=10) round-trip
(feature_extraction.py:52-56, 562-570) with jitted Lloyd iterations: the
distance step is one [N,D]×[D,K] matmul on the MXU, restarts are a vmap axis,
and everything stays in HBM next to the features it clusters.

Matches sklearn semantics, not bitwise output (cluster IDs are arbitrary;
accuracy parity is measured label-agnostically downstream): kmeans++
seeding with greedy local trials (2 + log2(k), like sklearn's
_kmeans_plusplus), n_init restarts keeping the lowest inertia, Lloyd updates
with empty-cluster reseeding to the farthest point.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _sq_dists(x: jax.Array, centers: jax.Array) -> jax.Array:
    """Pairwise squared distances [N, K] via the MXU-friendly expansion."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    c2 = jnp.sum(centers * centers, axis=1)
    xc = x @ centers.T
    return jnp.maximum(x2 - 2.0 * xc + c2[None, :], 0.0)


def _kmeanspp_init(rng: jax.Array, x: jax.Array, k: int) -> jax.Array:
    """kmeans++ with greedy local trials (sklearn _kmeans_plusplus)."""
    n, d = x.shape
    n_trials = 2 + int(math.log2(max(k, 2)))

    r0, rloop = jax.random.split(rng)
    first = jax.random.randint(r0, (), 0, n)
    centers0 = jnp.zeros((k, d), x.dtype).at[0].set(x[first])
    min_d2_0 = _sq_dists(x, x[first][None])[:, 0]

    def body(i, carry):
        centers, min_d2, key = carry
        key, sub = jax.random.split(key)
        # sample n_trials candidates ∝ current D²
        p = min_d2 / jnp.maximum(jnp.sum(min_d2), 1e-12)
        cand_idx = jax.random.choice(sub, n, shape=(n_trials,), p=p)
        cand = x[cand_idx]  # [T, d]
        d2_cand = jnp.minimum(_sq_dists(x, cand), min_d2[:, None])  # [N, T]
        pot = jnp.sum(d2_cand, axis=0)
        best = jnp.argmin(pot)
        centers = centers.at[i].set(cand[best])
        return centers, d2_cand[:, best], key

    centers, _, _ = jax.lax.fori_loop(1, k, body, (centers0, min_d2_0, rloop))
    return centers


def _lloyd(
    x: jax.Array, centers: jax.Array, n_iter: int, tol: float
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Lloyd iterations with empty-cluster reseed. Returns
    (centers, labels, inertia)."""
    n, d = x.shape
    k = centers.shape[0]

    def step(carry, _):
        centers, prev_shift = carry
        frozen = prev_shift < tol  # sklearn-style convergence: stop moving
        d2 = _sq_dists(x, centers)
        labels = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # [N, K]
        counts = jnp.sum(onehot, axis=0)  # [K]
        sums = onehot.T @ x  # [K, D]
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty clusters → DISTINCT highest-inertia points (a single
        # farthest point duplicated across several empty clusters thrashes:
        # argmin ties to the lower index so the duplicates stay empty)
        min_d2 = jnp.min(d2, axis=1)
        _, far_idx = jax.lax.top_k(min_d2, k)  # k farthest points
        empty = counts == 0
        rank = jnp.clip(jnp.cumsum(empty.astype(jnp.int32)) - 1, 0, k - 1)
        repl = x[far_idx[rank]]  # r-th empty cluster ← r-th farthest point
        new_centers = jnp.where(empty[:, None], repl, new_centers)
        new_centers = jnp.where(frozen, centers, new_centers)
        shift = jnp.where(
            frozen, prev_shift, jnp.sum((new_centers - centers) ** 2)
        )
        return (new_centers, shift), None

    (centers, _), _ = jax.lax.scan(step, (centers, jnp.inf), None, length=n_iter)
    d2 = _sq_dists(x, centers)
    labels = jnp.argmin(d2, axis=1)
    inertia = jnp.sum(jnp.min(d2, axis=1))
    return centers, labels, inertia


@functools.partial(jax.jit, static_argnames=("k", "n_init", "n_iter"))
def kmeans_fit(
    rng: jax.Array,
    x: jax.Array,
    k: int,
    n_init: int = 10,
    n_iter: int = 50,
    tol: float = 1e-4,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fit KMeans. Returns (centers [K,D], labels [N], inertia scalar).

    n_init restarts run as a vmap axis; best inertia wins (sklearn
    KMeans(n_init=10) semantics, feature_extraction.py:52)."""
    x = x.astype(jnp.float32)
    keys = jax.random.split(rng, n_init)

    def one(key):
        centers0 = _kmeanspp_init(key, x, k)
        return _lloyd(x, centers0, n_iter, tol)

    centers, labels, inertia = jax.vmap(one)(keys)
    best = jnp.argmin(inertia)
    return centers[best], labels[best], inertia[best]


@jax.jit
def kmeans_predict(centers: jax.Array, x: jax.Array) -> jax.Array:
    return jnp.argmin(_sq_dists(x.astype(jnp.float32), centers), axis=1)
