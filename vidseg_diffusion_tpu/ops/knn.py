"""On-device K-nearest-neighbor classifier.

Replaces sklearn KNeighborsClassifier(n_neighbors=4) used for cross-frame
label propagation (feature_extraction.py:608-613): Euclidean top-k via one
[N,M] distance matmul + jax.lax.top_k, majority vote with sklearn's
tie-breaking (smallest label wins) via one-hot sums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "num_classes"))
def knn_predict(
    ref_x: jax.Array,      # [M, D] fitted features
    ref_y: jax.Array,      # [M] int labels in [0, num_classes)
    x: jax.Array,          # [N, D] query features
    k: int = 4,
    num_classes: int = 256,
) -> jax.Array:
    """Predict labels for x. Labels must be pre-mapped to dense indices;
    callers keep the index→original-label table."""
    ref_x = ref_x.astype(jnp.float32)
    x = x.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    r2 = jnp.sum(ref_x * ref_x, axis=1)
    d2 = x2 - 2.0 * (x @ ref_x.T) + r2[None, :]  # [N, M]
    _, idx = jax.lax.top_k(-d2, k)  # k nearest
    votes = jax.nn.one_hot(ref_y[idx], num_classes, dtype=jnp.float32)  # [N,k,C]
    counts = jnp.sum(votes, axis=1)  # [N, C]
    # argmax returns the first (=smallest label index) maximum — sklearn's
    # mode() tie-break
    return jnp.argmax(counts, axis=1)
