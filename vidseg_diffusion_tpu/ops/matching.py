"""On-device dense feature tracking and trajectory voting.

Counterparts of the reference's correspondence refinement
(feature_extraction.py: dense_feature_matching_iterative :176-323,
dense_tracking :326-364, correct_low_res_mask :367-461): frame-to-frame
cosine-similarity argmax matching of every token, with first-frame ("aux")
blending, a positive-jump spatial filter, and majority-vote relabeling along
each point trajectory. The reference runs this as batched-500 GPU einsums
with CPU argpartition per point; here each transition is one [P,C]×[C,L]
matmul and the whole track is a lax.scan.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _l2norm(x: jax.Array, axis: int = -1) -> jax.Array:
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


@functools.partial(jax.jit, static_argnames=("use_aux",))
def dense_tracking(features: jax.Array, use_aux: bool = True) -> jax.Array:
    """Track every token of frame 0 through all frames.

    features: [T, L, C] per-frame token features (the cond half of the CFG
    batch, i.e. feature_maps[num_frames:] in the reference).
    Returns positions [T, P=L] of linear token indices; row 0 is the
    identity grid.

    Matching: pos_{f+1}[p] = argmax_j ( w·cos(src_f[pos_f[p]], trg_{f+1}[j])
    + (1-w)·cos(src, aux_0[j]) ) with w = f/(f+1) when use_aux
    (feature_extraction.py:277-296).
    """
    t, l, c = features.shape
    f = _l2norm(features.astype(jnp.float32))
    aux = f[0]  # [L, C]
    init_pos = jnp.arange(l)

    def step(pos, f_idx):
        src = f[f_idx][pos]  # [P, C]
        trg = f[f_idx + 1]  # [L, C]
        cos = src @ trg.T  # [P, L]
        if use_aux:
            cos_aux = src @ aux.T
            w = f_idx.astype(jnp.float32) / (f_idx + 1.0)
            cos = w * cos + (1.0 - w) * cos_aux
        new_pos = jnp.argmax(cos, axis=1)
        return new_pos, new_pos

    _, traj = jax.lax.scan(step, init_pos, jnp.arange(t - 1))
    return jnp.concatenate([init_pos[None], traj], axis=0)  # [T, P]


@functools.partial(jax.jit, static_argnames=("width", "threshold"))
def positive_jump_filter(
    positions: jax.Array, width: int, threshold: int = 1
) -> jax.Array:
    """Reference's spatial filter (feature_extraction.py:392-409): drop a
    trajectory if any step moves more than `threshold` in +h or +w. The
    signed (positive-only) comparison is a reference quirk, preserved.

    positions: [T, P] linear indices. Returns keep mask [P] bool."""
    hs = positions // width
    ws = positions % width
    dh = hs[1:] - hs[:-1]
    dw = ws[1:] - ws[:-1]
    bad = jnp.any((dh > threshold) | (dw > threshold), axis=0)
    return ~bad


@functools.partial(jax.jit, static_argnames=("num_classes",))
def trajectory_majority_vote(
    positions: jax.Array,  # [T, P] linear token indices
    seg_maps: jax.Array,   # [T, L] int labels per frame
    keep: jax.Array,       # [P] bool — surviving trajectories
    num_classes: int,
) -> jax.Array:
    """Relabel each surviving trajectory's cells to its most common label
    (anchor_label_method='common', feature_extraction.py:411-421). Tie-break:
    the label first encountered along the trajectory (Counter.most_common
    insertion-order semantics). Returns new seg_maps [T, L].

    Duplicate scatter targets (several trajectories landing on one cell)
    resolve in unspecified order, like the reference's last-write-wins loop
    order is itself arbitrary for overlapping trajectories."""
    t, p = positions.shape
    labels = jnp.take_along_axis(seg_maps, positions, axis=1)  # [T, P]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)  # [T,P,C]
    counts = jnp.sum(onehot, axis=0)  # [P, C]
    # first occurrence index per class along the trajectory (T if absent)
    steps = jnp.arange(t, dtype=jnp.float32)[:, None, None]
    first_idx = jnp.min(jnp.where(onehot > 0, steps, float(t)), axis=0)  # [P,C]
    score = counts * (t + 1) + (t - first_idx)
    voted = jnp.argmax(score, axis=1)  # [P]

    # scatter voted labels along KEPT trajectories only: dropped columns
    # get an out-of-bounds index + mode='drop' so they cannot clobber a
    # kept trajectory's vote on shared cells (scatter duplicate-index
    # order is unspecified; writing the stale label "back" raced the vote)
    l = seg_maps.shape[1]
    pos_eff = jnp.where(keep[None, :], positions, l)
    vals = jnp.broadcast_to(voted[None, :], positions.shape)
    new_seg = jax.vmap(
        lambda s, pos, v: s.at[pos].set(v, mode="drop")
    )(seg_maps, pos_eff, vals)
    return new_seg
