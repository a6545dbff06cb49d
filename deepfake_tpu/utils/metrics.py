"""Classification metrics.

The reference computes only loss + thresholded accuracy
(reference: src/trainer.py:142-144); the competition metric (AUC) is never
computed in-repo. We provide both, jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def binary_accuracy(probs: jnp.ndarray, labels: jnp.ndarray, threshold: float = 0.5):
    """Fraction of (prob >= 0.5) == label (reference: src/trainer.py:142-144)."""
    preds = (probs >= threshold).astype(jnp.int32)
    return jnp.mean((preds == labels.astype(jnp.int32)).astype(jnp.float32))


def roc_auc(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Exact ROC-AUC via the rank statistic (Mann-Whitney U), O(n log n),
    tie-aware. Works under jit with static shapes."""
    scores = scores.reshape(-1).astype(jnp.float64)
    labels = labels.reshape(-1).astype(jnp.float64)
    n = scores.shape[0]
    order = jnp.argsort(scores)
    s_sorted = scores[order]
    l_sorted = labels[order]
    # average ranks with tie handling: rank = mean of first/last index of tie run
    idx = jnp.arange(n, dtype=jnp.float64)
    is_new = jnp.concatenate([jnp.array([True]), s_sorted[1:] != s_sorted[:-1]])
    grp = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    grp_first = jnp.full(n, jnp.inf, dtype=jnp.float64).at[grp].min(idx)
    grp_last = jnp.full(n, -jnp.inf, dtype=jnp.float64).at[grp].max(idx)
    ranks = (grp_first[grp] + grp_last[grp]) / 2.0 + 1.0
    n_pos = jnp.sum(l_sorted)
    n_neg = n - n_pos
    sum_pos_ranks = jnp.sum(ranks * l_sorted)
    auc = (sum_pos_ranks - n_pos * (n_pos + 1) / 2.0) / jnp.maximum(n_pos * n_neg, 1.0)
    return jnp.where((n_pos == 0) | (n_neg == 0), jnp.nan, auc)
