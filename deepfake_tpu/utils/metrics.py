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


def roc_auc(scores, labels) -> float:
    """Exact ROC-AUC via the rank statistic (Mann-Whitney U), O(n log n),
    tie-aware. Computed host-side in numpy float64: eval already gathers
    probabilities to the host, and the rank sum reaches ~n^2/2, which exceeds
    float32's exact-integer range for realistically sized eval sets (jax
    float64 is silently float32 unless jax_enable_x64 is set)."""
    import numpy as np

    scores = np.asarray(scores, np.float64).reshape(-1)
    labels = np.asarray(labels, np.float64).reshape(-1)
    n = scores.shape[0]
    if n == 0:
        return float("nan")  # undefined, like the one-class case below
    order = np.argsort(scores, kind="stable")
    s_sorted = scores[order]
    l_sorted = labels[order]
    # average ranks with tie handling: rank = mean of first/last index of tie run
    idx = np.arange(n, dtype=np.float64)
    is_new = np.concatenate([[True], s_sorted[1:] != s_sorted[:-1]])
    grp = np.cumsum(is_new) - 1
    n_grp = int(grp[-1]) + 1 if n else 0
    grp_first = np.full(n_grp, np.inf)
    np.minimum.at(grp_first, grp, idx)
    grp_last = np.full(n_grp, -np.inf)
    np.maximum.at(grp_last, grp, idx)
    ranks = (grp_first[grp] + grp_last[grp]) / 2.0 + 1.0
    n_pos = float(np.sum(l_sorted))
    n_neg = n - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    sum_pos_ranks = float(np.sum(ranks * l_sorted))
    return (sum_pos_ranks - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
