"""Losses.

The reference trains BCELoss on sigmoid probabilities (src/trainer.py:88,
model heads end in Sigmoid). We compute the identical objective from logits
via the numerically-stable log-sigmoid form; bce_on_probs reproduces torch
BCELoss exactly (including its log clamp at -100) for parity testing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy from logits (stable)."""
    labels = labels.astype(logits.dtype)
    return jnp.mean(
        jnp.clip(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def bce_on_probs(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCELoss semantics: log terms clamped at -100
    (reference: src/trainer.py:88,132)."""
    labels = labels.astype(probs.dtype)
    log_p = jnp.maximum(jnp.log(probs), -100.0)
    log_1p = jnp.maximum(jnp.log1p(-probs), -100.0)
    return jnp.mean(-(labels * log_p + (1.0 - labels) * log_1p))
