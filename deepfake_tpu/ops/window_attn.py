"""Windowed attention ops (2D SwinV2 cosine attention, 3D scaled attention).

These are the device-side replacements for the reference's per-window torch
attention (reference: src/models/swin_transformer2d.py:140-179 and
src/models/video_swin_transformer.py:142-173). Both an XLA einsum path and a
fused Pallas TPU kernel are provided; ``use_pallas`` selects the kernel
(see deepfake_tpu.ops.pallas_window_attn). The XLA path is the correctness
reference and the default until the kernel wins the benchmark on hardware.

Shapes:
  q, k, v      [B_, H, N, D]   (B_ = batch * num_windows)
  logit_scale  [H, 1, 1]       (cosine path; already clamped+exp'ed)
  bias         [H, N, N]       relative position bias (additive)
  mask         [nW, N, N] or None; window w uses mask[w % nW]
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _l2_normalize(x, axis=-1, eps=1e-12):
    # torch F.normalize semantics: x / max(||x||, eps)
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def _apply_mask_softmax(attn, mask, bounded: bool = False):
    """attn [B_, H, N, N]; additive mask [nW, N, N] tiled over B_.

    bounded=True replaces the per-row max-subtract with the same static
    shift the 3D NHC kernels use (exp(min(x-24, 60))): SwinV2 cosine logits
    are bounded (|cos| <= 1 times logit_scale <= 100 after the log(100)
    clamp, + 16*sigmoid CPB bias, shift mask in {0, -100}), and every row's
    max is >= 0 (the self-entry is cos=1 * scale + bias >= 0, never
    masked), so exp(row_max - 24) >= e^-24 keeps each row's sum well above
    underflow while the 60-clamp bounds the top. Identical softmax up to
    f32 rounding unless some logit exceeds 84 (a trained logit_scale of
    >= 68 — far outside observed checkpoints; clamping then saturates the
    largest weights). Saves the max reduce+broadcast passes — traced ~1 ms
    of the 6 ms SwinV2-B b8 forward. DEEPFAKE_TPU_SOFTMAX_ROWMAX=1
    restores the stabilised form."""
    import os

    if mask is not None:
        nW = mask.shape[0]
        B_, H, N, _ = attn.shape
        attn = attn.reshape(B_ // nW, nW, H, N, N) + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(B_, H, N, N)
    if bounded and os.environ.get("DEEPFAKE_TPU_SOFTMAX_ROWMAX") != "1":
        e = jnp.exp(jnp.minimum(attn.astype(jnp.float32) - 24.0, 60.0))
        return e / jnp.sum(e, axis=-1, keepdims=True)
    return jax.nn.softmax(attn.astype(jnp.float32), axis=-1)


def cosine_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    logit_scale: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    use_pallas: bool = False,
    attn_dropout: float = 0.0,
    dropout_rng=None,
    bounded: bool = True,
) -> jnp.ndarray:
    """SwinV2 cosine attention (reference: swin_transformer2d.py:154-176).
    bounded=False keeps the max-stabilised softmax — callers pass it for
    TRAINING, where a logit_scale drifting past ln(68) would make the
    static shift's 60-clamp silently saturate weights and zero their
    gradients (inference checkpoints sit far below that)."""
    if use_pallas and attn_dropout == 0.0:
        from deepfake_tpu.ops.pallas_window_attn import pallas_window_attention

        return pallas_window_attention(
            q, k, v, bias=bias, mask=mask, logit_scale=logit_scale, cosine=True
        )
    dtype = q.dtype
    qn = _l2_normalize(q)
    kn = _l2_normalize(k)
    attn = jnp.einsum("bhnd,bhmd->bhnm", qn, kn, preferred_element_type=jnp.float32)
    attn = attn * logit_scale.astype(attn.dtype)
    attn = attn + bias[None].astype(attn.dtype)
    attn = _apply_mask_softmax(attn, mask, bounded=bounded)
    if attn_dropout > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - attn_dropout, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - attn_dropout), 0.0)
    return jnp.einsum("bhnm,bhmd->bhnd", attn.astype(dtype), v)


def scaled_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    use_pallas: bool = False,
    attn_dropout: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Standard scaled-dot window attention with relative position bias
    (3D Video Swin; reference: video_swin_transformer.py:142-173)."""
    if use_pallas and attn_dropout == 0.0:
        from deepfake_tpu.ops.pallas_window_attn import pallas_window_attention

        return pallas_window_attention(
            q, k, v, bias=bias, mask=mask, scale=scale, cosine=False
        )
    dtype = q.dtype
    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", q * jnp.asarray(scale, q.dtype), k,
        preferred_element_type=jnp.float32,
    )
    attn = attn + bias[None].astype(attn.dtype)
    attn = _apply_mask_softmax(attn, mask)
    if attn_dropout > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - attn_dropout, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - attn_dropout), 0.0)
    return jnp.einsum("bhnm,bhmd->bhnd", attn.astype(dtype), v)
