"""Fused Pallas TPU kernel for windowed attention (2D cosine / 3D scaled).

One grid step processes one (window, head) pair entirely in VMEM: optional
q/k L2-normalisation, QK^T on the MXU, additive relative-position bias and
shift mask, f32 softmax, and PV — so the [N, N] attention matrix never
round-trips through HBM (the reference materialises it per window in global
memory; src/models/swin_transformer2d.py:155-176).

Window sizes here are small (N = 49 tokens for 7x7 2D windows, N = 392 for
(8,7,7) 3D windows), so the win is bandwidth/fusion, not flash-style tiling.
The XLA einsum path in deepfake_tpu.ops.window_attn is the semantics
reference; parity is enforced by tests (interpret mode on CPU, compiled on
TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, scale_ref, out_ref, *, cosine: bool):
    q = q_ref[0, 0].astype(jnp.float32)  # [N, D]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    scale = scale_ref[pl.program_id(2), 0]  # per-head scalar (SMEM, unblocked)

    if cosine:
        qn = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
        kn = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))
        attn = jnp.dot(qn, kn.T, preferred_element_type=jnp.float32)
        attn = attn * scale
    else:
        attn = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)

    attn = attn + bias_ref[0] + mask_ref[0]
    attn = attn - jnp.max(attn, axis=-1, keepdims=True)
    attn = jnp.exp(attn)
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    out_ref[0, 0] = jnp.dot(attn, v, preferred_element_type=jnp.float32).astype(
        out_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("cosine", "n_masks"))
def _run(q, k, v, bias, mask, scales, *, cosine: bool, n_masks: int):
    B_, H, N, D = q.shape
    nW = n_masks
    B = B_ // nW
    # grid (batch, window, head): window index drives the shift-mask block so
    # index maps stay affine (Mosaic-friendly; no modulo)
    grid = (B, nW, H)
    qkv_spec = pl.BlockSpec(
        (1, 1, N, D), lambda b, w, h: (b * nW + w, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_kernel, cosine=cosine),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((1, N, N), lambda b, w, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda b, w, h: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scales [H,1], unblocked
        ],
        out_specs=qkv_spec,
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, bias, mask, scales)


def pallas_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    logit_scale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    cosine: bool = True,
) -> jnp.ndarray:
    """q,k,v [B_,H,N,D]; bias [H,N,N]; mask [nW,N,N] or None.
    cosine=True uses logit_scale [H,1,1]; else scalar `scale`."""
    B_, H, N, D = q.shape
    bias = bias.astype(jnp.float32)
    if mask is None:
        mask = jnp.zeros((1, N, N), jnp.float32)
    else:
        mask = mask.astype(jnp.float32)
    if cosine:
        scales = logit_scale.reshape(H, 1).astype(jnp.float32)
    else:
        scales = jnp.full((H, 1), scale, jnp.float32)
    return _run(q, k, v, bias, mask, scales, cosine=cosine, n_masks=mask.shape[0])
