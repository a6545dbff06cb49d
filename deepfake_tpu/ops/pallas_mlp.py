"""Fused transformer-block tail for TPU: (a + b) -> LayerNorm -> fc1 ->
GELU -> fc2 -> +residual, one Pallas kernel over token tiles.

XLA materialises every step of this chain in HBM — the [L, 4C] hidden tensor
alone is 4x the activation size per block (the dominant stage-0/1 MLP cost in
Video Swin 3D, BASELINE_MEASURED.md r3). Here the whole tail streams token
tiles through VMEM with both weight matrices resident; MXU contractions are
full-K (C and 4C), the LN statistics run in f32, and every dense step
round-trips through the compute dtype so the numerics match the unfused
nn.Dense/LayerNorm pipeline (flax fast-variance LN, eps 1e-6).

Inference-only (the model gates on `deterministic`; dropout/drop-path are
identity there). Reference chain being fused:
src/models/video_swin_transformer.py:276-278 (x + mlp(norm2(x))).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfake_tpu.models.layers import gelu_exact


def _kernel(a_ref, b_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, *, eps: float, has_residual_in: bool):
    if has_residual_in:
        s = a_ref[:] + b_ref[:]
    else:
        s = a_ref[:]
    xf = s.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mu * mu, 0.0)
    mul = jax.lax.rsqrt(var + eps) * ln_s_ref[0:1, :]
    xn = ((xf - mu) * mul + ln_b_ref[0:1, :]).astype(s.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h = (h + b1_ref[0:1, :]).astype(s.dtype)
    h = gelu_exact(h)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = (y + b2_ref[0:1, :]).astype(s.dtype)
    out_ref[:] = s + y


def _tile(L: int, C: int, hidden: int, dtype_bytes: int) -> int:
    budget = 11 * 1024 * 1024 - 2 * (C * hidden + hidden * C) * dtype_bytes
    for t in (2048, 1024, 512, 256, 128, 64, 32, 16):
        if L % t:
            continue
        need = t * (hidden + 4 * C) * dtype_bytes * 2  # h + a/b/out, dbl-buffered
        if need <= budget:
            return t
    return 0


def mlp_tail_supported(L: int, C: int, hidden: int, dtype) -> bool:
    import os

    if os.environ.get("DEEPFAKE_TPU_NO_MLP_TAIL") == "1":
        return False  # measurement escape hatch
    if L < int(os.environ.get("DEEPFAKE_TPU_MLP_TAIL_MINL", "32768")):
        # few tiles -> the kernel's DMA/compute pipeline never fills and the
        # resident weight load dominates. Measured: Video Swin-T b1 (config
        # 2) runs 99.1 with the kernel vs 129.2 without; Swin-B b8 (config
        # 4, stage-0 L=401k) runs 108.9 with vs 104.9 without. The MINL env
        # var A/Bs intermediate L (config 4 stage 2 sits at L=25088).
        return False
    if jnp.dtype(dtype).itemsize * (C * hidden + hidden * C) > 9 * 1024 * 1024:
        return False  # weights don't fit VMEM alongside tiles (stage-3 scale)
    return _tile(L, C, hidden, jnp.dtype(dtype).itemsize) > 0


@functools.partial(jax.jit, static_argnames=("eps", "has_residual_in"))
def _run(a, b, ln_s, ln_b, w1, b1, w2, b2, *, eps: float,
         has_residual_in: bool):
    L, C = a.shape
    hidden = w1.shape[1]
    t = _tile(L, C, hidden, a.dtype.itemsize)
    tile_spec = pl.BlockSpec((t, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, has_residual_in=has_residual_in),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=(L // t,),
        in_specs=[
            tile_spec,
            tile_spec,
            full((1, C)), full((1, C)),
            full((C, hidden)), full((1, hidden)),
            full((hidden, C)), full((1, C)),
        ],
        out_specs=tile_spec,
        interpret=jax.default_backend() != "tpu",
    )(a, b, ln_s, ln_b, w1, b1, w2, b2)


def fused_mlp_tail(
    x: jnp.ndarray,
    attn_out,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """x, attn_out: [..., C] (attn_out may be None: no input residual).
    Returns s + fc2(gelu(fc1(LN(s)))) where s = x (+ attn_out)."""
    shape = x.shape
    C = shape[-1]
    L = x.size // C
    a = x.reshape(L, C)
    b = a if attn_out is None else attn_out.reshape(L, C)
    out = _run(
        a, b,
        ln_scale.reshape(1, C).astype(jnp.float32),
        ln_bias.reshape(1, C).astype(jnp.float32),
        w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
        w2.astype(x.dtype), b2.reshape(1, C).astype(jnp.float32),
        eps=eps, has_residual_in=attn_out is not None,
    )
    return out.reshape(shape)
