"""Fused Pallas TPU kernel for Inception-ResNet residual blocks B and C.

One grid step keeps a tile of whole frames resident in VMEM and runs the
entire residual block on it — branch 1x1 convs as MXU GEMMs, the separable
1xK / Kx1 convs as K shifted GEMMs (sublane rolls + boundary masks), folded
BatchNorm affines in f32, the residual scale-add and ReLU — so none of the
block's intermediates round-trip through HBM. The XLA path materialises ~6
tensors per block in HBM (reference equivalent: torch materialises the same,
src/models/InceptionResV2.py:97-163); at 12x12x1088 that traffic is ~5x the
roofline of reading x once.

Applies to the inference path only (BatchNorm is folded from running stats;
no custom_vjp). Training and non-TPU backends use the XLA path; parity is
enforced by tests (interpret mode on CPU, compiled on TPU).

Weight layout (pre-folded by the caller, deepfake_tpu/models/inception_resnet_v2.py):
    w0   [C, n0]       branch-0 1x1 kernel
    a0   [2, n0]       folded BN affine (row 0 scale, row 1 bias), f32
    w1   [C, n1]       branch-1 first 1x1
    a1   [2, n1]
    wh   [K, n1, nh]   1xK conv taps (along the fast / W axis)
    ah   [2, nh]
    wv   [K, nh, nv]   Kx1 conv taps (along the slow / H axis)
    av   [2, nv]
    w2a  [n0, C]       final plain 1x1, split at the concat boundary
    w2b  [nv, C]
    b2   [C]           final conv bias, f32
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _affine_relu(y, a):
    return jnp.maximum(y * a[0] + a[1], 0.0)


def _shifted_gemm(h, taps, *, side: int, frame_len: int, vertical: bool, dtype):
    """sum_k roll(h, -(k - K//2) * stride) @ taps[k], rows masked where the
    source index crosses a spatial boundary — a separable conv along one axis
    of the flattened (frame, i, j) row index. Frames occupy `frame_len` rows
    (side*side real rows + optional alignment padding; padded rows compute
    garbage that the caller discards, and masks keep them from ever being
    READ as conv inputs). h: [R, cin] f32."""
    K = taps.shape[0]
    R = h.shape[0]
    p = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % frame_len
    pos = (p // side) if vertical else (p % side)
    stride = side if vertical else 1
    acc = jnp.zeros((R, taps.shape[2]), jnp.float32)
    for k in range(K):
        off = k - K // 2
        if off == 0:
            hs = h
        else:
            src = pos + off
            valid = (src >= 0) & (src < side)
            hs = jnp.where(valid, jnp.roll(h, -off * stride, axis=0), 0.0)
        acc += jnp.dot(hs.astype(dtype), taps[k], preferred_element_type=jnp.float32)
    return acc


def _kernel(x_ref, w0_ref, a0_ref, w1_ref, a1_ref, wh_ref, ah_ref,
            wv_ref, av_ref, w2a_ref, w2b_ref, b2_ref, out_ref,
            *, side: int, frame_len: int, res_scale: float, activation: bool):
    d = x_ref.dtype
    x = x_ref[...]  # [R, C], R = whole frames (block starts on a frame boundary)
    f32 = jnp.float32

    b0 = _affine_relu(
        jnp.dot(x, w0_ref[...], preferred_element_type=f32), a0_ref[...]
    )
    h = _affine_relu(
        jnp.dot(x, w1_ref[...], preferred_element_type=f32), a1_ref[...]
    )
    # 1xK along the minor spatial axis (period = side, stride 1)
    h = _affine_relu(
        _shifted_gemm(h, wh_ref[...], side=side, frame_len=frame_len,
                      vertical=False, dtype=d),
        ah_ref[...],
    )
    # Kx1 along the major spatial axis (period = side, stride = side)
    h = _affine_relu(
        _shifted_gemm(h, wv_ref[...], side=side, frame_len=frame_len,
                      vertical=True, dtype=d),
        av_ref[...],
    )
    res = (
        jnp.dot(b0.astype(d), w2a_ref[...], preferred_element_type=f32)
        + jnp.dot(h.astype(d), w2b_ref[...], preferred_element_type=f32)
        + b2_ref[...]
    )
    # residual add in the model dtype (the XLA path adds in d too); avoids an
    # f32 copy of the largest tensor in VMEM
    out = x + (res_scale * res).astype(d)
    if activation:
        out = jnp.maximum(out, 0.0)
    out_ref[...] = out


def _row_blocked_call(kernel, x, weights, *, frame_len: int,
                      frames_per_block: int, interpret: Optional[bool]):
    """Launch `kernel` over [N*S2, C] rows in whole-frame blocks (every block
    boundary is a frame boundary, so in-kernel shift masks built from local
    iota are exact). Flat rows avoid the [ft, S2, C] sublane-merge relayout
    Mosaic rejects for S2 not a multiple of the tile (e.g. 25)."""
    R, C = x.shape
    N = R // frame_len
    # frame tile: divides N, row count divisible by 8 (sublane constraint),
    # as close to the requested size as possible; whole-array fallback is
    # always legal (block == array dims are exempt from the constraint)
    cands = [f for f in range(1, N + 1) if N % f == 0 and (f * frame_len) % 8 == 0]
    below = [f for f in cands if f <= frames_per_block]
    ft = max(below) if below else (min(cands) if cands else N)
    rblk = ft * frame_len
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    full = lambda w: pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(N // ft,),
        in_specs=[
            pl.BlockSpec((rblk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *(full(w) for w in weights),
        ],
        out_specs=pl.BlockSpec((rblk, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, *weights)


@functools.partial(
    jax.jit,
    static_argnames=("side", "frame_len", "res_scale", "activation",
                     "frames_per_block", "interpret"),
)
def fused_inception_block(
    x,
    w0, a0, w1, a1, wh, ah, wv, av, w2a, w2b, b2,
    *,
    side: int,
    frame_len: int,
    res_scale: float,
    activation: bool = True,
    frames_per_block: int = 4,
    interpret: Optional[bool] = None,
):
    """x: [N*frame_len, C] flat frame-major rows (frame_len = side*side
    rounded up to the sublane multiple; pad rows are garbage-in/garbage-out)
    -> same shape."""
    return _row_blocked_call(
        functools.partial(_kernel, side=side, frame_len=frame_len,
                          res_scale=res_scale, activation=activation),
        x, (w0, a0, w1, a1, wh, ah, wv, av, w2a, w2b, b2),
        frame_len=frame_len, frames_per_block=frames_per_block,
        interpret=interpret,
    )


def _shifted_gemm2d(h, taps, *, side: int, frame_len: int, dtype):
    """Full KxK conv as K*K shifted GEMMs over the flattened (frame, i, j)
    row index; taps [K*K, cin, cout] in (ky, kx) row-major order. Frames
    occupy `frame_len` rows (see _shifted_gemm)."""
    KK = taps.shape[0]
    K = {1: 1, 9: 3, 25: 5}[KK]
    R = h.shape[0]
    p = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % frame_len
    pos_j = p % side
    pos_i = p // side
    acc = jnp.zeros((R, taps.shape[2]), jnp.float32)
    for k in range(KK):
        oy, ox = k // K - K // 2, k % K - K // 2
        if oy == 0 and ox == 0:
            hs = h
        else:
            valid = (
                ((pos_j + ox) >= 0) & ((pos_j + ox) < side)
                & ((pos_i + oy) >= 0) & ((pos_i + oy) < side)
            )
            hs = jnp.where(valid, jnp.roll(h, -(oy * side + ox), axis=0), 0.0)
        acc += jnp.dot(hs.astype(dtype), taps[k], preferred_element_type=jnp.float32)
    return acc


def _kernel_a(x_ref, w0_ref, a0_ref, w1_ref, a1_ref, w1b_ref, a1b_ref,
              w2_ref, a2_ref, w2b_ref, a2b_ref, w2c_ref, a2c_ref,
              wf0_ref, wf1_ref, wf2_ref, bf_ref, out_ref,
              *, side: int, frame_len: int, res_scale: float):
    """Inception-ResNet block A: three branches (1x1; 1x1+3x3; 1x1+3x3+3x3),
    concat, plain 1x1 (+bias), scaled residual, ReLU — concat expressed as
    three partial GEMMs against the split final kernel."""
    d = x_ref.dtype
    x = x_ref[...]  # [R, C] whole frames
    f32 = jnp.float32

    b0 = _affine_relu(jnp.dot(x, w0_ref[...], preferred_element_type=f32), a0_ref[...])
    b1 = _affine_relu(jnp.dot(x, w1_ref[...], preferred_element_type=f32), a1_ref[...])
    b1 = _affine_relu(_shifted_gemm2d(b1, w1b_ref[...], side=side, frame_len=frame_len, dtype=d), a1b_ref[...])
    b2 = _affine_relu(jnp.dot(x, w2_ref[...], preferred_element_type=f32), a2_ref[...])
    b2 = _affine_relu(_shifted_gemm2d(b2, w2b_ref[...], side=side, frame_len=frame_len, dtype=d), a2b_ref[...])
    b2 = _affine_relu(_shifted_gemm2d(b2, w2c_ref[...], side=side, frame_len=frame_len, dtype=d), a2c_ref[...])
    res = (
        jnp.dot(b0.astype(d), wf0_ref[...], preferred_element_type=f32)
        + jnp.dot(b1.astype(d), wf1_ref[...], preferred_element_type=f32)
        + jnp.dot(b2.astype(d), wf2_ref[...], preferred_element_type=f32)
        + bf_ref[...]
    )
    out = jnp.maximum(x + (res_scale * res).astype(d), 0.0)
    out_ref[...] = out


@functools.partial(
    jax.jit,
    static_argnames=("side", "frame_len", "res_scale", "frames_per_block",
                     "interpret"),
)
def fused_inception_block_a(
    x,
    w0, a0, w1, a1, w1b, a1b, w2, a2, w2b, a2b, w2c, a2c, wf0, wf1, wf2, bf,
    *,
    side: int,
    frame_len: int,
    res_scale: float,
    frames_per_block: int = 2,
    interpret: Optional[bool] = None,
):
    """x: [N*frame_len, C] flat frame-major rows (Inception-ResNet block A)."""
    return _row_blocked_call(
        functools.partial(_kernel_a, side=side, frame_len=frame_len,
                          res_scale=res_scale),
        x, (w0, a0, w1, a1, w1b, a1b, w2, a2, w2b, a2b, w2c, a2c, wf0, wf1, wf2, bf),
        frame_len=frame_len, frames_per_block=frames_per_block,
        interpret=interpret,
    )


def fold_bn(bn_scale, bn_bias, bn_mean, bn_var, eps: float):
    """BatchNorm running stats -> affine [2, cout] f32 (row 0 scale, row 1
    bias) such that affine[0]*conv(x) + affine[1] == bn(conv(x)) at
    inference."""
    s = bn_scale.astype(jnp.float32) * jax.lax.rsqrt(
        bn_var.astype(jnp.float32) + eps
    )
    t = bn_bias.astype(jnp.float32) - bn_mean.astype(jnp.float32) * s
    return jnp.stack([s, t])
