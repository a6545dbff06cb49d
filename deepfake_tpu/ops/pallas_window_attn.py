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
from typing import Optional, Tuple

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


def _packed_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, scale_ref, out_ref,
                   *, cosine: bool, G: int):
    """Multi-window packing: G windows' tokens concatenate into one
    [G*N, G*N] attention so the MXU sees large tiles; cross-window logits are
    killed by a static block-diagonal mask before the softmax. ~G x more
    arithmetic on the QK^T, but at N=49 the MXU was >60% idle — packing trades
    wasted lanes for wasted flops and wins on wall clock."""
    # Mosaic-safe assembly: no lane-splitting reshapes — windows concatenate
    # along the sublane axis, bias/mask tile via pltpu.repeat.
    N, D = q_ref.shape[2], q_ref.shape[3]
    P = G * N
    cat = lambda ref: jnp.concatenate(
        [ref[g, 0].astype(jnp.float32) for g in range(G)], axis=0
    )  # [P, D]
    q, k, v = cat(q_ref), cat(k_ref), cat(v_ref)
    scale = scale_ref[pl.program_id(1), 0]

    if cosine:
        q = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
        k = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))
        attn = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    else:
        attn = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)

    # block-diagonal gate: -inf off own window
    row_w = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0) // N
    col_w = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1) // N
    attn = jnp.where(row_w == col_w, attn, -1e9)
    # rel-pos bias + per-window shift mask: tiled across all key blocks —
    # harmless off-diagonal, where -1e9 dominates
    bias_t = pltpu.repeat(bias_ref[0], G, 1)  # [N, P]
    add = jnp.concatenate(
        [bias_t + pltpu.repeat(mask_ref[g], G, 1) for g in range(G)], axis=0
    )  # [P, P]
    attn = attn + add

    attn = attn - jnp.max(attn, axis=-1, keepdims=True)
    attn = jnp.exp(attn)
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    out = jnp.dot(attn, v, preferred_element_type=jnp.float32)
    for g in range(G):
        out_ref[g, 0] = out[g * N:(g + 1) * N, :].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cosine", "G"))
def _run_packed(q, k, v, bias, mask_tiled, scales, *, cosine: bool, G: int):
    B_, H, N, D = q.shape
    grid = (B_ // G, H)
    qkv_spec = pl.BlockSpec(
        (G, 1, N, D), lambda i, h: (i, h, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_packed_kernel, cosine=cosine, G=G),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((1, N, N), lambda i, h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, N), lambda i, h: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=qkv_spec,
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, bias, mask_tiled, scales)


def _multihead_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, scale_ref,
                      out_ref, *, cosine: bool, Gh: int):
    """Large-window variant (3D Video Swin: N=392): one grid step runs Gh
    heads of ONE window entirely in VMEM, so the [N, N] f32 logits never
    reach HBM — the XLA einsum path materialises ~B_*H*N*N*4 bytes per block
    (the dominant HBM traffic at 5-9%% MFU; BASELINE_MEASURED.md). Grid is
    (head-group, batch, window) with the window axis fastest, so the bias
    block stays VMEM-resident across the whole (batch, window) sweep."""
    hg = pl.program_id(0)
    for g in range(Gh):
        q = q_ref[0, g].astype(jnp.float32)  # [N, D]
        k = k_ref[0, g].astype(jnp.float32)
        v = v_ref[0, g].astype(jnp.float32)
        scale = scale_ref[hg * Gh + g, 0]
        if cosine:
            q = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
            k = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))
            attn = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        else:
            attn = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
        attn = attn + bias_ref[g] + mask_ref[0]
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        attn = jnp.exp(attn)
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        out_ref[0, g] = jnp.dot(
            attn, v, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cosine", "n_masks", "Gh"))
def _run_multihead(q, k, v, bias, mask, scales, *, cosine: bool, n_masks: int,
                   Gh: int):
    B_, H, N, D = q.shape
    nW = n_masks
    B = B_ // nW
    # batch fastest: both the bias block (hg, slowest) and the mask block (w,
    # middle) stay VMEM-resident across the whole inner batch sweep — only
    # the small qkv/out blocks stream per step
    grid = (H // Gh, nW, B)
    qkv_spec = pl.BlockSpec(
        (1, Gh, N, D), lambda hg, w, b: (b * nW + w, hg, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_multihead_kernel, cosine=cosine, Gh=Gh),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((Gh, N, N), lambda hg, w, b: (hg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda hg, w, b: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scales [H,1]
        ],
        out_specs=qkv_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(),
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, bias, mask, scales)


def _softmax_weights(attn, no_max: bool):
    """Unnormalised softmax weights (caller defers the 1/sum to the PV
    output). no_max replaces the per-row max-reduce with a STATIC shift —
    softmax is shift-invariant, so the result is identical up to f32
    rounding, and the VPU saves a full reduce+broadcast pass over the
    [N, N] logits (the kernel's covering bound; BASELINE_MEASURED.md).
    Overflow is clamped (logits > 84 saturate the row anyway); underflow to
    exactly 0 would need every row entry below -79, impossible for Swin
    shift masks where the self-entry is always unmasked."""
    if no_max:
        return jnp.exp(jnp.minimum(attn - 24.0, 60.0))
    return jnp.exp(attn - jnp.max(attn, axis=-1, keepdims=True))


def _row_recip_sum(attn):
    """1 / row-sums of the [N, N] softmax weights. DEEPFAKE_TPU_SUM_DOT=1
    computes the sum as an MXU dot against a ones column instead of the VPU
    lane-reduce — one fewer full pass over the logits if the kernel is
    VPU-bound (A/B knob; f32-associativity may differ from jnp.sum at the
    last bit)."""
    import os

    if os.environ.get("DEEPFAKE_TPU_SUM_DOT") == "1":
        ones = jnp.ones((attn.shape[-1], 1), jnp.float32)
        return 1.0 / jnp.dot(attn, ones, preferred_element_type=jnp.float32)
    return 1.0 / jnp.sum(attn, axis=-1, keepdims=True)


def _nhc_kernel(*refs, cosine: bool, Gh: int, Dh: int, Wt: int,
                mxu_bf16: bool = False, has_mask: bool = True,
                no_max: bool = False):
    """[N, Gh*Dh] lane-sliced heads: q/k/v stay in token-major [B_, N, C]
    layout end to end, so the model never pays the 5D head-split/merge
    transposes (measured ~2 ms per 100 MB tensor, scripts lore in
    BASELINE_MEASURED.md). Head g occupies lanes [g*Dh, (g+1)*Dh); each grid
    step runs Wt consecutive windows x Gh heads (amortising per-step
    overhead, measured ~13 us/step at Wt=1)."""
    it = iter(refs)
    q_ref, k_ref, v_ref, bias_ref = (next(it) for _ in range(4))
    mask_ref = next(it) if has_mask else None
    scale_ref = next(it)
    out_ref = next(it)
    hg = pl.program_id(0)
    for w in range(Wt):
        for g in range(Gh):
            sl = slice(g * Dh, (g + 1) * Dh)
            scale = scale_ref[hg * Gh + g, 0]
            if mxu_bf16:
                # native-dtype MXU inputs with f32 accumulation — the einsum
                # path's exact semantics (ops/window_attn.py:94-103: q*scale
                # in bf16, dot preferred f32, softmax f32, attn cast to bf16
                # for PV); bf16xbf16 runs the MXU at full rate where f32
                # inputs run at a fraction
                q = q_ref[w, :, sl]
                k = k_ref[w, :, sl]
                v = v_ref[w, :, sl]
                if cosine:
                    qf = q.astype(jnp.float32)
                    kf = k.astype(jnp.float32)
                    q = (qf * jax.lax.rsqrt(
                        jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24)
                    )).astype(q_ref.dtype)
                    k = (kf * jax.lax.rsqrt(
                        jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24)
                    )).astype(k_ref.dtype)
                    attn = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
                    attn = attn * scale
                else:
                    qs = q * scale.astype(q_ref.dtype)
                    attn = jnp.dot(qs, k.T, preferred_element_type=jnp.float32)
                attn = attn + bias_ref[g]
                if has_mask:
                    attn = attn + mask_ref[w].astype(jnp.float32)
                attn = _softmax_weights(attn, no_max)
                r = _row_recip_sum(attn)
                out_ref[w, :, sl] = (jnp.dot(
                    attn.astype(v_ref.dtype), v,
                    preferred_element_type=jnp.float32,
                ) * r).astype(out_ref.dtype)
                continue
            q = q_ref[w, :, sl].astype(jnp.float32)  # [N, Dh]
            k = k_ref[w, :, sl].astype(jnp.float32)
            v = v_ref[w, :, sl].astype(jnp.float32)
            if cosine:
                q = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
                k = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))
                attn = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            else:
                attn = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
            # mask stored bf16 ({0, -100} are exact); promotes to f32 here
            attn = attn + bias_ref[g]
            if has_mask:
                attn = attn + mask_ref[w].astype(jnp.float32)
            attn = _softmax_weights(attn, no_max)
            r = _row_recip_sum(attn)
            out_ref[w, :, sl] = (jnp.dot(
                attn, v, preferred_element_type=jnp.float32
            ) * r).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cosine", "n_masks", "num_heads", "Gh", "Wt", "mxu_bf16",
                     "has_mask", "no_max"),
)
def _run_nhc(q, k, v, bias, mask, scales, *, cosine: bool, n_masks: int,
             num_heads: int, Gh: int, Wt: int, mxu_bf16: bool = False,
             has_mask: bool = True, no_max: bool = False):
    B_, N, C = q.shape
    H = num_heads
    Dh = C // H
    nW = n_masks
    B = B_ // nW
    # batch fastest; bias (slowest) and the mask window-group (middle) stay
    # VMEM-resident across the inner batch sweep
    grid = (H // Gh, nW // Wt, B)
    tok_spec = pl.BlockSpec(
        (Wt, N, Gh * Dh), lambda hg, wb, b: (b * (nW // Wt) + wb, 0, hg),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        tok_spec,
        tok_spec,
        tok_spec,
        pl.BlockSpec((Gh, N, N), lambda hg, wb, b: (hg, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [q, k, v, bias]
    if has_mask:
        in_specs += [pl.BlockSpec((Wt, N, N), lambda hg, wb, b: (wb, 0, 0),
                                  memory_space=pltpu.VMEM)]
        inputs += [mask]
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs += [scales]
    return pl.pallas_call(
        functools.partial(_nhc_kernel, cosine=cosine, Gh=Gh, Dh=Dh, Wt=Wt,
                          mxu_bf16=mxu_bf16, has_mask=has_mask, no_max=no_max),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=tok_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*inputs)


def _nhc_qkv_kernel(*refs, cosine: bool, Gh: int, Dh: int, Wt: int,
                    has_ln: bool, has_proj: bool, ln_eps: float = 1e-6,
                    mxu_bf16: bool = False, has_mask: bool = True,
                    no_max: bool = False):
    """QKV-fused token-major kernel: computes this head group's q/k/v slice
    from the raw [N, C] window tokens with VMEM-resident weights, so the
    [B_, N, 3C] qkv tensor never exists in HBM (the dense writes 3x and the
    attention kernel re-reads 3x the activation size per block; VERDICT r2
    next #1b). Numerics match the dense+kernel pipeline exactly: f32 MXU
    accumulation, bias add, round-trip through bf16 (nn.Dense emits
    compute-dtype), then the same f32 attention math.

    has_ln: pre-norm LayerNorm runs in-kernel on the raw tokens (flax
    LayerNorm numerics: f32 stats, fast variance, mul-then-bias order),
    eliminating the normed activation's HBM round trip.
    has_proj (single head-group grids only): the output projection runs
    in-kernel over the concatenated heads, eliminating the attention
    output's round trip too."""
    it = iter(refs)
    x_ref = next(it)
    ln_s_ref = next(it) if has_ln else None
    ln_b_ref = next(it) if has_ln else None
    w_ref = next(it)
    bq_ref = next(it)
    wp_ref = next(it) if has_proj else None
    bp_ref = next(it) if has_proj else None
    bias_ref = next(it)
    mask_ref = next(it) if has_mask else None
    scale_ref = next(it)
    out_ref = next(it)
    scratch = next(it, None)

    hg = pl.program_id(0)
    w_g = w_ref[0]  # [C, 3*Gh*Dh] compute-dtype
    GhDh = Gh * Dh
    for w in range(Wt):
        x = x_ref[w]  # [N, C]
        if has_ln:
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, -1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(xf * xf, -1, keepdims=True) - mu * mu, 0.0
            )
            mul = jax.lax.rsqrt(var + ln_eps) * ln_s_ref[0:1, :]
            x = ((xf - mu) * mul + ln_b_ref[0:1, :]).astype(x_ref.dtype)
        qkv = jnp.dot(x, w_g, preferred_element_type=jnp.float32)
        qkv = qkv + bq_ref[0, 0:1, :]
        qkv = qkv.astype(x_ref.dtype)  # nn.Dense casts accum to module dtype
        for g in range(Gh):
            sl = slice(g * Dh, (g + 1) * Dh)
            scale = scale_ref[hg * Gh + g, 0]
            if mxu_bf16 and not cosine:
                # native-dtype MXU inputs, f32 accumulation — the einsum
                # path's semantics; bf16xbf16 runs the MXU at full rate
                qb = qkv[:, sl]
                kb = qkv[:, GhDh + g * Dh:GhDh + (g + 1) * Dh]
                vb = qkv[:, 2 * GhDh + g * Dh:2 * GhDh + (g + 1) * Dh]
                attn = jnp.dot(qb * scale.astype(qb.dtype), kb.T,
                               preferred_element_type=jnp.float32)
                attn = attn + bias_ref[g]
                if has_mask:
                    attn = attn + mask_ref[w].astype(jnp.float32)
                attn = _softmax_weights(attn, no_max)
                # deferred normalization: divide the [N, Dh] PV output by the
                # row sums instead of the [N, N] weights — one fewer full
                # VPU pass over the logits (math-identical, f32-rounding off)
                r = _row_recip_sum(attn)
                o = jnp.dot(attn.astype(vb.dtype), vb,
                            preferred_element_type=jnp.float32) * r
                if has_proj:
                    scratch[:, sl] = o.astype(scratch.dtype)
                else:
                    out_ref[w, :, sl] = o.astype(out_ref.dtype)
                continue
            q = qkv[:, sl].astype(jnp.float32)
            k = qkv[:, GhDh + g * Dh:GhDh + (g + 1) * Dh].astype(jnp.float32)
            v = qkv[:, 2 * GhDh + g * Dh:2 * GhDh + (g + 1) * Dh].astype(jnp.float32)
            if cosine:
                q = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
                k = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))
                attn = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            else:
                attn = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
            attn = attn + bias_ref[g]
            if has_mask:
                attn = attn + mask_ref[w].astype(jnp.float32)
            attn = _softmax_weights(attn, no_max)
            r = _row_recip_sum(attn)
            o = jnp.dot(attn, v, preferred_element_type=jnp.float32) * r
            if has_proj:
                scratch[:, sl] = o.astype(scratch.dtype)
            else:
                out_ref[w, :, sl] = o.astype(out_ref.dtype)
        if has_proj:
            p = jnp.dot(scratch[:], wp_ref[:], preferred_element_type=jnp.float32)
            p = p + bp_ref[0:1, :]
            out_ref[w] = p.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cosine", "n_masks", "num_heads", "Gh", "Wt", "has_ln",
                     "has_proj", "mxu_bf16", "has_mask", "no_max"),
)
def _run_nhc_qkv(x, ln_s, ln_b, w, bq, wp, bp, bias, mask, scales, *,
                 cosine: bool, n_masks: int, num_heads: int, Gh: int, Wt: int,
                 has_ln: bool, has_proj: bool, mxu_bf16: bool = False,
                 has_mask: bool = True, no_max: bool = False):
    B_, N, C = x.shape
    H = num_heads
    Dh = C // H
    nW = n_masks
    B = B_ // nW
    HG = H // Gh
    grid = (HG, nW // Wt, B)
    x_spec = pl.BlockSpec(
        (Wt, N, C), lambda hg, wb, b: (b * (nW // Wt) + wb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if has_proj:
        assert HG == 1
        out_spec = x_spec
    else:
        out_spec = pl.BlockSpec(
            (Wt, N, Gh * Dh), lambda hg, wb, b: (b * (nW // Wt) + wb, 0, hg),
            memory_space=pltpu.VMEM,
        )
    hg_spec = lambda shape: pl.BlockSpec(
        shape, lambda hg, wb, b: (hg,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    row_spec = lambda shape: pl.BlockSpec(
        shape, lambda hg, wb, b: (0,) * len(shape), memory_space=pltpu.VMEM,
    )
    in_specs = [x_spec]
    inputs = [x]
    if has_ln:
        in_specs += [row_spec((1, C)), row_spec((1, C))]
        inputs += [ln_s.reshape(1, C).astype(jnp.float32),
                   ln_b.reshape(1, C).astype(jnp.float32)]
    in_specs += [hg_spec((1, C, 3 * Gh * Dh)), hg_spec((1, 8, 3 * Gh * Dh))]
    inputs += [w, bq]
    if has_proj:
        in_specs += [row_spec((C, C)), row_spec((1, C))]
        inputs += [wp.astype(x.dtype), bp.reshape(1, C).astype(jnp.float32)]
    in_specs += [hg_spec((Gh, N, N))]
    inputs += [bias]
    if has_mask:
        in_specs += [pl.BlockSpec((Wt, N, N), lambda hg, wb, b: (wb, 0, 0),
                                  memory_space=pltpu.VMEM)]
        inputs += [mask]
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs += [scales]
    return pl.pallas_call(
        functools.partial(_nhc_qkv_kernel, cosine=cosine, Gh=Gh, Dh=Dh, Wt=Wt,
                          has_ln=has_ln, has_proj=has_proj, mxu_bf16=mxu_bf16,
                          has_mask=has_mask, no_max=no_max),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((N, C), x.dtype)] if has_proj else [],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*inputs)


def nhc_qkv_group(num_heads: int, Dh: int, N: int) -> int:
    """Head group for the QKV-fused kernel; None-equivalent 0 when the fused
    form loses: at H//Gh > 4 the per-group re-reads of the full-C tokens
    outweigh the saved qkv intermediate. DEEPFAKE_TPU_NO_QKV_FUSE=1 forces
    the plain 'nhc' route (XLA computes the qkv dense — measured ~94% MFU —
    and the kernel reads lane slices only) for A/Bs."""
    import os

    if os.environ.get("DEEPFAKE_TPU_NO_QKV_FUSE") == "1":
        return 0
    Gh = _nhc_head_group(num_heads, Dh, N)
    return Gh if num_heads // Gh <= 4 else 0


def pallas_window_attention_nhc_qkv(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: Optional[jnp.ndarray],
    *,
    num_heads: int,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: float = 1.0,
    cosine: bool = False,
    logit_scale: Optional[jnp.ndarray] = None,
    ln: Optional[tuple] = None,
    proj: Optional[tuple] = None,
) -> Tuple[jnp.ndarray, bool]:
    """x [B_, N, C] window tokens; w_qkv [C, 3C] / b_qkv [3C] are the raw
    dense parameters (torch qkv column order: q|k|v, heads contiguous within
    each). ln=(scale, bias) fuses the pre-norm LayerNorm in-kernel; for
    single-head-group grids, proj=(w, b) additionally fuses the output
    projection. Returns (out [B_, N, C], proj_applied)."""
    B_, N, C = x.shape
    H = num_heads
    Dh = C // H
    bias = bias.astype(jnp.float32)
    has_mask = mask is not None
    nW = mask.shape[0] if has_mask else 1
    mask_arr = mask.astype(x.dtype) if has_mask else None
    if cosine:
        scales = logit_scale.reshape(H, 1).astype(jnp.float32)
    else:
        scales = jnp.full((H, 1), scale, jnp.float32)
    Gh = _nhc_head_group(H, Dh, N)
    HG = H // Gh
    GhDh = Gh * Dh
    # regroup [C, 3C] -> [HG, C, 3*GhDh]: per group, its q|k|v column slices
    wq = w_qkv.reshape(C, 3, HG, GhDh).transpose(2, 0, 1, 3).reshape(HG, C, 3 * GhDh)
    wq = wq.astype(x.dtype)
    if b_qkv is None:
        bq = jnp.zeros((HG, 8, 3 * GhDh), jnp.float32)
    else:
        bq = b_qkv.reshape(3, HG, GhDh).transpose(1, 0, 2).reshape(HG, 1, 3 * GhDh)
        bq = jnp.broadcast_to(bq.astype(jnp.float32), (HG, 8, 3 * GhDh))
    wt_max = _nhc_wt_max(C)
    # maskless (unshifted) blocks have no per-window mask grouping constraint:
    # any Wt dividing B_ is legal, so they get the full step-amortisation too
    wt_base = nW if has_mask else B_
    Wt = max(w for w in (1, 2, 4) if wt_base % w == 0 and w <= wt_max)
    if not has_mask:
        nW = Wt  # Wt windows per grid step, one "group" each
    has_ln = ln is not None
    has_proj = proj is not None and HG == 1
    ln_s, ln_b = ln if has_ln else (None, None)
    wp, bp = proj if has_proj else (None, None)
    import os

    # Native-dtype (bf16) MXU inputs for the attention dots — f32 dots pay
    # multi-pass MXU decomposition; bf16 matches the einsum path's own
    # semantics (bf16 in, f32 accumulation). Default ON since round 5: the
    # round-4 "neutral" A/B predates the bias cache, when gathers, not the
    # kernel, dominated the step; post-cache the switch measured +2.7% on
    # config 2 (507.4 vs 494.0 clips/s, docs/sweeps/round5_train.jsonl).
    # DEEPFAKE_TPU_QKV_MXU_BF16=0 for A/B.
    mxu_bf16 = (
        os.environ.get("DEEPFAKE_TPU_QKV_MXU_BF16", "1") == "1"
        and x.dtype == jnp.bfloat16
    )
    no_max = os.environ.get("DEEPFAKE_TPU_SOFTMAX_ROWMAX") != "1"
    out = _run_nhc_qkv(
        x, ln_s, ln_b, wq, bq, wp, bp, bias, mask_arr, scales, cosine=cosine,
        n_masks=nW, num_heads=H, Gh=Gh, Wt=Wt, has_ln=has_ln,
        has_proj=has_proj, mxu_bf16=mxu_bf16, has_mask=has_mask,
        no_max=no_max,
    )
    return out, has_proj


def _vmem_limit() -> int:
    """Mosaic per-kernel VMEM budget. The 16 MB default leaves most of the
    v5e's 128 MB VMEM unused; DEEPFAKE_TPU_VMEM_MB raises it for A/Bs of
    wider head groups / window tiles (too high starves XLA's own fusion
    double-buffering, so this stays an experiment knob, default 16)."""
    import os

    return int(float(os.environ.get("DEEPFAKE_TPU_VMEM_MB", "16")) * 2**20)


def _nhc_wt_max(C: int) -> int:
    """Windows per grid step cap: Wt=4 fits scoped VMEM at C<=128 (14.9M
    measured), wider channels take Wt=2. DEEPFAKE_TPU_NHC_WT overrides for
    A/Bs (VMEM overflows surface as Mosaic compile errors, not corruption)."""
    import os

    env = os.environ.get("DEEPFAKE_TPU_NHC_WT")
    if env:
        return int(env)
    if C <= 128 and os.environ.get("DEEPFAKE_TPU_NHC_WT_SMALLC"):
        return int(os.environ["DEEPFAKE_TPU_NHC_WT_SMALLC"])
    return 4 if C <= 128 else 2


def _nhc_head_group(H: int, Dh: int, N: int) -> int:
    """Lane blocks must be 128-multiples or the whole channel dim; among
    legal groups take the largest whose f32 bias block fits the VMEM budget
    (default ~4 MB; DEEPFAKE_TPU_NHC_BIAS_MB to A/B — larger groups halve
    the QKV-fused kernel's per-group re-reads of the full-C tokens but
    squeeze the double-buffered tile space)."""
    import os

    cap = int(float(os.environ.get("DEEPFAKE_TPU_NHC_BIAS_MB", "4")) * 1e6)
    cands = [
        g for g in range(1, H + 1)
        if H % g == 0 and ((g * Dh) % 128 == 0 or g == H)
    ]
    fitting = [g for g in cands if g * N * N * 4 <= cap]
    return max(fitting) if fitting else min(cands)


def nhc_route(B_: int, num_heads: int, N: int, C: int) -> str:
    """Kernel dispatch for a window-attention site: 'einsum' below the
    profitability gate, 'qkv' for the QKV-fused token-major kernel (<=4 head
    groups), 'nhc' for the plain token-major kernel otherwise."""
    if not nhc_is_profitable(B_, num_heads, N, C):
        return "einsum"
    return "qkv" if nhc_qkv_group(num_heads, C // num_heads, N) else "nhc"


def kernel_backend_ok() -> bool:
    """Kernels are TPU-only (interpret mode on CPU is orders of magnitude
    slower than the einsum path); tests opt into interpret mode via env."""
    import os

    return (
        jax.default_backend() == "tpu"
        or os.environ.get("DEEPFAKE_TPU_PALLAS_INTERPRET") == "1"
    )


def nhc_is_profitable(B_: int, num_heads: int, N: int, C: int,
                      min_steps: int = 4) -> bool:
    """Token-major kernel profitability gate. The pre-Wt-grouping kernel
    needed ~128 grid steps to keep the DMA/compute pipeline full (round-2
    measurements: VST-T b1 122 vs 90 clips/s; Swin-B b8 34 vs 72), but the
    Wt window-grouping forward amortises per-step work at few-window sites
    too: the round-4 sweep measured min_steps=4 as Swin-T 3D b1
    134.8 -> 180.3 clips/s (+34%) with configs 3 and 4 unchanged
    (210 and 140, within run noise), so 4 is the INFERENCE default.
    Training keeps a higher bar — the custom_vjp route only wins at many
    grid steps (swin3d.py routes with DEEPFAKE_TPU_TRAIN_PROFIT_STEPS=64;
    the round-4 sweep measured lowering it to 16 as a small LOSS on
    video_swin b8 train, 18.68% vs 18.88% MFU).
    DEEPFAKE_TPU_NHC_MIN_STEPS overrides for A/Bs."""
    import os

    if N < 128:
        return False
    env = os.environ.get("DEEPFAKE_TPU_NHC_MIN_STEPS")
    if env:
        min_steps = int(env)
    Gh = _nhc_head_group(num_heads, C // num_heads, N)
    return (num_heads // Gh) * B_ >= min_steps


def pallas_window_attention_nhc(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    num_heads: int,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: float = 1.0,
    cosine: bool = False,
    logit_scale: Optional[jnp.ndarray] = None,
    mxu_bf16: bool = False,
) -> jnp.ndarray:
    """Token-major variant: q,k,v [B_, N, C] with heads packed in lanes;
    returns [B_, N, C]. Avoids every head-split/merge transpose.
    mxu_bf16 keeps dot inputs in the native dtype (f32 accumulation) —
    matches the XLA einsum path's semantics and runs the MXU at full rate."""
    B_, N, C = q.shape
    H = num_heads
    bias = bias.astype(jnp.float32)
    has_mask = mask is not None
    nW = mask.shape[0] if has_mask else 1
    mask_arr = mask.astype(jnp.float32) if has_mask else None
    if cosine:
        scales = logit_scale.reshape(H, 1).astype(jnp.float32)
    else:
        scales = jnp.full((H, 1), scale, jnp.float32)
    Gh = _nhc_head_group(H, C // H, N)
    # windows per grid step. Batching windows measured NEUTRAL on Swin-B 3D
    # (110.8 vs 110.6 ms at Wt=4 vs 1 — the kernel is bound by in-step
    # compute, not per-step overhead), so this mainly reduces grid metadata.
    # Must divide nW (one sample's window rows are contiguous); capped by
    # scoped VMEM — Wt=4 fits at C<=128 (14.9M measured), wider channels
    # exceed the 16M limit, so they take Wt=2.
    wt_max = _nhc_wt_max(C)
    wt_base = nW if has_mask else B_
    Wt = max(w for w in (1, 2, 4) if wt_base % w == 0 and w <= wt_max)
    if not has_mask:
        nW = Wt  # maskless: Wt windows per grid step, one "group" each
    import os

    no_max = os.environ.get("DEEPFAKE_TPU_SOFTMAX_ROWMAX") != "1"
    # Inference default: native-dtype dots (f32 accumulation), matching the
    # einsum path's semantics; DEEPFAKE_TPU_NHC_MXU_BF16=0 restores the f32
    # upcast for A/B. Round-5 measured A/B (docs/sweeps/round5_train.jsonl):
    # config 4 neutral (160.2 vs 160.4 clips/s) — kept on for dtype
    # consistency with the qkv kernel, where the same switch won +2.7%.
    mxu_bf16 = (mxu_bf16
                or os.environ.get("DEEPFAKE_TPU_NHC_MXU_BF16", "1") == "1")
    return _run_nhc(
        q, k, v, bias,
        mask_arr.astype(q.dtype) if has_mask else None, scales,
        cosine=cosine, n_masks=nW, num_heads=H, Gh=Gh, Wt=Wt,
        mxu_bf16=mxu_bf16, has_mask=has_mask, no_max=no_max,
    )


def _nhc_packed_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, scale_ref,
                       out_ref, *, cosine: bool, Gh: int, Dh: int, P: int):
    """Small-window hybrid (VERDICT r2 next #5): token-major lane-sliced
    heads (no 5D head split/merge outside) x multi-window sublane packing —
    P windows' tokens concatenate into one [P*N, P*N] attention with a
    static block-diagonal gate, so at N=49 the MXU sees 196-row tiles
    instead of 49. ~P x extra logit arithmetic, traded for lane/sublane
    occupancy (the same trade as _packed_kernel, in the layout that skips
    the head transposes)."""
    N = q_ref.shape[1]
    PN = P * N
    for g in range(Gh):
        sl = slice(g * Dh, (g + 1) * Dh)
        scale = scale_ref[pl.program_id(0) * Gh + g, 0]
        qp = jnp.concatenate(
            [q_ref[p, :, sl].astype(jnp.float32) for p in range(P)], axis=0
        )  # [P*N, Dh]
        kp = jnp.concatenate(
            [k_ref[p, :, sl].astype(jnp.float32) for p in range(P)], axis=0
        )
        vp = jnp.concatenate(
            [v_ref[p, :, sl].astype(jnp.float32) for p in range(P)], axis=0
        )
        if cosine:
            qp = qp * jax.lax.rsqrt(jnp.maximum(jnp.sum(qp * qp, -1, keepdims=True), 1e-24))
            kp = kp * jax.lax.rsqrt(jnp.maximum(jnp.sum(kp * kp, -1, keepdims=True), 1e-24))
            attn = jnp.dot(qp, kp.T, preferred_element_type=jnp.float32) * scale
        else:
            attn = jnp.dot(qp * scale, kp.T, preferred_element_type=jnp.float32)
        row_w = jax.lax.broadcasted_iota(jnp.int32, (PN, PN), 0) // N
        col_w = jax.lax.broadcasted_iota(jnp.int32, (PN, PN), 1) // N
        attn = jnp.where(row_w == col_w, attn, -1e9)
        bias_t = pltpu.repeat(bias_ref[g], P, 1)  # [N, P*N]
        add = jnp.concatenate(
            [bias_t + pltpu.repeat(mask_ref[p].astype(jnp.float32), P, 1)
             for p in range(P)],
            axis=0,
        )
        attn = attn + add
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        attn = jnp.exp(attn)
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        out = jnp.dot(attn, vp, preferred_element_type=jnp.float32)
        for p in range(P):
            out_ref[p, :, sl] = out[p * N:(p + 1) * N, :].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("cosine", "num_heads", "Gh", "P")
)
def _run_nhc_packed(q, k, v, bias, mask_tiled, scales, *, cosine: bool,
                    num_heads: int, Gh: int, P: int):
    B_, N, C = q.shape
    H = num_heads
    Dh = C // H
    grid = (H // Gh, B_ // P)
    tok_spec = pl.BlockSpec(
        (P, N, Gh * Dh), lambda hg, i: (i, 0, hg), memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_nhc_packed_kernel, cosine=cosine, Gh=Gh, Dh=Dh, P=P),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            tok_spec,
            tok_spec,
            tok_spec,
            pl.BlockSpec((Gh, N, N), lambda hg, i: (hg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, N, N), lambda hg, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=tok_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, bias, mask_tiled, scales)


def pallas_window_attention_nhc_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    num_heads: int,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: float = 1.0,
    cosine: bool = False,
    logit_scale: Optional[jnp.ndarray] = None,
    pack: Optional[int] = None,
) -> jnp.ndarray:
    """Token-major packed-window attention for SMALL windows (N < 128):
    q,k,v [B_, N, C] with heads in lane slices; P consecutive windows pack
    into each MXU tile. Windows are batch-major, so absolute window i uses
    mask[i % nW] — the mask is tiled to [B_, N, N] (bf16, {0,-100} exact)."""
    B_, N, C = q.shape
    H = num_heads
    bias = bias.astype(jnp.float32)
    nW = mask.shape[0] if mask is not None else 1
    if mask is None:
        mask_tiled = jnp.zeros((B_, N, N), q.dtype)
    else:
        mask_tiled = jnp.tile(mask.astype(q.dtype), (B_ // nW, 1, 1))
    if cosine:
        scales = logit_scale.reshape(H, 1).astype(jnp.float32)
    else:
        scales = jnp.full((H, 1), scale, jnp.float32)
    if pack is None:
        pack = max(1, -(-128 // N))  # ceil: enough packed tokens for an MXU tile
    P = pack
    while P > 1 and B_ % P != 0:
        P -= 1
    Gh = _nhc_head_group(H, C // H, N)
    return _run_nhc_packed(
        q, k, v, bias, mask_tiled, scales, cosine=cosine, num_heads=H,
        Gh=Gh, P=P,
    )


def _nhc_bwd_kernel(*refs, Gh: int, Dh: int, Wt: int, has_mask: bool,
                    no_max: bool, mxu_bf16: bool = False):
    """Backward of the token-major window-attention kernel: recomputes the
    softmax attention from q/k in VMEM (nothing was saved — the [N, N] f32
    logits never existed in HBM in either direction) and emits dq/dk/dv in
    the same token-major layout plus the relative-position-bias gradient
    accumulated across (window, batch) grid steps. Standard softmax-attention
    backward: dV = A^T dO; dP = dO V^T; dS = A*(dP - rowsum(dP*A));
    dQ = dS K * s; dK = dS^T Q * s; dBias = sum_b dS. has_mask/no_max mirror
    the forward kernel (softmax probabilities are shift-invariant, so the
    recompute matches the forward to f32 rounding either way).
    mxu_bf16 keeps every dot's INPUTS in the native dtype with f32
    accumulation — exactly what XLA's autodiff of the einsum path emits (the
    cotangent of a bf16 dot is bf16), where f32 inputs run the MXU at a
    fraction of its bf16 rate. Softmax math and the dbias accumulator stay
    f32 either way."""
    it = iter(refs)
    q_ref, k_ref, v_ref, do_ref, bias_ref = (next(it) for _ in range(5))
    mask_ref = next(it) if has_mask else None
    scale_ref = next(it)
    dq_ref, dk_ref, dv_ref, dbias_ref = (next(it) for _ in range(4))
    wb = pl.program_id(1)
    b = pl.program_id(2)

    @pl.when(jnp.logical_and(wb == 0, b == 0))
    def _zero():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for w in range(Wt):
        for g in range(Gh):
            sl = slice(g * Dh, (g + 1) * Dh)
            scale = scale_ref[pl.program_id(0) * Gh + g, 0]
            if mxu_bf16:
                q = q_ref[w, :, sl]  # [N, Dh], native dtype
                k = k_ref[w, :, sl]
                v = v_ref[w, :, sl]
                do = do_ref[w, :, sl]
                qs = q * scale.astype(q_ref.dtype)
                logits = jnp.dot(qs, k.T,
                                 preferred_element_type=jnp.float32)
            else:
                q = q_ref[w, :, sl].astype(jnp.float32)  # [N, Dh]
                k = k_ref[w, :, sl].astype(jnp.float32)
                v = v_ref[w, :, sl].astype(jnp.float32)
                do = do_ref[w, :, sl].astype(jnp.float32)
                logits = jnp.dot(q * scale, k.T,
                                 preferred_element_type=jnp.float32)
            logits = logits + bias_ref[g].astype(jnp.float32)
            if has_mask:
                logits = logits + mask_ref[w].astype(jnp.float32)
            e = _softmax_weights(logits, no_max)
            attn = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))  # [N, N]
            if mxu_bf16:
                attn_lp = attn.astype(q_ref.dtype)
                dv = jnp.dot(attn_lp.T, do,
                             preferred_element_type=jnp.float32)
                dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
                ds = attn * (dp - jnp.sum(dp * attn, axis=-1, keepdims=True))
                ds_lp = ds.astype(q_ref.dtype)
                dq = jnp.dot(ds_lp, k, preferred_element_type=jnp.float32)
                dk = jnp.dot(ds_lp.T, q, preferred_element_type=jnp.float32)
                dq, dk = dq * scale, dk * scale
            else:
                dv = jnp.dot(attn.T, do, preferred_element_type=jnp.float32)
                dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
                ds = attn * (dp - jnp.sum(dp * attn, axis=-1, keepdims=True))
                dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
                dk = jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * scale
            dq_ref[w, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[w, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[w, :, sl] = dv.astype(dv_ref.dtype)
            dbias_ref[g] += ds


@functools.partial(
    jax.jit, static_argnames=("n_masks", "num_heads", "Gh", "Wt", "has_mask",
                              "no_max", "mxu_bf16")
)
def _run_nhc_bwd(q, k, v, do, bias, mask, scales, *, n_masks: int,
                 num_heads: int, Gh: int, Wt: int, has_mask: bool = True,
                 no_max: bool = False, mxu_bf16: bool = False):
    B_, N, C = q.shape
    H = num_heads
    Dh = C // H
    nW = n_masks
    B = B_ // nW
    grid = (H // Gh, nW // Wt, B)
    tok_spec = pl.BlockSpec(
        (Wt, N, Gh * Dh), lambda hg, wb, b: (b * (nW // Wt) + wb, 0, hg),
        memory_space=pltpu.VMEM,
    )
    bias_spec = pl.BlockSpec((Gh, N, N), lambda hg, wb, b: (hg, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [tok_spec, tok_spec, tok_spec, tok_spec, bias_spec]
    inputs = [q, k, v, do, bias]
    if has_mask:
        in_specs += [pl.BlockSpec((Wt, N, N), lambda hg, wb, b: (wb, 0, 0),
                                  memory_space=pltpu.VMEM)]
        inputs += [mask]
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs += [scales]
    return pl.pallas_call(
        functools.partial(_nhc_bwd_kernel, Gh=Gh, Dh=Dh, Wt=Wt,
                          has_mask=has_mask, no_max=no_max,
                          mxu_bf16=mxu_bf16),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct((H, N, N), jnp.float32),  # dbias
        ],
        grid=grid,
        in_specs=in_specs,
        out_specs=[tok_spec, tok_spec, tok_spec, bias_spec],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _nhc_train(cfg: tuple, q, k, v, bias, mask, scales):
    """Differentiable token-major window attention (non-cosine), for the
    Swin3D TRAINING path (VERDICT r2 next #2a): forward = the NHC kernel;
    backward = a Pallas kernel recomputing the attention in VMEM — the f32
    [N, N] logits never round-trip HBM in either pass, and nothing beyond
    q/k/v is saved between passes.
    cfg = (n_masks, num_heads, Gh, Wt, has_mask, no_max, mxu_bf16);
    unshifted blocks run maskless (has_mask=False: no zero-mask VMEM stream
    or add), no_max uses the static-shift softmax in BOTH passes
    (shift-invariant; same up to f32 rounding), and mxu_bf16 keeps dot
    inputs in the native dtype in BOTH passes (the einsum path's exact
    semantics — see _nhc_bwd_kernel)."""
    n_masks, num_heads, Gh, Wt, has_mask, no_max, mxu_bf16 = cfg
    return _run_nhc(q, k, v, bias, mask if has_mask else None, scales,
                    cosine=False, n_masks=n_masks, num_heads=num_heads,
                    Gh=Gh, Wt=Wt, has_mask=has_mask, no_max=no_max,
                    mxu_bf16=mxu_bf16)


def _nhc_train_fwd(cfg, q, k, v, bias, mask, scales):
    out = _nhc_train(cfg, q, k, v, bias, mask, scales)
    return out, (q, k, v, bias, mask, scales)


def _nhc_train_bwd(cfg, res, g):
    n_masks, num_heads, Gh, Wt, has_mask, no_max, mxu_bf16 = cfg
    q, k, v, bias, mask, scales = res
    # backward defaults to Wt=1: it holds 7 token blocks + bias AND dbias
    # blocks + 5 [N,N] f32 temporaries per step — Wt=2 measured 16.46M of
    # the 16M scoped-VMEM limit at C=384 (layers_2, Swin3D-T), and Wt=1 with
    # an f32 bias block still 16.24M. The bias INPUT therefore rides in the
    # compute dtype (bf16 under training: ~0.4% rounding on a recomputed
    # logit, far below gradient noise; f32 models keep exact math). dbias
    # accumulation stays f32. Maskless forwards grouped Wt windows per grid
    # step (n_masks = Wt there); the backward regroups to its own Wt.
    # DEEPFAKE_TPU_NHC_BWD_WT (with DEEPFAKE_TPU_VMEM_MB raised) A/Bs wider
    # backward tiles.
    import os

    wt = int(os.environ.get("DEEPFAKE_TPU_NHC_BWD_WT", "1"))
    B_ = q.shape[0]
    if has_mask:
        bwd_masks = n_masks
        while wt > 1 and (bwd_masks % wt or B_ % bwd_masks):
            wt -= 1
    else:
        while wt > 1 and B_ % wt:
            wt -= 1
        bwd_masks = wt
    dq, dk, dv, dbias = _run_nhc_bwd(
        q, k, v, g.astype(q.dtype), bias.astype(q.dtype), mask, scales,
        n_masks=bwd_masks, num_heads=num_heads, Gh=Gh,
        Wt=wt, has_mask=has_mask, no_max=no_max, mxu_bf16=mxu_bf16,
    )
    # mask is a shift constant and scales a constant table: zero cotangents
    # (dropped by XLA); bias IS learnable — its grad flows to the table
    return dq, dk, dv, dbias.astype(bias.dtype), jnp.zeros_like(mask), \
        jnp.zeros_like(scales)


_nhc_train.defvjp(_nhc_train_fwd, _nhc_train_bwd)


def pallas_window_attention_nhc_train(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    num_heads: int,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Training-mode token-major window attention with a fused Pallas
    backward (scaled-dot only; the cosine 2D stack trains on the einsum path
    — its windows sit below the kernel's profitability gate anyway)."""
    import os

    B_, N, C = q.shape
    H = num_heads
    bias = bias.astype(jnp.float32)
    has_mask = mask is not None
    nW = mask.shape[0] if has_mask else 1
    mask_arr = (
        mask.astype(q.dtype) if has_mask
        else jnp.zeros((1, N, N), q.dtype)  # vjp-signature placeholder only
    )
    scales = jnp.full((H, 1), scale, jnp.float32)
    Gh = _nhc_head_group(H, C // H, N)
    wt_max = _nhc_wt_max(C)
    wt_base = nW if has_mask else B_
    Wt = max(w for w in (1, 2, 4) if wt_base % w == 0 and w <= wt_max)
    if not has_mask:
        nW = Wt  # maskless: Wt windows per grid step, one "group" each
    # TRAINING keeps the max-stabilised softmax by default: scaled-dot logits
    # are unbounded here, and a logit drifting past the static-shift clamp
    # (exp(min(x-24, 60))) would silently saturate the weights while the
    # backward still applies the unclamped softmax gradient formula. The
    # static shift stays an inference-only optimisation (the 2D stack guards
    # the same way via bounded=deterministic, models/swin2d.py). Opt-in for
    # A/Bs: DEEPFAKE_TPU_SOFTMAX_STATIC_TRAIN=1.
    no_max = os.environ.get("DEEPFAKE_TPU_SOFTMAX_STATIC_TRAIN") == "1"
    # Optional native-dtype MXU inputs in BOTH kernel passes (f32
    # accumulation/softmax) — the einsum training path's exact dtype
    # discipline. Measured NEUTRAL-to-slightly-negative on the video_swin
    # train step (round-5 A/B, docs/sweeps/round5_train.jsonl: bf16 18.46%
    # MFU vs f32-upcast 18.87% at b8a1) — the backward is bound by its
    # VMEM-resident softmax recompute and [N,N] f32 temporaries, not MXU
    # input rate, at these window sizes. Default stays f32; opt in with
    # DEEPFAKE_TPU_TRAIN_MXU_BF16=1 (grad parity within bf16 rounding is
    # tested: test_nhc_train_mxu_bf16_grads_close_to_f32).
    mxu_bf16 = os.environ.get("DEEPFAKE_TPU_TRAIN_MXU_BF16", "0") == "1"
    return _nhc_train((nW, H, Gh, Wt, has_mask, no_max, mxu_bf16),
                      q, k, v, bias, mask_arr, scales)


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
    pack_windows: Optional[int] = None,
) -> jnp.ndarray:
    """q,k,v [B_,H,N,D]; bias [H,N,N]; mask [nW,N,N] or None.
    cosine=True uses logit_scale [H,1,1]; else scalar `scale`.
    pack_windows: how many windows to fuse per MXU tile (default: enough to
    reach ~128 packed tokens; 1 disables packing)."""
    B_, H, N, D = q.shape
    bias = bias.astype(jnp.float32)
    nW = mask.shape[0] if mask is not None else 1
    if mask is None:
        mask_arr = jnp.zeros((1, N, N), jnp.float32)
    else:
        mask_arr = mask.astype(jnp.float32)
    if cosine:
        scales = logit_scale.reshape(H, 1).astype(jnp.float32)
    else:
        scales = jnp.full((H, 1), scale, jnp.float32)

    if N >= 128:
        # large windows: logits-in-VMEM multi-head kernel; head group sized
        # so the f32 bias block stays ~<=2.5 MB
        Gh = 1
        for g in range(1, H + 1):
            if H % g == 0 and g * N * N * 4 <= 2_500_000:
                Gh = g
        return _run_multihead(
            q, k, v, bias, mask_arr, scales, cosine=cosine, n_masks=nW, Gh=Gh
        )

    if pack_windows is None:
        pack_windows = max(1, 128 // N)
    G = pack_windows
    while G > 1 and B_ % G != 0:
        G -= 1
    if G > 1:
        # per-absolute-window masks [B_, N, N] (windows are batch-major:
        # window index i uses mask i % nW); the packed spec reads G
        # consecutive windows per grid step
        mask_tiled = jnp.tile(mask_arr, (B_ // nW, 1, 1))
        return _run_packed(
            q, k, v, bias, mask_tiled, scales, cosine=cosine, G=G
        )
    return _run(q, k, v, bias, mask_arr, scales, cosine=cosine, n_masks=nW)
