"""Direct Pallas windowed-attention kernel tests vs the XLA einsum path
(interpret mode on CPU; the same code compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_tpu.ops.pallas_window_attn import pallas_window_attention
from deepfake_tpu.ops.window_attn import (
    cosine_window_attention,
    scaled_window_attention,
)


def _qkv(B_, H, N, D, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B_, H, N, D)), jnp.float32)
    return mk(), mk(), mk()


def test_cosine_with_shift_mask():
    B, nW, H, N, D = 2, 4, 3, 49, 32
    q, k, v = _qkv(B * nW, H, N, D)
    rng = np.random.default_rng(1)
    bias = jnp.asarray(rng.standard_normal((H, N, N)), jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) > 0.7, -100.0, 0.0), jnp.float32
    )
    logit_scale = jnp.asarray(rng.random((H, 1, 1)) + 0.5, jnp.float32)
    want = cosine_window_attention(q, k, v, logit_scale, bias, mask)
    got = pallas_window_attention(
        q, k, v, bias=bias, mask=mask, logit_scale=logit_scale, cosine=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_scaled_3d_window_no_mask():
    B_, H, N, D = 4, 3, 392, 32  # (8,7,7) 3D windows
    q, k, v = _qkv(B_, H, N, D, seed=2)
    bias = jnp.asarray(np.random.default_rng(3).standard_normal((H, N, N)), jnp.float32)
    want = scaled_window_attention(q, k, v, D ** -0.5, bias, None)
    got = pallas_window_attention(q, k, v, bias=bias, scale=D ** -0.5, cosine=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_swin3d_forward_pallas_matches_xla():
    from deepfake_tpu.models.swin3d import SwinTransformer3D

    kw = dict(patch_size=(2, 4, 4), embed_dim=32, depths=(2,), num_heads=(2,),
              window_size=(2, 7, 7), drop_path_rate=0.0, patch_norm=True)
    m0 = SwinTransformer3D(**kw, use_pallas=False)
    m1 = SwinTransformer3D(**kw, use_pallas=True)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 4, 28, 28, 3)), jnp.float32
    )
    params = m0.init(jax.random.PRNGKey(0), x)["params"]
    a = m0.apply({"params": params}, x)
    b = m1.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_nhc_large_window_matches_einsum():
    """Token-major (lanes-packed-heads) kernel for big 3D windows == the
    einsum path with explicit head split/merge."""
    B_, H, N, D = 4, 4, 392, 32
    C = H * D
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B_, N, C)), jnp.float32)
    qh = x.reshape(B_, N, H, D).transpose(0, 2, 1, 3)
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.1, jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((2, N, N)) > 0.8, -100.0, 0.0), jnp.float32
    )
    want = scaled_window_attention(qh, qh, qh, 0.17, bias, mask)
    want = want.transpose(0, 2, 1, 3).reshape(B_, N, C)
    from deepfake_tpu.ops.pallas_window_attn import pallas_window_attention_nhc

    got = pallas_window_attention_nhc(
        x, x, x, num_heads=H, bias=bias, mask=mask, scale=0.17
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_swin3d_block_nhc_pallas_matches_xla(monkeypatch):
    """WindowAttention3D routes big windows through the token-major kernel;
    module outputs match the einsum path bit-for-bit-ish in f32. (The module
    gates the kernel to TPU backends; interpret mode is opted into here.)"""
    from deepfake_tpu.models.swin3d import SwinBlock3D

    monkeypatch.setenv("DEEPFAKE_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(8)
    # 8 clips x 16 windows = 128 window-steps: past the profitability gate
    x = jnp.asarray(rng.standard_normal((8, 8, 28, 28, 64)), jnp.float32)
    kw = dict(dim=64, num_heads=2, window_size=(8, 7, 7),
              shift_size=(4, 3, 3), drop=0.0, attn_drop=0.0, drop_path=0.0)
    m0 = SwinBlock3D(use_pallas=False, **kw)
    m1 = SwinBlock3D(use_pallas=True, **kw)
    v = m0.init(jax.random.PRNGKey(0), x)
    a = m0.apply(v, x, deterministic=True)
    b = m1.apply(v, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_nhc_qkv_fused_matches_dense_plus_einsum():
    """QKV-fused token-major kernel (projection inside the kernel, multiple
    head groups) == nn.Dense + einsum attention."""
    B_, H, N, D = 8, 8, 392, 32  # Gh=4 -> 2 head groups
    C = H * D
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((B_, N, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((3 * C,)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.1, jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((2, N, N)) > 0.8, -100.0, 0.0), jnp.float32
    )
    qkv = x @ w + b
    qh = qkv.reshape(B_, N, 3, H, D).transpose(2, 0, 3, 1, 4)
    want = scaled_window_attention(qh[0], qh[1], qh[2], D ** -0.5, bias, mask)
    want = want.transpose(0, 2, 1, 3).reshape(B_, N, C)
    from deepfake_tpu.ops.pallas_window_attn import (
        pallas_window_attention_nhc_qkv,
    )

    got, projected = pallas_window_attention_nhc_qkv(
        x, w, b, num_heads=H, bias=bias, mask=mask, scale=D ** -0.5
    )
    assert not projected
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_nhc_qkv_fused_ln_proj_matches_reference_chain():
    """Fully fused half-block (LN + qkv + attention + proj) at a single
    head group == manual LayerNorm -> dense -> einsum attention -> dense."""
    import jax.nn as jnn

    B_, H, N, D = 8, 4, 392, 32  # Gh=4 == H -> 1 head group
    C = H * D
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((B_, N, C)), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal((C,)), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.standard_normal((C,)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((3 * C,)) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.1, jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((2, N, N)) > 0.8, -100.0, 0.0), jnp.float32
    )

    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, -1, keepdims=True) - mu * mu, 0.0)
    xn = (x - mu) * (jax.lax.rsqrt(var + 1e-6) * ln_s) + ln_b
    qkv = xn @ w + b
    qh = qkv.reshape(B_, N, 3, H, D).transpose(2, 0, 3, 1, 4)
    want = scaled_window_attention(qh[0], qh[1], qh[2], D ** -0.5, bias, mask)
    want = want.transpose(0, 2, 1, 3).reshape(B_, N, C) @ wp + bp

    from deepfake_tpu.ops.pallas_window_attn import (
        pallas_window_attention_nhc_qkv,
    )

    got, projected = pallas_window_attention_nhc_qkv(
        x, w, b, num_heads=H, bias=bias, mask=mask, scale=D ** -0.5,
        ln=(ln_s, ln_b), proj=(wp, bp),
    )
    assert projected
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
