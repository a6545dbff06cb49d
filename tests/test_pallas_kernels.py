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


@pytest.mark.parametrize("use_mask", [True, False])
def test_nhc_train_custom_vjp_grads_match_einsum(use_mask):
    """Training-path kernel (custom_vjp, fused Pallas backward): gradients
    w.r.t. q/k/v AND the relative-position bias match jax.grad through the
    f32 einsum reference (VERDICT r2 next #2a). use_mask=False covers the
    maskless route (Wt=4 batch-grouped forward + Wt/n_masks backward regroup
    — exercised in production by resident-stage unshifted blocks, ADVICE r3)."""
    from deepfake_tpu.ops.pallas_window_attn import (
        pallas_window_attention_nhc_train,
    )
    from deepfake_tpu.ops.window_attn import scaled_window_attention

    rng = np.random.default_rng(11)
    B, nW, H, N, Dh = 1, 4, 4, 128, 32
    C = H * Dh
    B_ = B * nW  # B_ % 4 == 0 so the maskless Wt=4 grouping engages
    q, k, v = (
        jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32) * 0.3)
        for _ in range(3)
    )
    bias = jnp.asarray(rng.standard_normal((H, N, N)).astype(np.float32) * 0.1)
    if use_mask:
        mask_np = np.zeros((nW, N, N), np.float32)
        mask_np[1, : N // 2, N // 2:] = -100.0
        mask_np[1, N // 2:, : N // 2] = -100.0
        mask = jnp.asarray(mask_np)
    else:
        mask = None
    scale = Dh ** -0.5

    def loss_kernel(q, k, v, bias):
        out = pallas_window_attention_nhc_train(
            q, k, v, num_heads=H, bias=bias, mask=mask, scale=scale
        )
        return jnp.sum(out * out)

    def loss_ref(q, k, v, bias):
        qh = q.reshape(B_, N, H, Dh).transpose(0, 2, 1, 3)
        kh = k.reshape(B_, N, H, Dh).transpose(0, 2, 1, 3)
        vh = v.reshape(B_, N, H, Dh).transpose(0, 2, 1, 3)
        out = scaled_window_attention(qh, kh, vh, scale, bias, mask,
                                      use_pallas=False)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return jnp.sum(out * out)

    lk, gk = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    np.testing.assert_allclose(float(lk), float(lr), rtol=1e-5)
    for a, b, name in zip(gk, gr, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4,
            err_msg=name,
        )


def test_nhc_train_mxu_bf16_grads_close_to_f32(monkeypatch):
    """DEEPFAKE_TPU_TRAIN_MXU_BF16=1 (opt-in; measured neutral on the
    video_swin train step, see docs/sweeps/round5_train.jsonl): both kernel
    passes take native bf16 MXU inputs with f32 accumulation — the einsum
    training path's own dtype discipline. Gradients must stay within bf16
    rounding of the default f32-upcast kernel."""
    from deepfake_tpu.ops.pallas_window_attn import (
        pallas_window_attention_nhc_train,
    )

    rng = np.random.default_rng(17)
    B_, H, N, Dh = 4, 4, 128, 32
    C = H * Dh
    q, k, v = (
        jnp.asarray(rng.standard_normal((B_, N, C)) * 0.3, jnp.bfloat16)
        for _ in range(3)
    )
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.1, jnp.float32)

    def grads():
        def loss(q, k, v, bias):
            out = pallas_window_attention_nhc_train(
                q, k, v, num_heads=H, bias=bias, mask=None, scale=Dh ** -0.5
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)

    monkeypatch.setenv("DEEPFAKE_TPU_TRAIN_MXU_BF16", "1")
    lb, gb = grads()
    monkeypatch.setenv("DEEPFAKE_TPU_TRAIN_MXU_BF16", "0")
    lf, gf = grads()
    np.testing.assert_allclose(float(lb), float(lf), rtol=2e-2)
    for a, b, name in zip(gb, gf, ("dq", "dk", "dv", "dbias")):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        assert np.max(np.abs(a - b)) / scale < 0.06, name  # bf16 rounding
        assert np.mean(np.abs(a - b)) / scale < 0.01, name


def test_swin3d_block_train_kernel_matches_einsum_grads(monkeypatch):
    """One shifted SwinBlock3D in TRAIN mode: per-parameter gradients via the
    nhc_train kernel route == the einsum route (f32, interpret mode)."""
    monkeypatch.setenv("DEEPFAKE_TPU_PALLAS_INTERPRET", "1")
    from deepfake_tpu.models.swin3d import SwinBlock3D
    from deepfake_tpu.ops import pallas_window_attn as P

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 14, 14, 128)).astype(np.float32) * 0.2)

    def grads(use_pallas, profitable):
        monkeypatch.setattr(P, "nhc_is_profitable",
                            lambda *a, **k: profitable)
        blk = SwinBlock3D(dim=128, num_heads=4, window_size=(8, 7, 7),
                          shift_size=(4, 3, 3), drop_path=0.0,
                          use_pallas=use_pallas)
        variables = blk.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, False,
        )

        def loss(p):
            out = blk.apply({"params": p}, x, False,
                            rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.mean(out ** 2)

        return jax.grad(loss)(variables["params"])

    g_kernel = grads(True, True)
    g_ref = grads(False, False)
    flat_k = jax.tree_util.tree_leaves_with_path(g_kernel)
    flat_r = dict(
        (jax.tree_util.keystr(kp), l)
        for kp, l in jax.tree_util.tree_leaves_with_path(g_ref)
    )
    assert flat_k
    for kp, leaf in flat_k:
        name = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[name]), atol=5e-4, rtol=5e-4,
            err_msg=name,
        )


def test_nhc_packed_small_window_matches_einsum():
    """Token-major packed-window kernel (2D small windows, cosine): output
    matches the einsum cosine path at <=1e-5 in f32 (interpret mode)."""
    from deepfake_tpu.ops.pallas_window_attn import (
        pallas_window_attention_nhc_packed,
    )
    from deepfake_tpu.ops.window_attn import cosine_window_attention

    rng = np.random.default_rng(5)
    B, nW, H, N, Dh = 2, 4, 4, 49, 32
    C = H * Dh
    B_ = B * nW
    q, k, v = (
        jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32) * 0.4)
        for _ in range(3)
    )
    bias = jnp.asarray(rng.standard_normal((H, N, N)).astype(np.float32))
    mask_np = np.zeros((nW, N, N), np.float32)
    mask_np[2, :20, 20:] = -100.0
    mask_np[2, 20:, :20] = -100.0
    mask_np[3, :7, 7:] = -100.0
    mask_np[3, 7:, :7] = -100.0
    mask = jnp.asarray(mask_np)
    logit_scale = jnp.asarray(
        np.exp(rng.standard_normal((H, 1, 1)).astype(np.float32) * 0.3)
    )

    got = pallas_window_attention_nhc_packed(
        q, k, v, num_heads=H, bias=bias, mask=mask, cosine=True,
        logit_scale=logit_scale,
    )

    qh = q.reshape(B_, N, H, Dh).transpose(0, 2, 1, 3)
    kh = k.reshape(B_, N, H, Dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B_, N, H, Dh).transpose(0, 2, 1, 3)
    want = cosine_window_attention(qh, kh, vh, logit_scale, bias, mask,
                                   use_pallas=False)
    want = want.transpose(0, 2, 1, 3).reshape(B_, N, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_swin2d_packed_nhc_model_route_matches_default(monkeypatch):
    """SwinV2 model with the packed-NHC route on == default einsum route
    (small model, f32, interpret mode)."""
    monkeypatch.setenv("DEEPFAKE_TPU_PALLAS_INTERPRET", "1")
    from deepfake_tpu.models.swin2d import SwinTransformerV2

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 56, 56, 3)).astype(np.float32))

    def run(use_pallas):
        m = SwinTransformerV2(
            img_size=56, num_classes=1, embed_dim=32, depths=(2, 2),
            num_heads=(4, 8), window_size=7, use_pallas=use_pallas,
        )
        variables = m.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, True,
        )
        return np.asarray(
            m.apply(variables, x, deterministic=True)
        )

    np.testing.assert_allclose(run(True), run(False), atol=1e-5)


def test_nhc_qkv_fused_mxu_bf16_close_to_f32(monkeypatch):
    """DEEPFAKE_TPU_QKV_MXU_BF16=1: attention dots take native bf16 MXU
    inputs (f32 accumulation). Output must stay within bf16 rounding of the
    f32-dot kernel path."""
    monkeypatch.setenv("DEEPFAKE_TPU_QKV_MXU_BF16", "1")
    from deepfake_tpu.ops.pallas_window_attn import (
        pallas_window_attention_nhc_qkv,
    )

    B_, H, N, D = 4, 4, 392, 32
    C = H * D
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((B_, N, C)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((3 * C,)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.1, jnp.float32)

    got_bf16, _ = pallas_window_attention_nhc_qkv(
        x, w, b, num_heads=H, bias=bias, mask=None, scale=D ** -0.5
    )
    monkeypatch.setenv("DEEPFAKE_TPU_QKV_MXU_BF16", "0")
    got_f32, _ = pallas_window_attention_nhc_qkv(
        x, w, b, num_heads=H, bias=bias, mask=None, scale=D ** -0.5
    )
    a = np.asarray(got_bf16, np.float32)
    c = np.asarray(got_f32, np.float32)
    assert np.max(np.abs(a - c)) < 0.05  # bf16 rounding scale
    assert np.mean(np.abs(a - c)) < 0.005


def test_swin3d_window_resident_stage_matches_spatial(monkeypatch):
    """The window-resident stage (tokens stay partitioned; composed-gather
    re-windowing between blocks) must match the spatial per-block
    partition/reverse path exactly — it is a pure relayout change. Exercises
    a shifted stage (14x14: real masks + composed shift permutation) and a
    clamped stage (7x7: ss clamps to zero, identity permutation)."""
    import deepfake_tpu.models.swin3d as swin3d
    from deepfake_tpu.models.swin3d import SwinTransformer3D

    monkeypatch.setenv("DEEPFAKE_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("DEEPFAKE_TPU_FORCE_WINDOW_RESIDENT", "1")
    # exercise the big-activation paths (gather partition, shift gathers)
    # on test-sized tensors
    monkeypatch.setattr(swin3d, "GATHER_MIN_ELEMENTS", 0)
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((2, 16, 56, 56, 3)), jnp.float32)
    kw = dict(patch_size=(2, 4, 4), embed_dim=32, depths=(2, 2),
              num_heads=(2, 4), window_size=(8, 7, 7), drop_path_rate=0.0,
              patch_norm=True)
    m = SwinTransformer3D(use_pallas=True, **kw)
    v = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(v, x, deterministic=True)
    monkeypatch.setenv("DEEPFAKE_TPU_NO_WINDOW_RESIDENT", "1")
    want = m.apply(v, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_swin3d_window_resident_training_grads_match_spatial(monkeypatch):
    """TRAIN-mode window-resident stage: per-parameter gradients equal the
    spatial partition/reverse path's (pure relayout; all stochastic rates 0
    so rng draw order is irrelevant). Exercises the custom_vjp permutation
    adjoints end to end through a shifted stage."""
    import deepfake_tpu.models.swin3d as swin3d
    from deepfake_tpu.models.swin3d import SwinTransformer3D

    monkeypatch.setenv("DEEPFAKE_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("DEEPFAKE_TPU_FORCE_WINDOW_RESIDENT", "1")
    monkeypatch.setattr(swin3d, "GATHER_MIN_ELEMENTS", 0)
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.standard_normal((1, 16, 28, 28, 3)), jnp.float32)
    kw = dict(patch_size=(2, 4, 4), embed_dim=32, depths=(2, 2),
              num_heads=(2, 4), window_size=(8, 7, 7), drop_path_rate=0.0,
              patch_norm=True)
    m = SwinTransformer3D(use_pallas=True, **kw)
    variables = m.init(jax.random.PRNGKey(0), x)

    def grads():
        def loss(p):
            out = m.apply({"params": p}, x, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.mean(out ** 2)

        return jax.grad(loss)(variables["params"])

    g_res = grads()
    monkeypatch.setenv("DEEPFAKE_TPU_NO_WINDOW_RESIDENT", "1")
    monkeypatch.setenv("DEEPFAKE_TPU_NO_SHIFT_GATHER", "1")
    g_sp = grads()
    flat_res = jax.tree_util.tree_leaves_with_path(g_res)
    flat_sp = dict(
        (jax.tree_util.keystr(kp), l)
        for kp, l in jax.tree_util.tree_leaves_with_path(g_sp)
    )
    assert flat_res
    for kp, leaf in flat_res:
        name = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_sp[name]), atol=5e-5, rtol=5e-5,
            err_msg=name,
        )


def test_resident_drop_path_masks_whole_samples():
    """_drop_path_tokens on [B*nW, N, C] rows must drop/keep ALL windows of
    one original sample together (per-sample stochastic depth), never
    individual windows."""
    from flax import linen as nn

    from deepfake_tpu.models.swin3d import SwinBlock3D

    D, H, W, ws = 2, 14, 14, (2, 7, 7)
    nW = (D // ws[0]) * (H // ws[1]) * (W // ws[2])  # 4
    B, N, C = 16, ws[0] * ws[1] * ws[2], 8
    blk = SwinBlock3D(dim=C, num_heads=2, window_size=ws,
                      shift_size=(0, 0, 0), drop_path=0.5,
                      window_resident=True, spatial_dims=(D, H, W))
    y = jnp.ones((B * nW, N, C), jnp.float32)
    out = nn.apply(
        lambda m, t: m._drop_path_tokens(t, False), blk
    )({}, y, rngs={"dropout": jax.random.PRNGKey(7)})
    out = np.asarray(out).reshape(B, nW * N * C)
    per_sample = {tuple(np.unique(row)) for row in out}
    # each sample row is uniformly 0 (dropped) or 1/keep == 2.0 (kept)
    assert per_sample <= {(0.0,), (2.0,)}
    assert (0.0,) in per_sample and (2.0,) in per_sample


def test_swin2d_block_train_kernel_matches_einsum_grads(monkeypatch):
    """One shifted 2D SwinBlock in TRAIN mode via the gated cosine->nhc_train
    route (DEEPFAKE_TPU_2D_TRAIN_KERNEL=1): per-parameter gradients — incl.
    the learnable logit_scale (folded into q outside the kernel) and the CPB
    MLP (through the kernel's dbias) — match the einsum route (f32,
    interpret mode)."""
    monkeypatch.setenv("DEEPFAKE_TPU_PALLAS_INTERPRET", "1")
    from deepfake_tpu.models.swin2d import SwinBlock

    rng = np.random.default_rng(9)
    # res 14, window 7 -> nW=4; shifted block exercises the mask path
    x = jnp.asarray(rng.standard_normal((2, 14 * 14, 64)).astype(np.float32) * 0.2)

    def grads(kernel):
        if kernel:
            monkeypatch.setenv("DEEPFAKE_TPU_2D_TRAIN_KERNEL", "1")
        else:
            monkeypatch.delenv("DEEPFAKE_TPU_2D_TRAIN_KERNEL", raising=False)
        blk = SwinBlock(dim=64, input_resolution=(14, 14), num_heads=4,
                        window_size=7, shift_size=3, drop_path=0.0,
                        use_pallas=kernel)
        variables = blk.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, False,
        )

        def loss(p):
            out = blk.apply({"params": p}, x, False,
                            rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.mean(out ** 2)

        return jax.grad(loss)(variables["params"])

    g_kernel = grads(True)
    g_ref = grads(False)
    flat_k = jax.tree_util.tree_leaves_with_path(g_kernel)
    flat_r = dict(
        (jax.tree_util.keystr(kp), l)
        for kp, l in jax.tree_util.tree_leaves_with_path(g_ref)
    )
    assert flat_k
    for kp, leaf in flat_k:
        name = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[name]), atol=5e-4, rtol=5e-4,
            err_msg=name,
        )
