"""Activation checkpointing (remat) must not change values or gradients."""

import numpy as np

import jax
import jax.numpy as jnp

from deepfake_tpu.models.swin2d import SwinTransformerV2
from deepfake_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model


def test_swin2d_remat_value_and_grad_parity():
    kw = dict(img_size=56, num_classes=1, embed_dim=16, depths=(2,), num_heads=(2,),
              drop_path_rate=0.0)
    m0 = SwinTransformerV2(**kw, remat=False)
    m1 = SwinTransformerV2(**kw, remat=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 56, 56, 3)),
                    jnp.float32)
    params = m0.init(jax.random.PRNGKey(0), x)["params"]

    def loss(m):
        return lambda p: jnp.sum(m.apply({"params": p}, x, return_logits=True))

    v0, g0 = jax.value_and_grad(loss(m0))(params)
    v1, g1 = jax.value_and_grad(loss(m1))(params)
    assert np.allclose(float(v0), float(v1), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stage_policy_resolution():
    from deepfake_tpu.models.layers import stage_policy

    # comma-free: applies unchanged everywhere
    assert stage_policy(True, "dots", 3) == (True, "dots")
    assert stage_policy(False, "dots", 0) == (False, "dots")
    # per-stage: indexed, 'off' disables, short specs extend with the last
    spec = "dots,dots,off,"
    assert stage_policy(True, spec, 0) == (True, "dots")
    assert stage_policy(True, spec, 2) == (False, "")
    assert stage_policy(True, spec, 3) == (True, "")
    assert stage_policy(True, "dots,off", 5) == (False, "")


def test_swin2d_per_stage_remat_value_and_grad_parity():
    """A mixed per-stage spec ('dots,off') must be numerically invisible."""
    kw = dict(img_size=32, num_classes=1, embed_dim=16, depths=(2, 2),
              num_heads=(2, 2), window_size=4, drop_path_rate=0.0)
    m0 = SwinTransformerV2(**kw, remat=False)
    m1 = SwinTransformerV2(**kw, remat=True, remat_policy="dots,off")
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    params = m0.init(jax.random.PRNGKey(0), x)["params"]

    def loss(m):
        return lambda p: jnp.sum(m.apply({"params": p}, x, return_logits=True))

    v0, g0 = jax.value_and_grad(loss(m0))(params)
    v1, g1 = jax.value_and_grad(loss(m1))(params)
    assert np.allclose(float(v0), float(v1), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_wav2vec2_remat_parity():
    cfg = dict(conv_dim=(8,) * 7, hidden_size=32, num_hidden_layers=2,
               num_attention_heads=2, intermediate_size=64,
               num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)
    m0 = Wav2Vec2Model(Wav2Vec2Config(**cfg, remat=False))
    m1 = Wav2Vec2Model(Wav2Vec2Config(**cfg, remat=True))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4000)), jnp.float32)
    params = m0.init(jax.random.PRNGKey(0), x, deterministic=True)["params"]
    o0 = m0.apply({"params": params}, x, deterministic=True)
    o1 = m1.apply({"params": params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-6)
