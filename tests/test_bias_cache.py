"""Weight-load-time relative-position-bias cache (round 4).

The expanded [H, N, N] window-attention bias is a pure function of params
(swin2d CPB MLP+gather+sigmoid, swin3d table gather); the round-4 config-2
trace measured the per-forward table gathers at 2.5 ms of the 5.5 ms b1
forward. registry.precompute_bias_cache collects every block's bias into the
"bias_cache" collection once; these tests pin that the cached forward is
numerically the uncached forward, that a geometry change falls back to
recomputation (shape guard), and that training paths never read the cache.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_tpu.config import Config
from deepfake_tpu.models.registry import (
    build_model, example_inputs, precompute_bias_cache,
)


def _audio_cfg():
    cfg = Config()
    cfg.data.modality = "audio"
    cfg.data.audio_size = 56
    cfg.model.swin2d_embed_dim = 16
    cfg.model.swin2d_depths = (2, 2)
    cfg.model.swin2d_heads = (2, 4)
    cfg.parallel.compute_dtype = "float32"
    return cfg


def _video_cfg():
    cfg = Config()
    cfg.data.modality = "video_swin"
    cfg.data.num_frames = 4
    cfg.data.frame_size = 56
    cfg.model.swin3d_embed_dim = 24
    cfg.model.swin3d_depths = (2, 2)
    cfg.model.swin3d_heads = (2, 4)
    cfg.parallel.compute_dtype = "float32"
    return cfg


def _init(model, inputs):
    init_fn = jax.jit(functools.partial(model.init, deterministic=True))
    return init_fn(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *inputs,
    )


@pytest.mark.parametrize("cfg_fn", [_audio_cfg, _video_cfg],
                         ids=["swin2d", "swin3d"])
def test_cached_forward_matches_uncached(cfg_fn):
    cfg = cfg_fn()
    model = build_model(cfg)
    (ex,) = example_inputs(cfg, batch=2)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(ex.shape), jnp.float32)
    variables = _init(model, (x,))
    assert "bias_cache" not in variables  # init never bakes a cache

    cached = precompute_bias_cache(model, variables, x, cfg=cfg)
    assert "bias_cache" in cached and jax.tree_util.tree_leaves(
        cached["bias_cache"])

    def out_of(v):
        out = model.apply(v, x, deterministic=True)
        return out[0] if isinstance(out, tuple) else out

    want = np.asarray(out_of(variables))
    got = np.asarray(out_of(cached))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_shape_guard_recomputes_on_new_geometry():
    """A cache built for one clip geometry must not poison a forward at a
    different geometry (different window clamp => different N): the modules
    shape-guard and recompute."""
    cfg = _video_cfg()
    model = build_model(cfg)
    (ex,) = example_inputs(cfg, batch=1)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(ex.shape), jnp.float32)
    variables = _init(model, (x,))
    cached = precompute_bias_cache(model, variables, x, cfg=cfg)

    # longer clip: more frames -> different depth-window clamp at stage 0
    x2 = jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (1, 8, 56, 56, 3)), jnp.float32)

    def out_of(v):
        out = model.apply(v, x2, deterministic=True)
        return out[0] if isinstance(out, tuple) else out

    np.testing.assert_allclose(
        np.asarray(out_of(cached)), np.asarray(out_of(variables)),
        rtol=1e-6, atol=1e-6)


def test_training_forward_ignores_cache():
    """deterministic=False never reads the cache (params move every step; a
    stale bias would silently skew training)."""
    cfg = _audio_cfg()
    model = build_model(cfg)
    (ex,) = example_inputs(cfg, batch=2)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal(ex.shape), jnp.float32)
    variables = _init(model, (x,))
    cached = precompute_bias_cache(model, variables, x, cfg=cfg)
    # poison the cache: if the training forward read it, outputs would move
    poisoned = dict(cached)
    poisoned["bias_cache"] = jax.tree.map(
        lambda b: b + 100.0, cached["bias_cache"])

    def out_of(v):
        return model.apply(
            v, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(7)})

    np.testing.assert_allclose(
        np.asarray(out_of(poisoned)), np.asarray(out_of(variables)),
        rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("cfg_fn", [_audio_cfg, _video_cfg],
                         ids=["swin2d", "swin3d"])
def test_recompute_after_param_change(cfg_fn):
    """Reload-path regression (ADVICE r4 high): precompute on variables that
    already carry a bias_cache must rebuild it from the CURRENT params.
    SubmitCtl's loaders dict-copy self.variables (which __init__ baked a
    cache into from random init), splice in checkpoint params, and
    re-precompute — a stale-cache passthrough would serve biases from the
    random init after loading real weights."""
    cfg = cfg_fn()
    model = build_model(cfg)
    (ex,) = example_inputs(cfg, batch=1)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal(ex.shape), jnp.float32)
    variables = _init(model, (x,))
    cached = precompute_bias_cache(model, variables, x, cfg=cfg)

    # simulate a checkpoint load: new params spliced under the old cache
    reloaded = dict(cached)
    reloaded["params"] = jax.tree.map(lambda p: p + 0.05, cached["params"])
    recached = precompute_bias_cache(model, reloaded, x, cfg=cfg)

    # the cache must have moved with the params...
    old = jax.tree_util.tree_leaves(cached["bias_cache"])
    new = jax.tree_util.tree_leaves(recached["bias_cache"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(old, new))
    # ...and must equal a from-scratch precompute on the new params
    fresh_vars = {k: v for k, v in reloaded.items() if k != "bias_cache"}
    fresh = precompute_bias_cache(model, fresh_vars, x, cfg=cfg)
    for a, b in zip(new, jax.tree_util.tree_leaves(fresh["bias_cache"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_knob_disables_cache():
    cfg = _audio_cfg()
    cfg.parallel.infer_bias_cache = False
    model = build_model(cfg)
    (ex,) = example_inputs(cfg, batch=1)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal(ex.shape), jnp.float32)
    variables = _init(model, (x,))
    out = precompute_bias_cache(model, variables, x, cfg=cfg)
    assert "bias_cache" not in out
