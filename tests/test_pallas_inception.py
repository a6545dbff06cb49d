"""Fused Inception-ResNet block kernels (ops/pallas_inception.py) vs the XLA
path, in interpret mode on CPU; the same code compiles on TPU (hardware A/B in
BASELINE_MEASURED.md). Covers: identical parameter trees (checkpoints and
torch importers work unchanged on either path), identical init RNG streams,
and numerical parity of blocks A/B/C including the no-activation C variant
and non-224 input sizes (odd spatial sides exercise the frame-row padding)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as tu

from deepfake_tpu.models.inception_resnet_v2 import (
    BlockA, BlockB, BlockC, InceptionResNetV2,
)


def _perturb(v, rng):
    return tu.tree_map(
        lambda l: l * (1 + 0.01 * jnp.asarray(rng.standard_normal(l.shape), jnp.float32))
        + 0.01 * jnp.asarray(rng.standard_normal(l.shape), jnp.float32), v)


@pytest.mark.parametrize(
    "cls,C,S,kw",
    [
        (BlockB, 1088, 12, {}),
        (BlockB, 1088, 4, {}),  # 96px trunk size; 16 rows/frame
        (BlockC, 2080, 5, {}),  # 25 rows/frame -> padded to 32
        (BlockC, 2080, 5, dict(activation=False, scale=1.0)),  # c_9 variant
        (BlockA, 320, 25, {}),  # 625 rows/frame -> padded to 632
        (BlockA, 320, 9, {}),
    ],
)
def test_block_parity_and_tree(cls, C, S, kw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, S, S, C)).astype(np.float32) * 0.5)
    m_x = cls(use_pallas=False, **kw)
    m_p = cls(use_pallas=True, **kw)
    v = m_x.init(jax.random.PRNGKey(0), x)
    v2 = m_p.init(jax.random.PRNGKey(0), x)
    # identical tree AND identical init values (same param RNG stream)
    paths = lambda t: {
        tuple(str(k) for k in kp): l.shape
        for kp, l in tu.tree_flatten_with_path(t)[0]
    }
    assert paths(v) == paths(v2)
    for a, b in zip(tu.tree_leaves(v), tu.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    v = _perturb(v, rng)
    a, b = m_x.apply(v, x), m_p.apply(v, x)
    rel = jnp.max(jnp.abs(a - b) / jnp.maximum(jnp.abs(a), 1.0))
    assert float(rel) < 1e-5


def test_block_pallas_falls_back_in_train_mode():
    """train=True must use the XLA path (live BatchNorm stats) — mutable
    batch_stats only update there."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 1088)).astype(np.float32))
    m = BlockB(use_pallas=True)
    v = m.init(jax.random.PRNGKey(0), x)
    out, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            tu.tree_leaves(v["batch_stats"]), tu.tree_leaves(mut["batch_stats"])
        )
    )
    assert changed


def test_trunk_parity_96px():
    """Full IRv2 trunk at the test frame size: pallas and XLA paths agree and
    share one parameter tree."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 96, 96, 3)).astype(np.float32) * 0.5)
    m0 = InceptionResNetV2(use_pallas=False)
    m1 = InceptionResNetV2(use_pallas=True)
    v = m0.init(jax.random.PRNGKey(0), x)
    a = m0.apply(v, x)
    b = m1.apply(v, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
