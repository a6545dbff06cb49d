"""Golden tests: SwinTransformerV2 (2D audio branch) vs the reference
implementation imported directly from /root/reference
(src/models/swin_transformer2d.py), weights copied via import_swin2d.

A small config (embed 32, depths [2,2], 56x56 input) exercises every
architectural feature — cosine attention, cpb MLP, shifted windows + mask,
patch merging, res-post-norm — while keeping the 1-CPU test box fast. A
full-size Swin-B smoke test runs a single downsampled forward.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from deepfake_tpu.io.torch_import import import_swin2d
from deepfake_tpu.models.swin2d import SwinTransformerV2
from tests import ref_loader

torch = pytest.importorskip("torch")


def _build_pair(img=56, embed=32, depths=(2, 2), heads=(2, 4), window=7,
                pretrained=(16, 16), num_classes=1, use_feat=False):
    ref_mod = ref_loader.load("src.models.swin_transformer2d")
    torch.manual_seed(0)
    ref = ref_mod.SwinTransformerV2(
        img_size=img, num_classes=num_classes, embed_dim=embed,
        depths=list(depths), num_heads=list(heads), window_size=window,
        pretrained_window_sizes=list(pretrained), use_feat=use_feat,
        drop_path_rate=0.0,
    ).eval()
    # zero-init respostnorm makes outputs trivially input-independent; give the
    # norms real weights so the test is meaningful
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.LayerNorm):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)

    ours = SwinTransformerV2(
        img_size=img, num_classes=num_classes, embed_dim=embed,
        depths=depths, num_heads=heads, window_size=window,
        pretrained_window_sizes=pretrained, use_feat=use_feat,
        drop_path_rate=0.0,
    )
    params = import_swin2d(ref.state_dict(), depths=depths)
    return ref, ours, params


def test_small_parity_classifier():
    ref, ours, params = _build_pair()
    x = np.random.default_rng(0).standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_small_parity_feature_mode():
    ref, ours, params = _build_pair(use_feat=True)
    x = np.random.default_rng(1).standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))))
    # raw features carry larger magnitudes than sigmoid outputs; 1e-3 is the
    # parity target (BASELINE.md)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)


def test_pallas_kernel_matches_xla():
    """Pallas windowed-attention kernel (interpret mode on CPU) == XLA path."""
    _, ours, params = _build_pair(use_feat=True)
    ours_pl = SwinTransformerV2(
        img_size=56, num_classes=1, embed_dim=32, depths=(2, 2), num_heads=(2, 4),
        window_size=7, pretrained_window_sizes=(16, 16), use_feat=True,
        drop_path_rate=0.0, use_pallas=True,
    )
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 56, 56, 3)).astype(np.float32)
    )
    a = np.asarray(ours.apply({"params": params}, x))
    b = np.asarray(ours_pl.apply({"params": params}, x))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_swinb_fullsize_parity():
    """Swin-B at 224 (the reference's audio branch config, train.py:35)."""
    ref, ours, params = _build_pair(
        img=224, embed=128, depths=(2, 2, 18, 2), heads=(4, 8, 16, 32),
        pretrained=(16, 16, 16, 16),
    )
    x = np.random.default_rng(3).standard_normal((1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_bf16_close_to_f32():
    """bf16 compute (the bench/serving dtype) tracks f32 within bf16 noise."""
    import jax

    kw = dict(img_size=56, num_classes=1, embed_dim=32, depths=(2, 2),
              num_heads=(2, 4), window_size=7, drop_path_rate=0.0)
    m32 = SwinTransformerV2(**kw, dtype=jnp.float32)
    m16 = SwinTransformerV2(**kw, dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 56, 56, 3)), jnp.float32
    )
    params = m32.init(jax.random.PRNGKey(0), x)["params"]
    a = np.asarray(m32.apply({"params": params}, x), np.float32)
    b = np.asarray(m16.apply({"params": params}, x), np.float32)
    assert np.max(np.abs(a - b)) < 0.05  # sigmoid outputs; bf16 mantissa ~3 dp


def test_window_resident_2d_matches_plain(monkeypatch):
    """The 2D window-resident stage path (composed permutation gathers,
    forced open past the size gate) is bit-identical to the spatial
    reshape/roll path, in eval and in training (same dropout rng stream,
    per-sample DropPath semantics in the windowed layout)."""
    import jax

    from deepfake_tpu.models.swin2d import SwinTransformerV2

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 112, 112, 3)).astype(np.float32)
    kw = dict(img_size=112, embed_dim=16, depths=(2, 2, 2),
              num_heads=(2, 2, 2), window_size=7, num_classes=1)
    monkeypatch.setenv("DEEPFAKE_TPU_FORCE_WINDOW_RESIDENT", "1")
    m = SwinTransformerV2(drop_path_rate=0.3, **kw)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, jnp.asarray(x))
    r = {"dropout": jax.random.PRNGKey(7)}
    p_eval = m.apply(v, jnp.asarray(x), deterministic=True)
    p_train = m.apply(v, jnp.asarray(x), deterministic=False, rngs=r)
    monkeypatch.setenv("DEEPFAKE_TPU_NO_WINDOW_RESIDENT", "1")
    q_eval = m.apply(v, jnp.asarray(x), deterministic=True)
    q_train = m.apply(v, jnp.asarray(x), deterministic=False, rngs=r)
    np.testing.assert_array_equal(np.asarray(p_eval), np.asarray(q_eval))
    np.testing.assert_array_equal(np.asarray(p_train), np.asarray(q_train))
