"""Golden tests: Video Swin Transformer 3D vs the reference
(src/models/video_swin_transformer.py), weights copied via import_swin3d.

The reference file never imports its Mlp (latent NameError — the module is
dead at the entry point, train.py:8-9); tests inject the SwinV2 file's
identical Mlp so the reference can be instantiated for comparison.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from deepfake_tpu.io.torch_import import import_swin3d, inflate_swin2d_to_3d
from deepfake_tpu.models.swin3d import SwinTransformer3D, VideoClassifier
from tests import ref_loader

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_vst():
    swin2d = ref_loader.load("src.models.swin_transformer2d")
    vst = ref_loader.load("src.models.video_swin_transformer")
    vst.Mlp = swin2d.Mlp  # reference bug: Mlp never imported in this file
    return vst


def _small_pair(ref_vst, window=(2, 7, 7), depths=(2, 2), heads=(2, 4), embed=32):
    torch.manual_seed(0)
    ref = ref_vst.SwinTransformer3D(
        patch_size=(2, 4, 4), embed_dim=embed, depths=list(depths),
        num_heads=list(heads), window_size=window, drop_path_rate=0.0,
        patch_norm=True,
    )
    # reference bug: its train() override returns None, so .eval() returns None
    ref.eval()
    ours = SwinTransformer3D(
        patch_size=(2, 4, 4), embed_dim=embed, depths=depths, num_heads=heads,
        window_size=window, drop_path_rate=0.0, patch_norm=True,
    )
    params = import_swin3d(ref.state_dict(), depths=depths)
    return ref, ours, params


def test_swin3d_backbone_parity(ref_vst):
    ref, ours, params = _small_pair(ref_vst)
    # 8 frames x 56x56 -> D=4, 14x14 after patch embed; window (2,7,7) exercises
    # both the temporal axis and shifted windows with masks
    x = np.random.default_rng(0).standard_normal((2, 3, 8, 56, 56)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # [B, C, D, H, W]
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    )  # [B, D, H, W, C]
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), want, atol=1e-3, rtol=1e-2)


def test_swin3d_window_clamp_and_padding(ref_vst):
    """Dims smaller than the window trigger per-dim clamping; odd spatial dims
    trigger padding (reference: :75-88, :224-229)."""
    ref, ours, params = _small_pair(ref_vst, window=(8, 7, 7))
    x = np.random.default_rng(1).standard_normal((1, 3, 4, 36, 36)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    )
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), want, atol=1e-3, rtol=1e-2)


def test_video_classifier_mean_pool():
    """Head math: mean pooling + Mlp + sigmoid (reference: :688-731,789-793)."""
    import jax

    model = VideoClassifier(
        num_classes=1, embed_dim=32, depths=(2, 2), num_heads=(2, 4),
        window_size=(2, 7, 7), drop_path_rate=0.0, classify_drop=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 8, 56, 56, 3)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    prob, feat = model.apply({"params": params}, x)
    assert prob.shape == (2,)
    assert feat.shape == (2, 4, 64)  # [B, D', num_features]
    assert np.all((np.asarray(prob) >= 0) & (np.asarray(prob) <= 1))


def test_inflate_2d_to_3d(ref_vst):
    """2D->3D inflation semantics (reference: :566-632): depth-repeated patch
    embed divided by depth; bias tables tiled 2*wd-1 times."""
    swin2d = ref_loader.load("src.models.swin_transformer2d")
    torch.manual_seed(3)
    # a 2D swin with heads matching the 3D target stage-wise
    ref2d = swin2d.SwinTransformerV2(
        img_size=56, embed_dim=32, depths=[2, 2], num_heads=[2, 4], window_size=7,
        num_classes=1,
    )
    sd2d = {f"backbone.{k}": v for k, v in ref2d.state_dict().items()}
    inflated = inflate_swin2d_to_3d(sd2d, depths=(2, 2), patch_depth=2, window=(2, 7, 7))

    w2 = ref2d.state_dict()["patch_embed.proj.weight"].numpy()
    w3 = inflated["patch_embed.proj.weight"]
    assert w3.shape == (32, 3, 2, 4, 4)
    np.testing.assert_allclose(w3.sum(axis=2), w2, rtol=1e-6)

    # tables tiled over (2*wd-1): SwinV2 has no v1-style bias table, so the
    # inflation of tables is exercised via a fabricated one
    fake = {"backbone.patch_embed.proj.weight": w2,
            "backbone.layers.0.blocks.0.attn.relative_position_bias_table":
                np.random.randn(13 * 13, 2).astype(np.float32)}
    out = inflate_swin2d_to_3d(fake, depths=(2,), patch_depth=2, window=(2, 7, 7))
    t = out["layers.0.blocks.0.attn.relative_position_bias_table"]
    assert t.shape == (3 * 13 * 13, 2)
    np.testing.assert_allclose(t[: 13 * 13], t[13 * 13: 2 * 13 * 13])


def test_token_permute_custom_vjp_matches_take_autodiff():
    """_token_permute_fn's backward is the inverse gather (a permutation's
    exact adjoint) — forward and grads must match jnp.take's autodiff
    (which emits a scatter-add) bit-for-bit."""
    import jax

    from deepfake_tpu.models.swin3d import (
        _inverse_indices, _token_permute_fn, composed_shift_indices,
        shift_partition_indices,
    )

    rng = np.random.default_rng(3)
    D, H, W, ws, ss = 4, 14, 14, (2, 7, 7), (1, 3, 3)
    x = jnp.asarray(rng.standard_normal((2, D * H * W, 8)), jnp.float32)
    cases = [
        (("shift", D, H, W, ws, ss), shift_partition_indices(D, H, W, ws, ss)),
        (("inv", D, H, W, ws, ss), _inverse_indices(D, H, W, ws, ss)),
        (("composed", D, H, W, ws, (0, 0, 0), ss),
         composed_shift_indices(D, H, W, ws, (0, 0, 0), ss)),
        (("composed", D, H, W, ws, ss, (0, 0, 0)),
         composed_shift_indices(D, H, W, ws, ss, (0, 0, 0))),
    ]
    for key, idx in cases:
        perm = _token_permute_fn(key)
        ref = lambda t: jnp.take(t, jnp.asarray(idx), axis=1)
        np.testing.assert_array_equal(np.asarray(perm(x)), np.asarray(ref(x)))
        g1 = jax.grad(lambda t: jnp.sum(jnp.sin(perm(t))))(x)
        g2 = jax.grad(lambda t: jnp.sum(jnp.sin(ref(t))))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_channel_folded_feed_matches_nthwc():
    """The channel-folded [B,T,H,W*3] feed (dense TPU lanes; PatchEmbed3D
    fast path) must be bit-identical to the NTHWC path — the space-to-depth
    peel from the folded axis reproduces the [pd,ph,pw,C] feature order the
    patchify GEMM kernel flattens."""
    import jax

    from deepfake_tpu.models.swin3d import VideoClassifier

    rng = np.random.default_rng(5)
    x5 = rng.standard_normal((2, 8, 56, 56, 3)).astype(np.float32)
    m = VideoClassifier(embed_dim=32, depths=(2, 2), num_heads=(2, 4),
                        window_size=(8, 7, 7), drop_path_rate=0.0)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x5))
    p5, f5 = m.apply(v, jnp.asarray(x5), deterministic=True)
    pf, ff = m.apply(
        v, jnp.asarray(x5.reshape(2, 8, 56, 56 * 3)), deterministic=True
    )
    np.testing.assert_array_equal(np.asarray(p5), np.asarray(pf))
    np.testing.assert_array_equal(np.asarray(f5), np.asarray(ff))


def test_preprocess_fold_matches_unfolded():
    """preprocess_clip_batch fold=True output == the 5D output reshaped, for
    train (augmented) and eval; the folded-input eval path matches too."""
    import jax as _jax

    from deepfake_tpu.ops.image import preprocess_clip_batch

    rng = np.random.default_rng(6)
    u8 = rng.integers(0, 256, (2, 3, 16, 16, 3), dtype=np.uint8)
    key = _jax.random.PRNGKey(4)
    for train in (False, True):
        a = preprocess_clip_batch(key, jnp.asarray(u8), train=train)
        b = preprocess_clip_batch(key, jnp.asarray(u8), train=train, fold=True)
        np.testing.assert_array_equal(
            np.asarray(a).reshape(2, 3, 16, 48), np.asarray(b))
    c = preprocess_clip_batch(
        key, jnp.asarray(u8.reshape(2, 3, 16, 48)), train=False)
    np.testing.assert_allclose(
        np.asarray(c),
        np.asarray(preprocess_clip_batch(key, jnp.asarray(u8))).reshape(
            2, 3, 16, 48),
        rtol=1e-6, atol=1e-6)


def test_bias_expand_factorized_adjoint_matches_scatter():
    """_bias_expand_fn's banded-contraction backward == jnp.take autodiff
    (scatter-add) — forward identical, table grads allclose. Covers the
    unclamped window, a D-clamped window (factorised prefix), an H-clamped
    window (fallback path), and both gather layouts (lane-major H>=8)."""
    import jax

    from deepfake_tpu.models.swin3d import (
        _bias_expand_fn, relative_position_index_3d,
    )

    rng = np.random.default_rng(9)
    cases = [
        ((2, 7, 7), (2, 7, 7), 4),    # unclamped, small H (row-gather)
        ((8, 7, 7), (4, 7, 7), 16),   # D-clamped prefix, lane-major
        ((2, 7, 7), (2, 5, 7), 4),    # H-clamped -> fallback autodiff
    ]
    for table_window, ws, H in cases:
        N = ws[0] * ws[1] * ws[2]
        n_table = (2 * table_window[0] - 1) * (2 * table_window[1] - 1) * (
            2 * table_window[2] - 1)
        table = jnp.asarray(
            rng.standard_normal((n_table, H)).astype(np.float32))
        expand = _bias_expand_fn(table_window, ws, N, H, lane_major=H >= 8)
        idx = jnp.asarray(
            relative_position_index_3d(table_window)[:N, :N].reshape(-1))
        ref = lambda t: t[idx].reshape(N, N, H).transpose(2, 0, 1)
        np.testing.assert_allclose(
            np.asarray(expand(table)), np.asarray(ref(table)), atol=1e-6)
        w = jnp.asarray(rng.standard_normal((H, N, N)).astype(np.float32))
        g1 = jax.grad(lambda t: jnp.sum(expand(t) * w))(table)
        g2 = jax.grad(lambda t: jnp.sum(ref(t) * w))(table)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), atol=2e-4, rtol=1e-5,
            err_msg=str((table_window, ws, H)))


def test_bias_expand_2d_adjoint_matches_scatter():
    """The 2D stack reuses _bias_expand_fn at wd=1 (swin2d.py CPB path):
    forward and table grads must match t[idx] autodiff for both head
    layouts."""
    import jax

    from deepfake_tpu.models.swin3d import _bias_expand_fn
    from deepfake_tpu.models.swin2d import relative_position_index

    rng = np.random.default_rng(13)
    for H in (4, 8):
        wh = ww = 7
        N = wh * ww
        t = jnp.asarray(
            rng.standard_normal(((2 * wh - 1) * (2 * ww - 1), H)).astype(
                np.float32))
        idx = jnp.asarray(relative_position_index((wh, ww)).reshape(-1))
        ref = lambda x: x[idx].reshape(N, N, H).transpose(2, 0, 1)
        expand = _bias_expand_fn((1, wh, ww), (1, wh, ww), N, H,
                                 lane_major=H >= 8)
        np.testing.assert_allclose(
            np.asarray(expand(t)), np.asarray(ref(t)), atol=1e-6)
        w = jnp.asarray(rng.standard_normal((H, N, N)).astype(np.float32))
        g1 = jax.grad(lambda x: jnp.sum(expand(x) * w))(t)
        g2 = jax.grad(lambda x: jnp.sum(ref(x) * w))(t)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=2e-4, rtol=1e-5)


def test_window_feed_matches_spatial(monkeypatch):
    """The pre-windowed host feed ([B,nd,nh,nw,N,Ct], window_feed_host) is a
    pure permutation of the pixels: the model output must be bit-identical
    to the spatial NTHWC feed on every path — the non-resident fallback
    (inverse gather) and the window-resident stage entry (which skips its
    partition gather; the feed order IS shift_partition_indices at ss=0)."""
    import jax

    import deepfake_tpu.models.swin3d as s3
    from deepfake_tpu.models.swin3d import (
        VideoClassifier, window_feed_host, window_feed_spec,
    )

    patch, window = (2, 2, 2), (2, 3, 3)
    rng = np.random.default_rng(7)
    clip = rng.standard_normal((2, 4, 12, 12, 3)).astype(np.float32)
    spec = window_feed_spec(patch, window, 4, 12, 12, 3)
    assert spec is not None and spec["N"] == 18 and spec["Ct"] == 24
    wf = window_feed_host(clip, patch, window)
    assert wf.shape == (2, 1, 2, 2, 18, 24)

    m = VideoClassifier(embed_dim=8, depths=(2, 2), num_heads=(2, 2),
                        patch_size=patch, window_size=window,
                        drop_path_rate=0.0, use_pallas=False)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(clip))
    p_sp, f_sp = m.apply(v, jnp.asarray(clip), deterministic=True)
    p_wf, f_wf = m.apply(v, jnp.asarray(wf), deterministic=True)
    np.testing.assert_array_equal(np.asarray(p_sp), np.asarray(p_wf))
    np.testing.assert_array_equal(np.asarray(f_sp), np.asarray(f_wf))

    # resident entry (interpret-mode kernels, gates forced open), incl. the
    # window-to-window fused patch merge (default-off; measured loss on hw)
    monkeypatch.setenv("DEEPFAKE_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("DEEPFAKE_TPU_FORCE_WINDOW_RESIDENT", "1")
    monkeypatch.setenv("DEEPFAKE_TPU_FUSED_MERGE", "1")
    monkeypatch.setattr(s3, "GATHER_MIN_ELEMENTS", 0)
    m2 = VideoClassifier(embed_dim=8, depths=(2, 2), num_heads=(2, 2),
                         patch_size=patch, window_size=window,
                         drop_path_rate=0.0, use_pallas=True)
    p_r, _ = m2.apply(v, jnp.asarray(wf), deterministic=True)
    p_rs, _ = m2.apply(v, jnp.asarray(clip), deterministic=True)
    np.testing.assert_array_equal(np.asarray(p_r), np.asarray(p_rs))

    # unsupported shapes decline: padding needed / clamped window
    assert window_feed_spec(patch, window, 5, 12, 12, 3) is None
    assert window_feed_spec(patch, (4, 3, 3), 4, 12, 12, 3) is None


def test_assembler_emits_window_feed(monkeypatch):
    """FeatureAssembler (eval, video_swin) emits the pre-windowed layout when
    the shape supports it, and its normalisation equals the spatial path's."""
    # tiny shapes sit below the resident-size gate, and CPU lacks the
    # kernels maybe_window_feed gates on; force both open
    monkeypatch.setenv("DEEPFAKE_TPU_FORCE_WINDOW_RESIDENT", "1")
    monkeypatch.setenv("DEEPFAKE_TPU_PALLAS_INTERPRET", "1")
    from deepfake_tpu.config import Config
    from deepfake_tpu.data.pipeline import FeatureAssembler
    from deepfake_tpu.models.swin3d import window_feed_host
    from deepfake_tpu.ops.image import preprocess_clip_batch

    cfg = Config()
    cfg.data.modality = "video_swin"
    cfg.model.swin3d_patch = (2, 2, 2)
    cfg.model.swin3d_window = (2, 3, 3)
    rng = np.random.default_rng(8)
    u8 = rng.integers(0, 256, (2, 4, 12, 12, 3), dtype=np.uint8)
    fa = FeatureAssembler(cfg, train=False)
    out, _labels = fa({"video": u8}, np.zeros(2))
    out = np.asarray(out)
    assert out.shape == (2, 1, 2, 2, 18, 24)
    ref = np.asarray(preprocess_clip_batch(
        __import__("jax").random.PRNGKey(0), jnp.asarray(u8)))
    ref_wf = window_feed_host(ref, (2, 2, 2), (2, 3, 3))
    np.testing.assert_allclose(out, ref_wf, rtol=1e-6, atol=1e-6)


def test_attention_pooling_head_parity(ref_vst):
    """Golden parity for PoolingMLP(pool='Attention') vs the reference head
    (video_swin_transformer.py:688-731), weights imported (VERDICT r3 #7).

    AXIS QUIRK (documented fix): the reference feeds [B, 17, 512] tokens to a
    batch_first=False nn.TransformerEncoder, whose input contract is
    (seq, batch, embed) — so as written its self-attention treats the BATCH
    axis as the sequence: clips in a batch attend to each other, and the 16
    frame tokens never interact. Our head attends over the 17 tokens (the
    evident intent: CLS + pos_embedding over frames). Parity is therefore
    checked against the reference modules executed with the token axis in the
    sequence position; a separate assertion demonstrates the as-written
    reference leaks information across clips (why the fix exists).
    """
    from types import SimpleNamespace

    from deepfake_tpu.io.torch_import import import_pooling_mlp
    from deepfake_tpu.models.swin3d import PoolingMLP

    torch.manual_seed(7)
    args = SimpleNamespace(classify_drop=0.0)
    ref = ref_vst.PoolingMLP(args, 768, 256, num_classes=1,
                             PoolingMethod="Attention").eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, stats = import_pooling_mlp(sd, "")

    B, D = 2, 16  # pos_embedding is hardcoded (1, 16+1, 512) in the reference
    rng = np.random.default_rng(5)
    # scale chosen so clip content is not swamped by cls/pos_embedding
    # (random-init downsample attenuates ~25x; tiny inputs wash the per-clip
    # signal below test tolerance and would make the leak demo vacuous)
    x_np = rng.standard_normal((B, 768, D, 7, 7)).astype(np.float32) * 8.0

    ours = PoolingMLP(in_feature=768, num_hidden=256, num_classes=1,
                      pool="Attention", classify_drop=0.0)
    cls_j, feat_j = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x_np.transpose(0, 2, 3, 4, 1)),  # B C D H W -> B D H W C
        deterministic=True,
    )

    with torch.no_grad():
        xt = torch.from_numpy(x_np)
        h = ref.downsample(
            xt.permute(0, 2, 1, 3, 4).reshape(B * D, 768, 7, 7))
        h = h.squeeze().reshape(B, D, 512)
        tok = torch.cat((ref.cls.repeat((B, 1, 1)), h), dim=1)
        tok = tok + ref.pos_embedding
        # token axis into the (seq, batch, embed) slot — the documented fix
        feat_t = ref.selfAttention(tok.transpose(0, 1)).transpose(0, 1)
        cls_t = ref.projection(feat_t[:, 0, :]).squeeze(-1)

    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(feat_j), feat_t[:, 1:, :].numpy(),
                               rtol=1e-4, atol=2e-4)

    # The as-written reference is degenerate: with (seq, batch) swapped the
    # CLS "token" occupies batch-entry 0 of every clip-position, so it only
    # ever attends to the other clips' (identical) CLS entries — never to a
    # frame token. classify = projection(feat[:,0]) is therefore a CONSTANT,
    # independent of the video (and its frame tokens leak across clips in
    # `feat`). Demonstrate: two unrelated inputs give the same score.
    with torch.no_grad():
        c0, _ = ref(xt)
        c1, _ = ref(torch.from_numpy(
            rng.standard_normal(x_np.shape).astype(np.float32) * 8.0))
    np.testing.assert_allclose(c0.numpy(), c1.numpy(), atol=1e-5)
    # ours is not constant: the CLS token attends over the frame tokens
    cls_j2, _ = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(rng.standard_normal(
            (B, D, 7, 7, 768)).astype(np.float32) * 8.0),
        deterministic=True,
    )
    assert not np.allclose(np.asarray(cls_j), np.asarray(cls_j2), atol=1e-4)
