"""Golden test: Audio2D (paudio head) vs the reference implementation
(reference: src/models/audioTransformer.py:5-30), with dropout rates at zero
so the reference's ungated F.dropout quirk becomes the identity."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_tpu.io.torch_import import import_audio2d, import_wav2vec2
from deepfake_tpu.models.audio2d import Audio2D
from deepfake_tpu.models.wav2vec2 import Wav2Vec2Config, wav2vec2_process
from tests import ref_loader

torch = pytest.importorskip("torch")


def test_audio2d_parity_classifier_and_feat():
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    torch.manual_seed(3)
    hf = HFModel(HFConfig()).eval()

    ref_mod = ref_loader.load("src.models.audioTransformer")
    args = SimpleNamespace(swin_drop=0.0, classify_drop=0.0)
    ref = ref_mod.Audio2D(args, hf, num_classes=1).eval()

    rng = np.random.default_rng(3)
    wave = wav2vec2_process([rng.standard_normal(8000).astype(np.float32)] * 2)

    with torch.no_grad():
        want_prob = ref(torch.from_numpy(wave)).numpy()
        ref.use_feat = True
        want_feat = ref(torch.from_numpy(wave)).numpy()
        ref.use_feat = False

    params, _ = import_audio2d(ref.state_dict())
    ours = Audio2D(num_classes=1, model_drop=0.0, classify_drop=0.0)
    got_prob = np.asarray(
        ours.apply({"params": params}, jnp.asarray(wave), deterministic=True)
    )
    np.testing.assert_allclose(got_prob, want_prob, atol=1e-3)

    ours_feat = Audio2D(num_classes=1, use_feat=True, model_drop=0.0)
    got_feat = np.asarray(
        ours_feat.apply({"params": params}, jnp.asarray(wave), deterministic=True)
    )
    np.testing.assert_allclose(got_feat, want_feat, atol=1e-3)


def test_parity_inference_dropout_quirk():
    """With parity_inference_dropout=True, eval outputs are stochastic across
    rng keys — reproducing the reference's ungated F.dropout
    (reference: audioTransformer.py:24,28)."""
    cfg = Wav2Vec2Config(
        conv_dim=(8,) * 7, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=32,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    model = Audio2D(wav_config=cfg, model_drop=0.5, parity_inference_dropout=True)
    wave = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4000)), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        wave, deterministic=True,
    )["params"]
    o1 = model.apply({"params": params}, wave, deterministic=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply({"params": params}, wave, deterministic=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
