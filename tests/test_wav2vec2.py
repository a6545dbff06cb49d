"""Golden parity tests: native JAX wav2vec2 vs HuggingFace torch reference.

The reference system uses HF Wav2Vec2Model directly (reference:
train.py:39-41); matching HF numerically on the shipped checkpoint IS parity
with the reference's paudio branch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_tpu.io.torch_import import import_wav2vec2, load_torch_state_dict
from deepfake_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    feature_extract_output_length,
    wav2vec2_process,
)
from tests.conftest import WAV2VEC2_DIR, has_wav2vec2_weights

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _hf_model(tiny: bool = False):
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    if tiny:
        cfg = HFConfig(
            conv_dim=[32] * 7,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
            do_stable_layer_norm=False,
            feat_extract_norm="group",
        )
        torch.manual_seed(0)
        return HFModel(cfg).eval(), cfg
    from transformers import Wav2Vec2Model

    return Wav2Vec2Model.from_pretrained(WAV2VEC2_DIR).eval(), None


def _our_config_from_hf(cfg):
    return Wav2Vec2Config(
        conv_dim=tuple(cfg.conv_dim),
        conv_kernel=tuple(cfg.conv_kernel),
        conv_stride=tuple(cfg.conv_stride),
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
    )


def test_tiny_random_parity():
    """Architecture check against a randomly-initialised tiny HF model."""
    hf, cfg = _hf_model(tiny=True)
    ours = Wav2Vec2Model(_our_config_from_hf(cfg))
    params = import_wav2vec2(hf.state_dict(), num_layers=cfg.num_hidden_layers)

    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 4000)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(wave)).last_hidden_state.numpy()
    got = ours.apply({"params": params}, jnp.asarray(wave), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_fullsize_random_parity():
    """Full base-960h architecture (random init — the shipped checkpoint is a
    git-lfs stub): last_hidden_state must match HF to under the 1e-3 target
    (BASELINE.md) on a full-size random-weight model."""
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    cfg = HFConfig()  # defaults == base-960h topology
    torch.manual_seed(1)
    hf = HFModel(cfg).eval()
    params = import_wav2vec2(hf.state_dict(), num_layers=cfg.num_hidden_layers)
    ours = Wav2Vec2Model(Wav2Vec2Config())

    rng = np.random.default_rng(1)
    raw = [rng.standard_normal(16000).astype(np.float32),
           rng.standard_normal(8000).astype(np.float32)]
    wave = wav2vec2_process(raw)
    with torch.no_grad():
        want = hf(torch.from_numpy(wave)).last_hidden_state.numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(wave), deterministic=True))
    assert np.max(np.abs(got - want)) < 1e-3


@pytest.mark.skipif(not has_wav2vec2_weights(), reason="reference checkpoint is an lfs stub")
def test_real_checkpoint_parity():
    """Full wav2vec2-base-960h on the shipped safetensors: last_hidden_state
    must match HF to well under the 1e-3 target (BASELINE.md)."""
    sd = load_torch_state_dict(WAV2VEC2_DIR + "/model.safetensors")
    params = import_wav2vec2(sd)
    ours = Wav2Vec2Model(Wav2Vec2Config())

    hf, _ = _hf_model(tiny=False)
    rng = np.random.default_rng(1)
    raw = [rng.standard_normal(16000 * 2).astype(np.float32),
           rng.standard_normal(16000).astype(np.float32)]
    wave = wav2vec2_process(raw)
    with torch.no_grad():
        want = hf(torch.from_numpy(wave)).last_hidden_state.numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(wave), deterministic=True))
    assert np.max(np.abs(got - want)) < 1e-3


def test_bucket_masked_parity_tiny():
    """Batch-longest emulation inside a static bucket (VERDICT round 1,
    next #6): bucket-padded waveforms + (wave, lengths) masking produce the
    SAME hidden states as HF run on the reference's pad-to-longest batch —
    GroupNorm stats, positional-conv boundary, attention and all."""
    from deepfake_tpu.data.audio_io import pad_to_bucket
    from deepfake_tpu.data.pipeline import batch_longest_wave_normalize

    hf, cfg = _hf_model(tiny=True)
    ours = Wav2Vec2Model(_our_config_from_hf(cfg))
    params = import_wav2vec2(hf.state_dict(), num_layers=cfg.num_hidden_layers)

    rng = np.random.default_rng(5)
    raw = [rng.standard_normal(4100).astype(np.float32),
           rng.standard_normal(6500).astype(np.float32)]
    # reference half: HF processor pads to the batch longest and normalises
    wave_ref = wav2vec2_process(raw)
    with torch.no_grad():
        want = hf(torch.from_numpy(wave_ref)).last_hidden_state.numpy()

    # our half: static 8000-sample bucket (!= batch longest 6500)
    bucket = np.stack([pad_to_bucket(np.asarray(w), (8000,)) for w in raw])
    lengths = jnp.asarray([4100, 6500], jnp.int32)
    normed = batch_longest_wave_normalize(jnp.asarray(bucket), lengths)
    # the normalised bucket row restricted to L == the reference's padded row
    np.testing.assert_allclose(np.asarray(normed)[:, :6500], wave_ref, atol=1e-5)

    got = np.asarray(
        ours.apply({"params": params}, (normed, lengths), deterministic=True)
    )
    F = want.shape[1]  # frames of the L-long input
    assert got.shape[1] > F  # bucket row yields extra (masked-out) frames
    np.testing.assert_allclose(got[:, :F], want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_ragged_e2e_paudio_parity():
    """End-to-end golden for the paudio north-star surface (VERDICT round 1,
    next #6): ragged clips -> our FULL pipeline (static bucket pad ->
    FeatureAssembler batch_longest -> Audio2D) vs the reference torch
    pipeline (HF processor pad-to-longest -> HF wav2vec2 -> reference Audio2D
    head), outputs within the 1e-3 target at full model size."""
    from types import SimpleNamespace

    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    from deepfake_tpu.config import Config
    from deepfake_tpu.data.audio_io import pad_to_bucket
    from deepfake_tpu.data.pipeline import FeatureAssembler
    from deepfake_tpu.io.torch_import import import_audio2d
    from deepfake_tpu.models.audio2d import Audio2D
    from tests import ref_loader

    torch.manual_seed(11)
    hf = HFModel(HFConfig()).eval()
    ref_mod = ref_loader.load("src.models.audioTransformer")
    ref = ref_mod.Audio2D(
        SimpleNamespace(swin_drop=0.0, classify_drop=0.0), hf, num_classes=1
    ).eval()

    rng = np.random.default_rng(11)
    lens = [41000, 63000]
    raw = [rng.standard_normal(n).astype(np.float32) * 0.3 for n in lens]
    wave_ref = wav2vec2_process(raw)
    with torch.no_grad():
        want = ref(torch.from_numpy(wave_ref)).numpy()

    params, _ = import_audio2d(ref.state_dict())
    cfg = Config()
    cfg.data.modality = "paudio"
    assert cfg.data.wave_norm == "batch_longest"  # reference-parity default
    bucket = int(4.0 * 16000)  # 64000-sample bucket != batch longest 63000
    feats = {
        "paudio_wave": np.stack([pad_to_bucket(w, (bucket,)) for w in raw]),
        "paudio_len": np.asarray(lens, np.int32),
    }
    inputs, _ = FeatureAssembler(cfg, train=False)(feats, np.zeros(2, np.float32))
    ours = Audio2D(num_classes=1, model_drop=0.0, classify_drop=0.0)
    got = np.asarray(ours.apply({"params": params}, inputs, deterministic=True))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_output_length_formula():
    c = Wav2Vec2Config()
    t = 16000
    assert feature_extract_output_length(c, t) == 49

    # matches an actual forward shape
    ours = Wav2Vec2Model(c)
    params = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)), deterministic=True)
    out = ours.apply(params, jnp.zeros((1, 16000)), deterministic=True)
    assert out.shape == (1, 49, 768)


def test_processor_normalisation():
    rng = np.random.default_rng(2)
    raw = [rng.standard_normal(1000).astype(np.float32) * 3 + 1]
    out = wav2vec2_process(raw)
    assert abs(out[0].mean()) < 1e-5
    assert abs(out[0].std() - 1.0) < 1e-3


def test_spec_augment_and_layerdrop_training_modes():
    """Training-time spec-augment masking + layerdrop are active and
    stochastic across keys; eval is unaffected."""
    cfg = Wav2Vec2Config(
        conv_dim=(8,) * 7, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        mask_time_prob=0.3, layerdrop=0.5,
    )
    m = Wav2Vec2Model(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4000)), jnp.float32)
    params = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True,
    )["params"]
    e1 = m.apply({"params": params}, x, deterministic=True)
    e2 = m.apply({"params": params}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    t1 = m.apply({"params": params}, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    t2 = m.apply({"params": params}, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_lse_pool():
    from deepfake_tpu.models.swin2d import lse_pool

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 3)), jnp.float32)
    got = np.asarray(lse_pool(x))
    want = np.log(np.exp(np.asarray(x)).sum(axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_processor_matches_hf_feature_extractor():
    """wav2vec2_process == HF Wav2Vec2FeatureExtractor (do_normalize, pad to
    longest) — the host-side half of the reference's paudio path
    (reference: src/trainer.py:251)."""
    from transformers import Wav2Vec2FeatureExtractor

    fe = Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0, do_normalize=True,
        return_attention_mask=False,
    )
    rng = np.random.default_rng(9)
    raw = [rng.standard_normal(5000).astype(np.float32) * 2 + 1,
           rng.standard_normal(7000).astype(np.float32)]
    want = fe(raw, sampling_rate=16000, padding="longest",
              return_tensors="np").input_values
    got = wav2vec2_process(raw)
    np.testing.assert_allclose(got, want, atol=1e-5)
