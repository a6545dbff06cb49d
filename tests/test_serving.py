"""Serving Predictor API tests."""

import numpy as np

import jax.numpy as jnp

from deepfake_tpu.config import Config
from deepfake_tpu.serving import Predictor


def _cfg():
    cfg = Config()
    cfg.data.modality = "audio"
    cfg.data.audio_size = 56
    cfg.model.swin2d_embed_dim = 16
    cfg.model.swin2d_depths = (2,)
    cfg.model.swin2d_heads = (2,)
    cfg.parallel.compute_dtype = "float32"
    return cfg


def test_predictor_predict_and_raw():
    pred = Predictor(_cfg())
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 56, 56, 3)),
                    jnp.float32)
    probs = pred.predict(x)
    assert probs.shape == (2,)
    assert np.all((probs >= 0) & (probs <= 1))

    # raw path: padded PCM + length -> on-device mel -> score
    feats = {
        "audio_wave": np.random.default_rng(1)
        .standard_normal((1, 16000)).astype(np.float32),
        "audio_len": np.asarray([16000], np.int32),
    }
    p = pred.predict_raw(feats)
    assert p.shape == (1,) and 0 <= p[0] <= 1


def test_predictor_sharded_matches_single_device():
    """DP-sharded inference (VERDICT round 1, next #4): an 8-device mesh
    produces the single-device scores, in input order; a non-divisible batch
    falls back to replication with identical results."""
    import jax

    from deepfake_tpu.parallel.mesh import make_mesh

    cfg = _cfg()
    p1 = Predictor(cfg, mesh=make_mesh(data=1, model=1, devices=jax.devices()[:1]))
    p8 = Predictor(cfg)  # default: all 8 virtual devices, pure DP
    x = np.random.default_rng(3).standard_normal((8, 56, 56, 3)).astype(np.float32)

    want = p1.predict(x)
    got = p8.predict(x)
    assert got.shape == (8,)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # order preserved under permutation
    perm = np.random.default_rng(4).permutation(8)
    np.testing.assert_allclose(p8.predict(x[perm]), got[perm], rtol=1e-5, atol=1e-6)

    # ragged batch (5 % 8 != 0) -> replication fallback, same numbers
    np.testing.assert_allclose(
        p8.predict(x[:5]), want[:5], rtol=1e-5, atol=1e-6
    )


def test_predictor_checkpoint_roundtrip(tmp_path):
    import jax

    from deepfake_tpu.io.checkpoint import save_checkpoint
    from deepfake_tpu.train.trainer import TrainState

    cfg = _cfg()
    pred = Predictor(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=pred.variables["params"],
        batch_stats={}, opt_state={},
    )
    path = save_checkpoint(str(tmp_path / "ck"), state)
    pred2 = Predictor.from_checkpoint(cfg, path)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 56, 56, 3)),
                    jnp.float32)
    np.testing.assert_allclose(pred.predict(x), pred2.predict(x), atol=1e-6)
