"""Measure the REFERENCE's config-1 pipeline on this box (VERDICT r2 next #3).

BASELINE.json pins config 1 (audio-only wav2vec2 branch -> fake/real logit on
one clip) to CPU, and the reference torch code runs on this machine via
tests/ref_loader.py — so this baseline can be a MEASUREMENT, not an estimate.

What is timed: the reference inference step for one clip —
  Wav2Vec2Processor normalisation (host, emulated by wav2vec2_process — the
  checkpoint is a git-lfs stub, so HF random weights stand in; FLOPs don't
  care) -> HF Wav2Vec2Model -> Audio2D head (reference:
  src/models/audioTransformer.py:21-30, invoked at src/trainer.py:251,258)
under torch.no_grad() in float32 (the reference runs f32 everywhere and
disables cuDNN, src/utils.py:391 — irrelevant on CPU).

For a same-box comparison the equivalent deepfake_tpu forward (our native JAX
wav2vec2 + Audio2D head) is also timed on CPU.

Writes one JSON line per measurement; run with JAX_PLATFORMS=cpu.

    python scripts/bench_reference_config1.py [--seconds 4] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, ".")  # repo root (tests/ref_loader)

import numpy as np


def time_reference(wave: np.ndarray, iters: int) -> float:
    import torch

    from tests import ref_loader

    from deepfake_tpu.models.wav2vec2 import wav2vec2_process

    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    torch.manual_seed(0)
    hf = HFModel(HFConfig()).eval()  # wav2vec2-base topology (95M params)
    ref_mod = ref_loader.load("src.models.audioTransformer")
    args = SimpleNamespace(swin_drop=0.0, classify_drop=0.0)
    model = ref_mod.Audio2D(args, hf, num_classes=1).eval()

    def one():
        t0 = time.perf_counter()
        # host processor step + model forward, exactly the reference's
        # per-batch work at src/trainer.py:251
        x = torch.from_numpy(wav2vec2_process([wave]))
        with torch.no_grad():
            model(x)
        return time.perf_counter() - t0

    one()  # warm (allocator, thread pools)
    return statistics.median(one() for _ in range(iters))


def time_ours(wave: np.ndarray, iters: int) -> float:
    import jax

    # the ambient environment pins JAX_PLATFORMS to the axon TPU tunnel and
    # overrides env-var changes; force CPU the way tests/conftest.py does
    # (block_until_ready through the tunnel acks dispatch only — timing there
    # would be fiction)
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
    import jax.numpy as jnp

    from deepfake_tpu.config import Config
    from deepfake_tpu.data.pipeline import hf_wave_normalize
    from deepfake_tpu.models.registry import build_model

    cfg = Config()
    cfg.data.modality = "paudio"
    cfg.parallel.compute_dtype = "float32"  # CPU apples-to-apples vs torch f32
    model = build_model(cfg)
    x = jnp.asarray(wave[None])
    variables = jax.jit(lambda k, x: model.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)}, x, deterministic=True
    ))(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, hf_wave_normalize(x), deterministic=True)

    jax.block_until_ready(fwd(variables, x))  # compile (real sync on CPU)

    def one():
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(variables, x))
        return time.perf_counter() - t0

    return statistics.median(one() for _ in range(iters))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=4.0,
                   help="clip length (matches bench.py config 1: the "
                        "smallest waveform bucket, 4 s)")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--skip_ours", action="store_true")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    wave = rng.standard_normal(int(args.seconds * 16000)).astype(np.float32)

    t_ref = time_reference(wave, args.iters)
    print(json.dumps({
        "metric": "reference_config1_clips_per_sec_cpu_measured",
        "value": round(1.0 / t_ref, 3), "unit": "clips/s",
        "seconds_per_clip": round(t_ref, 3),
        "clip_seconds": args.seconds,
        "note": "reference torch Audio2D+Wav2Vec2Model, f32, no_grad, "
                "this box's CPU; random HF weights (lfs stub)",
    }))
    if not args.skip_ours:
        t_us = time_ours(wave, args.iters)
        print(json.dumps({
            "metric": "ours_config1_clips_per_sec_cpu_measured",
            "value": round(1.0 / t_us, 3), "unit": "clips/s",
            "seconds_per_clip": round(t_us, 3),
            "speedup_same_box_cpu": round(t_ref / t_us, 2),
        }))


if __name__ == "__main__":
    main()
