"""Mel-spectrogram JPEG generation (the reference AudioImgs layout).

The reference generates missing mel JPEGs lazily inside dataset init, with a
--force_generate override regenerating everything (reference:
data/data_process.py:70-97, config.py:10). Here the same pass runs batched
per static waveform bucket (one XLA program per (bucket, batch) combination)
and is shared by the offline entry point (audio_preprocess.py --format jpeg)
and the lazy in-dataset path (data/dataset.py).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

_IMG_DIRS = {"train": "trainAudioImgs", "val": "ValAudioImgs", "test": "TestAudioImgs"}


def write_mel_jpegs(data_root, split, dataset_path, names, sample_rate, logger,
                    batch: int = 8, force: bool = False):
    """Mel JPEGs batched per waveform bucket: static shapes -> one XLA
    program per (bucket, batch) combination. force=True regenerates files
    that already exist (reference's force_generate, data_process.py:75)."""
    import cv2

    import jax
    import jax.numpy as jnp

    from deepfake_tpu.config import Config
    from deepfake_tpu.data.audio_io import extract_wav, pad_to_bucket
    from deepfake_tpu.data.pipeline import mel_image_masked

    cfg = Config()
    out_dir = os.path.join(data_root, _IMG_DIRS[split])
    os.makedirs(out_dir, exist_ok=True)
    buckets = [int(s * sample_rate) for s in cfg.data.wave_seconds_buckets]
    pending = {b: [] for b in buckets}  # bucket -> [(name, padded, valid)]

    def _progress(index: int, total: int):
        if index % 100 == 0:
            rate = int(index / max(total, 1) * 100)
            logger("[" + "*" * rate + "-" * (100 - rate) + f"] ({index}/{total})")

    def flush(bucket):
        group = pending[bucket]
        if not group:
            return
        waves = np.stack([g[1] for g in group])
        lens = np.asarray([g[2] for g in group], np.int32)
        imgs = jax.device_get(
            mel_image_masked(
                jnp.asarray(waves), jnp.asarray(lens),
                sr=cfg.mel.sample_rate, n_fft=cfg.mel.n_fft,
                hop=cfg.mel.hop_length, n_mels=cfg.mel.n_mels,
                size=cfg.data.audio_size, wave_sr=sample_rate, raw_uint8=True,
            )
        )
        for (name, _w, _l), img in zip(group, imgs):
            target = os.path.join(out_dir, os.path.splitext(name)[0] + ".jpg")
            cv2.imwrite(target, img)
        group.clear()

    done = 0
    for index, name in enumerate(names):
        target = os.path.join(out_dir, os.path.splitext(name)[0] + ".jpg")
        if os.path.exists(target) and not force:
            continue
        _progress(index, len(names))
        wave = extract_wav(os.path.join(dataset_path, name), sample_rate)
        padded = pad_to_bucket(wave, buckets)
        valid = min(len(wave), len(padded))
        pending[len(padded)].append((name, padded, valid))
        done += 1
        if len(pending[len(padded)]) >= batch:
            flush(len(padded))
    for b in buckets:
        flush(b)
    logger(f"wrote {done} mel JPEGs to {out_dir}")
    return done


def ensure_audio_images(cfg, split: str, dataset_path: str,
                        names: Sequence[str], logger: Optional[object] = None,
                        force: Optional[bool] = None) -> int:
    """Lazy in-dataset generation: produce any missing <split>AudioImgs
    JPEGs before the first epoch (all of them when cfg.data.force_generate).
    Returns the number of images written."""
    if force is None:
        force = bool(getattr(cfg.data, "force_generate", False))
    out_dir = os.path.join(cfg.data.data_root, _IMG_DIRS[split])
    if not force:
        missing = [
            n for n in names
            if not os.path.exists(
                os.path.join(out_dir, os.path.splitext(n)[0] + ".jpg")
            )
        ]
        if not missing:
            return 0
    log = logger if logger is not None else (lambda s: None)
    return write_mel_jpegs(
        cfg.data.data_root, split, dataset_path, names,
        cfg.data.wave_sample_rate, log, force=force,
    )
