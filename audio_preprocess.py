"""Offline audio feature pass (reference: audio_preprocess.py:8-41).

Two output formats:

* --format pcm (default): pre-demux audio tracks to 16 kHz PCM sidecars
  (.npy) so the training hot loop never touches a demuxer. The mel transform
  itself runs on device at train time (deepfake_tpu/ops/mel.py), so no image
  detour is needed.
* --format jpeg: reference-parity bootstrap of the AudioImgs directories —
  mel-spectrogram JPEGs written to <data_root>/{trainAudioImgs, ValAudioImgs,
  TestAudioImgs}/<clip>.jpg, the layout the reference generates lazily
  (reference: data/data_process.py:70-97, audio_preprocess.py:8-41) and that
  our dataset's JPEG parity path consumes (data/dataset.py _load_audio_image
  with cfg.data.audio_from_images). The mel itself is the on-device pipeline
  (16 kHz PCM -> 22.05 kHz polyphase resample -> mel -> dB -> minmax uint8 ->
  224x224), batched per static waveform bucket.

    python audio_preprocess.py --data_root /data/multi-ffdv [--split test]
    python audio_preprocess.py --data_root /data/multi-ffdv --format jpeg
"""

from __future__ import annotations

import argparse
import os

import numpy as np

_IMG_DIRS = {"train": "trainAudioImgs", "val": "ValAudioImgs", "test": "TestAudioImgs"}
_SPLIT_DIRS = {
    "train": os.path.join("phase1", "trainset"),
    "val": os.path.join("phase1", "valset"),
    "test": os.path.join("phase2", "testset1seen"),
}


def _progress(logger, index: int, total: int):
    if index % 100 == 0:
        rate = int(index / max(total, 1) * 100)
        logger("[" + "*" * rate + "-" * (100 - rate) + f"] ({index}/{total})")


def write_pcm_sidecars(dataset_path, names, sample_rate, logger):
    from deepfake_tpu.data.audio_io import extract_wav

    for index, name in enumerate(names):
        path = os.path.join(dataset_path, name)
        target = os.path.splitext(path)[0] + ".npy"
        if os.path.exists(target):
            continue
        _progress(logger, index, len(names))
        wave = extract_wav(path, sample_rate)
        np.save(target, wave.astype(np.float32))


def write_mel_jpegs(data_root, split, dataset_path, names, sample_rate, logger,
                    batch: int = 8, force: bool = False):
    """Mel JPEGs batched per waveform bucket (implementation shared with the
    lazy in-dataset pass: deepfake_tpu/data/audio_images.py)."""
    from deepfake_tpu.data.audio_images import write_mel_jpegs as _write

    return _write(data_root, split, dataset_path, names, sample_rate, logger,
                  batch, force)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--split", type=str, default="test",
                   choices=["train", "val", "test"])
    p.add_argument("--format", type=str, default="pcm", choices=["pcm", "jpeg"])
    p.add_argument("--force_generate", action="store_true",
                   help="regenerate JPEGs that already exist "
                        "(reference: config.py:10)")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--log_dir", type=str, default=None)
    args = p.parse_args(argv)

    from deepfake_tpu.utils.logging import Logger

    logger = Logger(args.log_dir)
    dataset_path = os.path.join(args.data_root, _SPLIT_DIRS[args.split])
    names = sorted(
        n for n in os.listdir(dataset_path)
        if n.lower().endswith((".mp4", ".avi", ".mov", ".mkv", ".webm"))
    )
    logger(f"Processing Audio File! ({len(names)} videos)")
    if args.format == "jpeg":
        write_mel_jpegs(args.data_root, args.split, dataset_path, names,
                        args.sample_rate, logger, args.batch,
                        force=args.force_generate)
    else:
        write_pcm_sidecars(dataset_path, names, args.sample_rate, logger)
    logger("Processing Complete")


if __name__ == "__main__":
    main()
