"""Offline audio feature pass (reference: audio_preprocess.py:8-41).

The reference pre-renders mel-spectrogram JPEGs for the test set; with the
mel transform on device that detour is unnecessary, but an offline pass is
still useful to pre-demux audio tracks to 16 kHz PCM sidecars (.npy) so the
training hot loop never touches a demuxer.

    python audio_preprocess.py --data_root /data/multi-ffdv [--split test]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--split", type=str, default="test",
                   choices=["train", "val", "test"])
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--log_dir", type=str, default=None)
    args = p.parse_args()

    from deepfake_tpu.data.audio_io import extract_wav
    from deepfake_tpu.utils.logging import Logger

    logger = Logger(args.log_dir)
    sub = {
        "train": os.path.join("phase1", "trainset"),
        "val": os.path.join("phase1", "valset"),
        "test": os.path.join("phase2", "testset1seen"),
    }[args.split]
    dataset_path = os.path.join(args.data_root, sub)
    names = sorted(
        n for n in os.listdir(dataset_path)
        if n.lower().endswith((".mp4", ".avi", ".mov", ".mkv", ".webm"))
    )
    logger(f"Processing Audio File! ({len(names)} videos)")
    for index, name in enumerate(names):
        path = os.path.join(dataset_path, name)
        target = os.path.splitext(path)[0] + ".npy"
        if os.path.exists(target):
            continue
        if index % 100 == 0:
            rate = int(index / max(len(names), 1) * 100)
            logger("[" + "*" * rate + "-" * (100 - rate) + f"] ({index}/{len(names)})")
        wave = extract_wav(path, args.sample_rate)
        np.save(target, wave.astype(np.float32))
    logger("Processing Complete")


if __name__ == "__main__":
    main()
