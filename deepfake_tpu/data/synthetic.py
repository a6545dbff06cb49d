"""Synthetic test-set generator for end-to-end benches and smoke tests.

Writes N mp4 clips (cv2.VideoWriter — no audio track; this image has no
ffmpeg CLI) plus PCM .wav sidecars (the offline audio_preprocess.py pass's
format, reference: audio_preprocess.py:8-41), and the phase-2 name CSV the
submission path reads (reference: data/data_process.py:28-50).
"""

from __future__ import annotations

import os

import numpy as np


def make_synthetic_testset(root: str, n_clips: int, frames: int = 48,
                           size: int = 256, seconds: float = 4.0,
                           seed: int = 0):
    import cv2
    from scipy.io import wavfile

    os.makedirs(os.path.join(root, "phase2", "testset1seen"), exist_ok=True)
    rng = np.random.default_rng(seed)
    names = []
    for i in range(n_clips):
        name = f"clip_{i}.mp4"
        p = os.path.join(root, "phase2", "testset1seen", name)
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 12, (size, size))
        for _ in range(frames):
            w.write(rng.integers(0, 255, (size, size, 3), np.uint8))
        w.release()
        wav = (rng.standard_normal(int(16000 * seconds)) * 0.1 * 32767).astype(np.int16)
        wavfile.write(p[:-4] + ".wav", 16000, wav)
        names.append(name)
    with open(os.path.join(root, "phase2", "prediction.txt.csv"), "w") as f:
        f.write("video_name,y_pred\n")
        for n in names:
            f.write(f"{n},0.5\n")
    return names
