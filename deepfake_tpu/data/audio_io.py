"""Host-side audio extraction (demux/resample to 16 kHz PCM).

Counterpart of the reference's extract_wav (reference: src/utils.py:41-49):
pydub->FFmpeg demux to a shared temp file keyed by random.randint — a
documented race across its dataloader workers (SURVEY.md §5.2). Here there is
no temp file at all: demux goes straight to memory.

Backends, in order:
1. a sidecar PCM file next to the video (<name>.wav / <name>.npy) — the
   offline-extraction layout (reference's trainAudioWav idea,
   data/data_process.py:99-133 commented block);
2. the ffmpeg binary (subprocess, pipe to stdout) when present;
3. otherwise a clear error — this image ships no mp4 audio demuxer.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import numpy as np


def read_wav(path: str, target_sr: int = 16000) -> np.ndarray:
    """float32 mono waveform in [-1, 1]; naive linear resample if needed."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        y = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        y = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        y = (data.astype(np.float32) - 128.0) / 128.0
    else:
        y = data.astype(np.float32)
    if y.ndim == 2:
        y = y.mean(axis=1)
    if sr != target_sr:
        n_out = int(round(len(y) * target_sr / sr))
        xi = np.linspace(0, len(y) - 1, n_out)
        y = np.interp(xi, np.arange(len(y)), y).astype(np.float32)
    return y


def has_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def has_sidecar(video_path: str) -> bool:
    """True when an offline-pass PCM sidecar (.wav/.npy) exists for the clip
    (audio_preprocess.py --format pcm); extract_wav prefers it."""
    base, _ = os.path.splitext(video_path)
    return any(os.path.exists(base + ext) for ext in (".wav", ".npy"))


def extract_wav(video_path: str, sample_rate: int = 16000) -> np.ndarray:
    """Video file -> float32 mono PCM at sample_rate (no temp files).
    Prefers sidecar PCM, then the native libav demuxer, then the ffmpeg CLI."""
    base, _ = os.path.splitext(video_path)
    for ext in (".wav", ".npy"):
        sidecar = base + ext
        if os.path.exists(sidecar):
            if ext == ".npy":
                return np.load(sidecar).astype(np.float32)
            return read_wav(sidecar, sample_rate)
    from deepfake_tpu import native

    if native.available():
        y = native.decode_audio(video_path, sample_rate)
        if y is not None and len(y) > 0:
            return y
    if has_ffmpeg():
        cmd = [
            "ffmpeg", "-v", "quiet", "-i", video_path, "-f", "f32le",
            "-acodec", "pcm_f32le", "-ac", "1", "-ar", str(sample_rate), "-",
        ]
        raw = subprocess.run(cmd, capture_output=True, check=True).stdout
        return np.frombuffer(raw, np.float32).copy()
    raise RuntimeError(
        f"no audio backend for {video_path}: provide a sidecar .wav/.npy or "
        "install ffmpeg"
    )


_warned_truncate = False


def pad_to_bucket(y: np.ndarray, buckets_samples) -> np.ndarray:
    """Pad/truncate a waveform to the smallest bucket that fits — static
    shapes for XLA (the reference pads per-batch to the longest with NO cap,
    a dynamic shape per step: src/trainer.py:251). Clips longer than the
    largest bucket are TRUNCATED — a documented parity bound (PARITY.md):
    raise cfg.data.wave_seconds_buckets (e.g. --set
    data.wave_seconds_buckets="[4,8,16,32]") to cover longer clips. Warns
    once per process when a clip is actually truncated."""
    n = len(y)
    for b in sorted(buckets_samples):
        if n <= b:
            out = np.zeros(b, np.float32)
            out[:n] = y
            return out
    b = max(buckets_samples)
    global _warned_truncate
    if not _warned_truncate:
        _warned_truncate = True
        import warnings

        warnings.warn(
            f"waveform of {n} samples exceeds the largest bucket ({b}): "
            "TRUNCATING — logits for such clips diverge from the reference "
            "(which pads to the batch longest with no cap); add a larger "
            "tail bucket via cfg.data.wave_seconds_buckets to cover them"
        )
    return y[:b].astype(np.float32)
