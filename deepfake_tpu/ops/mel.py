"""On-device log-mel spectrogram pipeline.

Replaces the reference's host-side pydub->librosa->cv2->JPEG round trip
(reference: src/utils.py:63-87 generate_mel_spectrogram + the offline passes
at data/data_process.py:77-94 and audio_preprocess.py): framing, real FFT,
mel filterbank matmul, dB conversion, min-max 0-255 quantisation, bilinear
resize to 224x224, and ImageNet normalisation all run as one jitted XLA
program on TPU. The mel matmul and the resize land on the MXU; the JPEG
compression step is dropped (lossy and host-bound).

librosa-compatible semantics reproduced exactly:
* hann window (periodic), center=True with reflect padding, n_fft 2048,
  hop 512, power 2.0 (librosa.feature.melspectrogram defaults);
* slaney-scale mel filterbank with slaney area normalisation (htk=False);
* power_to_db with ref=max over the clip, amin 1e-10, top_db 80;
* cv2.normalize(NORM_MINMAX, 0-255) -> uint8 truncation -> cv2.resize
  INTER_LINEAR (half-pixel centers) -> /255 -> ImageNet mean/std, replicated
  to 3 channels (reference: data_process.py:150-153 loads the JPEG as RGB).

Note: the reference exports 16 kHz audio but reloads it through
librosa.load's default 22.05 kHz resampler (src/utils.py:66-70). That second
resample is reproduced on device (ops/resample.py, wired through
data/pipeline.py mel_image_masked's wave_sr argument) so the 22.05 kHz mel
filterbank sees audio at its labeled rate; only the JPEG round trip is
dropped (lossy and host-bound).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def hann_window(n: int) -> np.ndarray:
    """Periodic hann (scipy sym=False), matching librosa's default."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def mel_frequencies(n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        safe = np.maximum(f, 1e-10)
        return np.where(
            f >= min_log_hz, min_log_mel + np.log(safe / min_log_hz) / logstep, mels
        )

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(
            m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
        )

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels)
    return mel_to_hz(mels)


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: Optional[float] = None
) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] slaney-normalised triangular filterbank
    (librosa.filters.mel(htk=False, norm='slaney') semantics)."""
    fmax = fmax or sr / 2.0
    fft_freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_f = mel_frequencies(n_mels + 2, fmin, fmax)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """center=True reflect-padded framing -> [frames, n_fft]."""
    pad = n_fft // 2
    y = jnp.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return y[idx]


@functools.lru_cache(maxsize=4)
def _windowed_dft_matrices(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT matrices with the hann window folded in, [n_fft, n_bins].
    GEMM-native STFT: one matmul per component instead of an FFT — the DFT
    rides the MXU, where TPU FFT lowering does not (MelT-style frontend)."""
    bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(bins)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    w = hann_window(n_fft)[:, None].astype(np.float64)
    return (
        (np.cos(ang) * w).astype(np.float32),
        (np.sin(ang) * w).astype(np.float32),
    )


def stft_power(frames: jnp.ndarray, n_fft: int, method: str = "gemm") -> jnp.ndarray:
    """Windowed power spectrum of raw frames [T, n_fft] -> [T, n_fft//2+1]."""
    if method == "fft":
        spec = jnp.fft.rfft(frames * jnp.asarray(hann_window(n_fft)), axis=-1)
        return jnp.abs(spec) ** 2
    dft_re, dft_im = _windowed_dft_matrices(n_fft)
    re = frames @ jnp.asarray(dft_re)
    im = frames @ jnp.asarray(dft_im)
    return re * re + im * im


@functools.partial(
    jax.jit, static_argnames=("sr", "n_fft", "hop", "n_mels", "fmax", "method")
)
def mel_power(
    y: jnp.ndarray, sr: int = 22050, n_fft: int = 2048, hop: int = 512,
    n_mels: int = 128, fmax: Optional[float] = None, method: str = "gemm",
) -> jnp.ndarray:
    """Waveform [T] -> mel power spectrogram [n_mels, frames]."""
    frames = frame_signal(y, n_fft, hop)
    power = stft_power(frames, n_fft, method)  # [frames, n_fft//2+1]
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmax=fmax))
    return jnp.einsum("mf,tf->mt", fb, power, preferred_element_type=jnp.float32)


def power_to_db(S: jnp.ndarray, top_db: float = 80.0, amin: float = 1e-10) -> jnp.ndarray:
    """librosa.power_to_db(ref=np.max) semantics."""
    ref = jnp.maximum(jnp.max(S), amin)
    log_spec = 10.0 * jnp.log10(jnp.maximum(S, amin)) - 10.0 * jnp.log10(ref)
    return jnp.maximum(log_spec, jnp.max(log_spec) - top_db)


def minmax_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.normalize(NORM_MINMAX, 0, 255) + uint8 cast (rounds)."""
    lo, hi = jnp.min(x), jnp.max(x)
    scaled = (x - lo) * (255.0 / jnp.maximum(hi - lo, 1e-12))
    return jnp.clip(jnp.round(scaled), 0, 255)


def resize_bilinear(img: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """cv2.INTER_LINEAR-compatible resize (half-pixel centers)."""
    return jax.image.resize(img, size, method="linear")


@functools.partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "hop", "n_mels", "size", "fmax", "normalize"),
)
def mel_image(
    y: jnp.ndarray, sr: int = 22050, n_fft: int = 2048, hop: int = 512,
    n_mels: int = 128, size: int = 224, top_db: float = 80.0,
    fmax: Optional[float] = None, normalize: bool = True,
) -> jnp.ndarray:
    """Waveform [T] -> model-ready mel image [size, size, 3].

    Matches the reference's feature chain minus the JPEG write/read:
    mel -> dB -> minmax uint8 -> resize -> /255 -> ImageNet normalise."""
    S = mel_power(y, sr=sr, n_fft=n_fft, hop=hop, n_mels=n_mels, fmax=fmax)
    img = minmax_uint8(power_to_db(S, top_db=top_db))
    img = jnp.round(resize_bilinear(img, (size, size)))  # cv2 resizes uint8->uint8
    img = jnp.clip(img, 0, 255) / 255.0
    img = jnp.repeat(img[..., None], 3, axis=-1)
    if normalize:
        img = (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return img


def mel_image_batch(waves: jnp.ndarray, **kw) -> jnp.ndarray:
    """[B, T] -> [B, size, size, 3] (vmapped single-clip pipeline)."""
    return jax.vmap(lambda y: mel_image(y, **kw))(waves)
