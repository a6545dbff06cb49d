"""On-device polyphase windowed-sinc resampling.

The reference's audio chain resamples twice: FFmpeg demux emits 16 kHz PCM
(reference: src/utils.py:45-46,66-67) and librosa.load then resamples that to
its default 22.05 kHz before the mel transform (reference: src/utils.py:70).
This module implements the second stage on device so the mel filterbank sees
audio at its labeled sample rate: a polyphase FIR with the exact filter
design of scipy.signal.resample_poly's default (kaiser window beta=5.0,
half length 10*max(up, down), cutoff 1/max(up, down) of the upsampled
Nyquist) — numerically equivalent to resample_poly, and a close stand-in for
librosa's soxr_hq (both are high-order lowpass polyphase designs; the mel
image is min-max uint8-quantised downstream, swamping the kernel delta).

Execution model: all index/phase math is static numpy (shapes are static per
waveform bucket), so the jitted computation is a gather of input windows and
a weighted reduction — fused by XLA, no FFTs, no dynamic shapes.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _design(up: int, down: int) -> Tuple[np.ndarray, int, int]:
    """Polyphase filter bank for up/down (coprime). Returns
    (W [up, taps] float32, n_pre_remove, taps): output m of the resampler is
      y[m] = sum_t W[p(m), t] * x[q(m) - t]
    with md = (m + n_pre_remove) * down, q = md // up, p = md % up — the
    direct-gather form of scipy.signal.resample_poly's upfirdn + slice."""
    from scipy.signal import firwin

    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, 1.0 / max_rate, window=("kaiser", 5.0))
    h = (h * up).astype(np.float64)
    n_pre_pad = down - half_len % down
    n_pre_remove = (half_len + n_pre_pad) // down
    h = np.concatenate([np.zeros(n_pre_pad), h])
    taps = -(-len(h) // up)
    h = np.concatenate([h, np.zeros(taps * up - len(h))])
    W = h.reshape(taps, up).T.astype(np.float32)  # W[p, t] = h[t*up + p]
    return W, n_pre_remove, taps


def resampled_length(length, sr_in: int, sr_out: int):
    """Valid-sample count after resampling (scipy output-length convention:
    ceil(n * up / down)). Works on python ints and traced jnp int arrays."""
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    return (length * up + down - 1) // down


def resample(wave: jnp.ndarray, sr_in: int, sr_out: int) -> jnp.ndarray:
    """[..., T] at sr_in -> [..., ceil(T*sr_out/sr_in)] at sr_out.
    Identity when the rates agree. Matches scipy.signal.resample_poly
    (zero-extended edges — consistent with resampling a bucket-padded row)."""
    if sr_in == sr_out:
        return wave
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    W, n_pre_remove, taps = _design(up, down)
    T = wave.shape[-1]
    n_out = -(-T * up // down)

    m = np.arange(n_out, dtype=np.int64)
    md = (m + n_pre_remove) * down
    q = md // up
    p = (md % up).astype(np.int32)
    idx = q[:, None] - np.arange(taps, dtype=np.int64)[None, :]  # input index
    # zero-pad so every gathered index is in range (indices outside [0, T)
    # must read 0: the filter's zero-extension semantics)
    pad_lo = max(0, int(-idx.min()))
    pad_hi = max(0, int(idx.max()) - (T - 1))
    idx = (idx + pad_lo).astype(np.int32)

    pad_widths = [(0, 0)] * (wave.ndim - 1) + [(pad_lo, pad_hi)]
    x = jnp.pad(wave, pad_widths)
    windows = x[..., idx]                      # [..., n_out, taps]
    weights = jnp.asarray(W)[jnp.asarray(p)]   # [n_out, taps]
    return jnp.sum(windows * weights, axis=-1)
