"""ctypes bindings for the native ingest library (see ingest.cpp).

available() gates every call site: the data layer transparently falls back to
the Python/OpenCV path when the .so has not been built
(python -m deepfake_tpu.native.build).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libdfingest.so")
_lib = None
_lib_lock = threading.Lock()


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.df_decode_clip.restype = ctypes.c_int
        lib.df_decode_clip.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.df_decode_clip_seq.restype = ctypes.c_int
        lib.df_decode_clip_seq.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.df_decode_sequential.restype = ctypes.c_long
        lib.df_decode_sequential.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_long, ctypes.c_void_p,
        ]
        lib.df_decode_audio.restype = ctypes.c_long
        lib.df_decode_audio.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_long,
        ]
        lib.df_ingest_create.restype = ctypes.c_void_p
        lib.df_ingest_create.argtypes = [ctypes.c_int] * 4 + [
            ctypes.c_int, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ]
        lib.df_ingest_destroy.argtypes = [ctypes.c_void_p]
        lib.df_ingest_submit.restype = ctypes.c_int
        lib.df_ingest_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
        if hasattr(lib, "df_ingest_submit_opts"):
            lib.df_ingest_submit_opts.restype = ctypes.c_int
            lib.df_ingest_submit_opts.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
            ]
        lib.df_ingest_next.restype = ctypes.c_long
        lib.df_ingest_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ]
        lib.df_ingest_pending.restype = ctypes.c_long
        lib.df_ingest_pending.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_clip(path: str, num_frames: int, size: int,
                method: str = "seek") -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty((num_frames, size, size, 3), np.uint8)
    fn = lib.df_decode_clip if method == "seek" else lib.df_decode_clip_seq
    got = fn(path.encode(), num_frames, size,
             out.ctypes.data_as(ctypes.c_void_p))
    return out if got >= 0 else None


def decode_sequential(path: str, size: int, max_frames: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty((max_frames, size, size, 3), np.uint8)
    n = lib.df_decode_sequential(path.encode(), size, max_frames,
                                 out.ctypes.data_as(ctypes.c_void_p))
    return out[:n] if n >= 0 else None


def decode_audio(path: str, sample_rate: int, max_seconds: float = 60.0
                 ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    max_samples = int(max_seconds * sample_rate)
    out = np.empty(max_samples, np.float32)
    n = lib.df_decode_audio(path.encode(), sample_rate,
                            out.ctypes.data_as(ctypes.c_void_p), max_samples)
    if n < 0:
        return None
    return out[:n].copy()


class IngestService:
    """Worker-pool + ring-buffer decoder (see ingest.cpp). Submit paths,
    collect (tag, frames, audio, audio_len) in completion order."""

    def __init__(self, workers: int = 4, slots: int = 8, num_frames: int = 32,
                 size: int = 224, sample_rate: int = 16000,
                 max_samples: int = 16000 * 16, want_video: bool = True,
                 want_audio: bool = True):
        lib = _load()
        if lib is None:
            raise RuntimeError("native ingest library not built")
        self._lib = lib
        self.num_frames, self.size = num_frames, size
        self.max_samples = max_samples
        self.want_video, self.want_audio = want_video, want_audio
        self._h = lib.df_ingest_create(
            workers, slots, num_frames, size, sample_rate, max_samples,
            int(want_video), int(want_audio),
        )

    def submit(self, path: str, tag: int, want_audio: bool = True):
        """want_audio=False skips the audio demux for this item (the loader
        passes False when an offline PCM sidecar exists — worker time then
        goes entirely to video decode); the item's audio_len comes back 0."""
        if not want_audio and hasattr(self._lib, "df_ingest_submit_opts"):
            self._lib.df_ingest_submit_opts(self._h, path.encode(), tag, 0)
        else:
            self._lib.df_ingest_submit(self._h, path.encode(), tag)

    def pending(self) -> int:
        return self._lib.df_ingest_pending(self._h)

    def next(self) -> Optional[Tuple[int, Optional[np.ndarray], Optional[np.ndarray], int]]:
        """(tag, frames, audio, audio_len) in completion order. frames is
        None when video decode FAILED for that clip (the slot buffer is
        recycled and would hold stale data) — callers must host-decode."""
        frames = (
            np.empty((self.num_frames, self.size, self.size, 3), np.uint8)
            if self.want_video else None
        )
        audio = np.empty(self.max_samples, np.float32) if self.want_audio else None
        alen = ctypes.c_long(0)
        fdec = ctypes.c_int(0)
        tag = self._lib.df_ingest_next(
            self._h,
            frames.ctypes.data_as(ctypes.c_void_p) if frames is not None else None,
            audio.ctypes.data_as(ctypes.c_void_p) if audio is not None else None,
            ctypes.byref(alen),
            ctypes.byref(fdec),
        )
        if tag < 0:
            return None
        if self.want_video and fdec.value <= 0:
            frames = None  # decode failure: never surface recycled slot data
        return int(tag), frames, audio, int(alen.value)

    def close(self):
        if self._h:
            self._lib.df_ingest_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
