"""Long-video handling + dataset directory re-sharding.

* sliding_windows / chunk_frames — fixed-shape sliding-window chunking of
  long videos into [chunk, S, S, 3] clips (the BASELINE north-star's reading
  of the reference's long-data handling; the reference itself only ever
  subsamples 32 evenly-spaced frames regardless of length,
  src/utils.py:27-29). Fixed chunk shapes mean zero recompilation; per-clip
  scores aggregate back to one video score.

* reshard_directory — counterpart of the reference's one-shot script that
  buckets huge train/val directories into sub_dir{N} of 10,000 files
  (reference: data/long_data_split.py:1-26), with a dry-run mode and without
  its off-by-one bucket accounting.
"""

from __future__ import annotations

import os
import shutil
from typing import Iterator, List, Sequence, Tuple

import numpy as np


def sliding_windows(total: int, chunk: int, stride: int) -> List[Tuple[int, int]]:
    """[(start, length)] covering `total` frames with fixed-size windows.
    The final window is right-aligned so every frame is covered without
    ragged shapes."""
    if total <= 0:
        return []
    if total <= chunk:
        return [(0, total)]
    starts = list(range(0, total - chunk + 1, stride))
    if starts[-1] + chunk < total:
        starts.append(total - chunk)
    return [(s, chunk) for s in starts]


def chunk_frames(frames: np.ndarray, chunk: int, stride: int) -> np.ndarray:
    """[N, S, S, 3] -> [n_windows, chunk, S, S, 3]; short videos pad by
    repeating the last frame (static shapes)."""
    n = frames.shape[0]
    wins = sliding_windows(n, chunk, stride)
    if not wins:
        return np.zeros((0, chunk) + frames.shape[1:], frames.dtype)
    out = np.zeros((len(wins), chunk) + frames.shape[1:], frames.dtype)
    for i, (s, ln) in enumerate(wins):
        out[i, :ln] = frames[s:s + ln]
        if ln < chunk:
            out[i, ln:] = frames[s + ln - 1]
    return out


def aggregate_window_scores(scores: Sequence[float], method: str = "mean") -> float:
    """Window scores -> one clip score. mean | max | top3."""
    s = np.asarray(scores, np.float32)
    if s.size == 0:
        return float("nan")
    if method == "max":
        return float(s.max())
    if method == "top3":
        return float(np.sort(s)[-3:].mean())
    return float(s.mean())


def reshard_directory(
    parent_dir: str, files_per_shard: int = 10000, prefix: str = "sub_dir",
    dry_run: bool = False,
) -> List[str]:
    """Move loose files in parent_dir into {prefix}{N}/ buckets of
    files_per_shard. Returns the shard directories created."""
    entries = sorted(
        f for f in os.listdir(parent_dir)
        if os.path.isfile(os.path.join(parent_dir, f))
    )
    shards = []
    for i in range(0, len(entries), files_per_shard):
        shard = os.path.join(parent_dir, f"{prefix}{i // files_per_shard + 1}")
        shards.append(shard)
        if dry_run:
            continue
        os.makedirs(shard, exist_ok=True)
        for f in entries[i:i + files_per_shard]:
            shutil.move(os.path.join(parent_dir, f), os.path.join(shard, f))
    return shards


def iter_sharded_files(parent_dir: str) -> Iterator[str]:
    """Walk a (possibly re-sharded) dataset directory uniformly."""
    for root, _dirs, files in os.walk(parent_dir):
        for f in sorted(files):
            yield os.path.join(root, f)
