"""Host-side video decode -> fixed-shape uint8 clips.

Counterpart of the reference's extract_frames (reference: src/utils.py:22-39):
evenly-spaced seek-decode of num_frames frames via OpenCV. Differences, by
design: the decoder emits raw uint8 [T, S, S, 3] RGB (resize only) and ALL
float work (normalise/augment) runs on device (deepfake_tpu.ops.image);
short clips are padded by repeating the last frame so shapes stay static
(the reference silently returns fewer frames on read failure, src/utils.py:36
— a ragged-shape hazard its collate never handles).

A C++ decode worker (deepfake_tpu/native) can replace the per-frame Python
loop; this module is the functional reference and fallback.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def extract_frames(
    video_path: str, num_frames: int = 32, target_size: int = 224,
    method: str = "seek",
) -> np.ndarray:
    """[num_frames, target_size, target_size, 3] uint8 RGB. Uses the native
    C++ decoder when built (deepfake_tpu/native), else Python OpenCV.
    method='sequential' stream-decodes once instead of 32 random seeks."""
    from deepfake_tpu import native

    if native.available():
        out = native.decode_clip(video_path, num_frames, target_size, method)
        if out is not None:
            return out
    import cv2

    cap = cv2.VideoCapture(video_path)
    try:
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        interval = max(total // num_frames, 1)
        out = np.zeros((num_frames, target_size, target_size, 3), np.uint8)
        got = 0
        for i in range(num_frames):
            cap.set(cv2.CAP_PROP_POS_FRAMES, i * interval)
            ok, frame = cap.read()
            if not ok:
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            out[i] = cv2.resize(
                frame, (target_size, target_size), interpolation=cv2.INTER_LINEAR
            )
            got += 1
        if 0 < got < num_frames:
            out[got:] = out[got - 1]  # static shape: repeat last decoded frame
        return out
    finally:
        cap.release()


def sequential_frames(
    video_path: str, target_size: int = 224, max_frames: Optional[int] = None
) -> np.ndarray:
    """Decode ALL frames sequentially (no seeks) — feeder for the long-video
    sliding-window chunker. [N, S, S, 3] uint8. Uses the native C++
    sequential decoder when built (one pass, no Python per-frame overhead)."""
    from deepfake_tpu import native

    if native.available():
        if max_frames is not None:
            out = native.decode_sequential(video_path, target_size, max_frames)
            if out is not None and len(out):
                return out
        else:
            # CAP_PROP_FRAME_COUNT is an ESTIMATE (duration*fps) for many
            # containers. Size the buffer one frame PAST the estimate: the
            # decoder hitting EOF before filling it proves the count is
            # exact; filling it means the metadata UNDERSTATED the stream,
            # so grow and retry (bounded), else read to EOF in Python —
            # never silently truncate the long-video scoring path.
            import cv2

            cap = cv2.VideoCapture(video_path)
            total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            cap.release()
            alloc = total + 1
            while total > 0:
                out = native.decode_sequential(video_path, target_size, alloc)
                if out is None:
                    break
                if len(out) < alloc:
                    if len(out):
                        return out
                    break
                if alloc > 8 * max(total, 1):
                    break  # metadata hopeless: Python EOF fallback
                alloc *= 2
    import cv2

    cap = cv2.VideoCapture(video_path)
    frames = []
    try:
        while True:
            ok, frame = cap.read()
            if not ok or (max_frames and len(frames) >= max_frames):
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            frames.append(
                cv2.resize(frame, (target_size, target_size),
                           interpolation=cv2.INTER_LINEAR)
            )
    finally:
        cap.release()
    if not frames:
        return np.zeros((0, target_size, target_size, 3), np.uint8)
    return np.stack(frames)
