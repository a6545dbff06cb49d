"""BASELINE config #5: end-to-end submission throughput (decode -> features ->
fused forward -> prediction.csv) over a synthetic test set with the prefetch
pipeline.

    python scripts/bench_e2e.py [--clips 32] [--batch 8] [--tiny]

Prints one JSON line: end-to-end clips/sec including host decode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


from deepfake_tpu.data.synthetic import make_synthetic_testset  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--tiny", action="store_true", help="reduced model (CPU smoke)")
    p.add_argument("--loader", choices=["auto", "native", "python"], default="auto",
                   help="ring-buffer C++ ingest vs per-sample Python threads")
    p.add_argument("--chunked", action="store_true",
                   help="long-video sliding-window mode (submit_chunked)")
    p.add_argument("--decode_ahead", type=int, default=2,
                   help="chunked mode: background decode workers "
                        "(1 = serial decode/compute)")
    p.add_argument("--chunk_clip_frames", type=int, default=96,
                   help="chunked mode: frames per synthetic clip")
    args = p.parse_args()

    from deepfake_tpu.config import Config
    from deepfake_tpu.data.dataset import DeepFakeDataModule
    from deepfake_tpu.models.registry import build_model
    from deepfake_tpu.train.submit import SubmitCtl
    from deepfake_tpu.utils.logging import Logger

    cfg = Config()
    cfg.data.modality = "fused"
    cfg.optim.batch_size = args.batch
    cfg.data.num_workers = args.workers
    if args.loader != "auto":
        cfg.data.use_native_ingest = args.loader == "native"
    if args.tiny:
        cfg.data.num_frames = 2
        cfg.data.frame_size = 96
        cfg.data.audio_size = 56
        cfg.data.wave_seconds_buckets = (1.0,)
        cfg.model.swin2d_embed_dim = 32
        cfg.model.swin2d_depths = (2, 2)
        cfg.model.swin2d_heads = (2, 4)
        cfg.model.wav_layers = 2
        cfg.model.wav_hidden = 64
        cfg.model.wav_heads = 4
        cfg.model.wav_intermediate = 128
        cfg.model.wav_conv_dim = 32

    if args.chunked:
        cfg.data.modality = "video_swin"
        if args.tiny:
            cfg.model.swin3d_embed_dim = 32
            cfg.model.swin3d_depths = (2, 2)
            cfg.model.swin3d_heads = (2, 4)
            cfg.data.chunk_frames = 8
            cfg.data.chunk_stride = 8

    with tempfile.TemporaryDirectory() as root:
        cfg.data.data_root = root
        make_synthetic_testset(
            root, args.clips,
            frames=args.chunk_clip_frames if args.chunked else 48,
            size=cfg.data.frame_size if args.tiny else 256,
        )
        pred = os.path.join(root, "prediction.csv")
        model = build_model(cfg)
        dm = DeepFakeDataModule(cfg, prediction_csv=pred).setup("test")
        ctl = SubmitCtl(model, cfg, dm, logger=Logger(None), prediction_csv=pred)

        if args.chunked:
            # warm-up: score one clip (compiles the window batch program),
            # then time the decode-overlapped chunked submission
            ctl.score_long_video(
                os.path.join(root, "phase2", "testset1seen", "clip_0.mp4")
            )
            t0 = time.perf_counter()
            result = ctl.submit_chunked(decode_ahead=args.decode_ahead)
            dt = time.perf_counter() - t0
            assert len(result) == args.clips
            print(json.dumps({
                "metric": "e2e_chunked_clips_per_sec"
                          + ("_tiny" if args.tiny else ""),
                "value": round(args.clips / dt, 3),
                "unit": "clips/s",
                "decode_ahead": args.decode_ahead,
                "frames_per_clip": args.chunk_clip_frames,
                "note": "sequential decode + sliding-window scoring, "
                        "compile excluded",
            }))
            return

        # warm-up pass over one batch (XLA compiles for forward + mel) ...
        warm_names = list(dm.testset.names)
        dm.testset.names = warm_names[: args.batch]
        ctl.submit()
        os.remove(pred)
        open(pred, "w").close()
        # ... then the timed full run: decode -> device features -> fused
        # forward -> prediction.csv, with the prefetch pipeline
        dm2 = DeepFakeDataModule(cfg, prediction_csv=pred).setup("test")
        ctl.data = dm2
        t0 = time.perf_counter()
        result = ctl.submit()
        dt = time.perf_counter() - t0
        assert len(result) == args.clips
        from deepfake_tpu import native

        loader = (
            "native" if (cfg.data.use_native_ingest and native.available())
            else "python"
        )
        print(json.dumps({
            "metric": "e2e_submit_clips_per_sec" + ("_tiny" if args.tiny else ""),
            "value": round(args.clips / dt, 3),
            "unit": "clips/s",
            "loader": loader,
            "workers": args.workers,
            "note": "decode+features+forward+csv, compile excluded",
        }))


if __name__ == "__main__":
    main()
