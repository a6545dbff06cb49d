"""Decode-scaling curve: host ingest throughput (decode -> assembled host
batches, NO device work) vs worker count (VERDICT r3 next #5 — the '~60
decode cores saturate one chip' claim needs a measured slope).

On this 1-core box workers > 1 can only buy pipeline overlap, not parallel
decode — the curve's plateau IS the per-core decode rate; the chip-saturation
estimate divides the device-side clips/s by this number.

    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/bench_decode_scaling.py \
        [--clips 24] [--workers 1,2,4] [--loader native]

One JSON line per worker count.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: F401


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=24)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--workers", type=str, default="1,2,4")
    p.add_argument("--loader", choices=["auto", "native", "python"],
                   default="auto")
    args = p.parse_args()

    from deepfake_tpu.config import Config
    from deepfake_tpu.data.dataset import DeepFakeDataModule
    from deepfake_tpu.data.synthetic import make_synthetic_testset

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_testset(root, args.clips)
        for w in [int(x) for x in args.workers.split(",")]:
            cfg = Config()
            cfg.data.modality = "fused"
            cfg.data.data_root = root
            cfg.optim.batch_size = args.batch
            cfg.data.num_workers = w
            if args.loader != "auto":
                cfg.data.use_native_ingest = args.loader == "native"
            pred = f"{root}/pred_w{w}.csv"
            open(pred, "w").close()
            dm = DeepFakeDataModule(cfg, prediction_csv=pred).setup("test")
            loader = dm.test_dataloader()
            n = 0
            t0 = time.perf_counter()
            for _features, labels, _names in loader:
                n += len(labels)
            dt = time.perf_counter() - t0
            from deepfake_tpu import native

            kind = ("native" if (cfg.data.use_native_ingest and native.available())
                    else "python")
            print(json.dumps({
                "metric": "decode_clips_per_sec",
                "workers": w,
                "value": round(n / dt, 3),
                "clips": n,
                "loader": kind,
                "note": "host decode+assembly only, no device",
            }), flush=True)


if __name__ == "__main__":
    main()
