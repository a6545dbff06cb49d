"""jax.profiler trace of one training modality's optimizer step; writes
framework_op_stats.json like scripts/trace_ops.py and prints a per-category
summary (stage x op-type, fwd vs transpose/backward where nameable).

Usage: python scripts/trace_train.py [--modality video_swin] [--batch 8]
       [--accum 1] [--iters 3]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from trace_ops import parse_xplane  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modality", default="video_swin")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--logdir", default="/tmp/trace_train")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from deepfake_tpu.config import Config
    from deepfake_tpu.models.registry import build_model
    from deepfake_tpu.train.trainer import Trainer
    from deepfake_tpu.utils.logging import Logger

    cfg = Config()
    cfg.data.modality = args.modality
    cfg.optim.batch_size = args.batch
    cfg.optim.accum_step = args.accum

    rows = args.batch * args.accum
    t, s, a = cfg.data.num_frames, cfg.data.frame_size, cfg.data.audio_size
    wave = int(cfg.data.wave_seconds_buckets[0] * cfg.data.wave_sample_rate)
    rng = np.random.default_rng(0)
    if args.modality == "fused":
        inputs_np = (
            rng.standard_normal((rows, t, s, s, 3)).astype(np.float32) * 0.5,
            rng.standard_normal((rows, a, a, 3)).astype(np.float32) * 0.5,
            rng.standard_normal((rows, wave)).astype(np.float32) * 0.5,
        )
    elif args.modality == "video_swin":
        inputs_np = rng.standard_normal((rows, t, s, s * 3)).astype(np.float32) * 0.5
    elif args.modality == "video":
        inputs_np = rng.standard_normal((rows, t, s, s, 3)).astype(np.float32) * 0.5
    elif args.modality == "audio":
        inputs_np = rng.standard_normal((rows, a, a, 3)).astype(np.float32) * 0.5
    else:
        inputs_np = rng.standard_normal((rows, wave)).astype(np.float32) * 0.5
    batch = (inputs_np, (rng.random(rows) > 0.5).astype(np.float32))

    class Data:
        def train_loader(self):
            return [batch]

        def val_loader(self):
            return [batch]

    model = build_model(cfg)
    trainer = Trainer(model, cfg, Data(), logger=Logger(None))
    inputs, labels = trainer._put_batch(*batch)
    key = jax.random.PRNGKey(1)

    def run(n):
        state = trainer.state
        for _ in range(n):
            state, metrics = trainer._train_step(state, inputs, labels, key)
        float(jax.device_get(metrics["loss"]))
        trainer.state = state

    run(1)  # compile outside the trace
    import shutil

    shutil.rmtree(args.logdir, ignore_errors=True)
    jax.profiler.start_trace(args.logdir)
    run(args.iters)
    jax.profiler.stop_trace()

    planes = glob.glob(f"{args.logdir}/**/*.xplane.pb", recursive=True)
    if not planes:
        print(json.dumps({"error": "no xplane captured"}))
        return
    tool, raw = parse_xplane(planes[0], 40)
    if raw is None:
        print(json.dumps({"error": "xplane parse failed"}))
        return
    if isinstance(raw, bytes):
        raw = raw.decode("utf-8", "replace")
    out = f"{args.logdir}/{tool}.json"
    with open(out, "w") as f:
        f.write(raw)
    print(f"[trace_train] wrote {out} ({len(raw)} bytes)", file=sys.stderr)

    data = json.loads(raw)
    rows_ = data[0]["rows"]
    agg = collections.Counter()
    occ = collections.Counter()
    tot = 0.0
    for r in rows_:
        c = [x["v"] for x in r["c"]]
        _rank, hd, typ, name, o, _t, _avg, tself = c[:8]
        if hd != "Device":
            continue
        tot += tself
        m = re.search(
            r"(layers_\d+|patch_embed|classifier|jit\(_take\)|transpose\[)",
            name,
        )
        where = m.group(1) if m else "other"
        stage = re.sub(r"layers_(\d+).*", r"stage\1", where)
        bwd = "bwd" if ("transpose[" in name or "/vjp" in name
                        or "grad" in name.lower()) else ""
        agg[(stage, typ, bwd)] += tself
        occ[(stage, typ, bwd)] += o
    print(f"per-iter total {tot / args.iters / 1000:.2f}ms")
    for (k, typ2, bwd), v in sorted(agg.items(), key=lambda kv: -kv[1]):
        if v / args.iters / 1000 < 0.3:
            continue
        print(f"{v / args.iters / 1000:7.2f}ms x{occ[(k, typ2, bwd)] / args.iters:5.0f}"
              f"  {k:12s} {typ2:24s} {bwd}")


if __name__ == "__main__":
    main()
