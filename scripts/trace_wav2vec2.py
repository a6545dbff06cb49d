"""jax.profiler trace of the SwinV2-B 2D audio-branch forward (b8), printing
the top HLO ops by device self-time — locates the ~26% MFU branch's
non-GEMM costs (relayouts, softmax chains) before any optimization attempt.

Usage: python scripts/trace_wav2vec2.py [--batch 8] [--iters 3] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import functools
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from trace_ops import parse_xplane  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logdir", default="/tmp/trace_wav2vec2")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from deepfake_tpu.config import Config
    from deepfake_tpu.models.registry import build_model

    cfg = Config()
    cfg.data.modality = "paudio"
    cfg.parallel.compute_dtype = "bfloat16"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    xv = jnp.asarray(
        rng.standard_normal((args.batch, 64000)).astype(np.float32))
    init_fn = jax.jit(functools.partial(model.init, deterministic=True))
    variables = init_fn(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        xv)

    @jax.jit
    def chain(x, v, n):
        def body(_, c):
            y = model.apply(v, x + (c * 1e-30).astype(x.dtype),
                            deterministic=True)
            y = y[0] if isinstance(y, tuple) else y
            return c + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chain(xv, variables, 1))
    import shutil

    shutil.rmtree(args.logdir, ignore_errors=True)
    jax.profiler.start_trace(args.logdir)
    float(chain(xv, variables, args.iters))
    jax.profiler.stop_trace()

    planes = glob.glob(f"{args.logdir}/**/*.xplane.pb", recursive=True)
    if not planes:
        print(json.dumps({"error": "no xplane captured"}))
        return
    tool, raw = parse_xplane(planes[0], args.top)
    if raw is None:
        print(json.dumps({"error": "xplane parse failed"}))
        return
    if isinstance(raw, bytes):
        raw = raw.decode("utf-8", "replace")
    out = f"{args.logdir}/{tool}.json"
    with open(out, "w") as f:
        f.write(raw)
    print(f"[trace_wav2vec2] wrote {out}", file=sys.stderr)

    rows = json.loads(raw)[0]["rows"]
    ops = []
    for r in rows:
        c = [x["v"] for x in r["c"]]
        if c[1] != "Device" or not c[4]:
            continue
        ops.append((c[7], c[4], c[2], c[3]))
    ops.sort(key=lambda t: -t[0])
    tot = sum(t[0] for t in ops)
    print(f"per-iter total {tot / args.iters / 1e3:.2f}ms")
    cat = collections.Counter()
    for t, occ, typ, name in ops:
        m = re.search(r"layers_(\d+)", name)
        region = f"stage{m.group(1)}" if m else (
            "patch_embed" if "patch_embed" in name else "other")
        cat[(region, typ)] += t / args.iters
    for (region, typ), t in sorted(cat.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{t / 1e3:7.2f}ms {region:12s} {typ}")


if __name__ == "__main__":
    main()
