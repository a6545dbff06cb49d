"""Trace the config-2 forward (Video Swin-T, 16 frames, batch 1 — the
weakest vs_baseline config) and print the top HLO ops by self-time, to find
whether the b1 budget is attention, relayouts, or launch/DMA latency
(VERDICT r3 next #6).

Usage: python scripts/trace_config2.py [--iters 5] [--top 40]
"""

from __future__ import annotations

import argparse
import functools
import glob
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from trace_ops import parse_xplane  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logdir", default="/tmp/trace_c2")
    p.add_argument("--no_bias_cache", action="store_true",
                   help="disable the weight-load-time bias cache (A/B: the "
                        "round-4 pre-cache attribution)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from deepfake_tpu.config import Config
    from deepfake_tpu.models.registry import (
        build_model, cast_inference_params, example_inputs,
    )
    from deepfake_tpu.models.swin3d import maybe_window_feed

    cfg = Config()
    cfg.data.modality = "video_swin"
    cfg.data.num_frames = 16
    cfg.model.swin3d_depths = (2, 2, 6, 2)
    cfg.parallel.compute_dtype = "bfloat16"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    (ex,) = example_inputs(cfg, batch=args.batch)
    x_np = rng.standard_normal(ex.shape).astype(np.float32) * 0.5
    b, t, s, s2, c = x_np.shape
    wf = maybe_window_feed(x_np, cfg.model.swin3d_patch, cfg.model.swin3d_window,
                           embed_dim=cfg.model.swin3d_embed_dim,
                           use_pallas=cfg.model.swin3d_pallas_attn)
    xv = jnp.asarray(wf) if wf is not None else jnp.asarray(
        x_np.reshape(b, t, s, s2 * c))
    print(f"feed: {'windowed' if wf is not None else 'folded'} {xv.shape}",
          file=sys.stderr)
    init_fn = jax.jit(functools.partial(model.init, deterministic=True))
    variables = init_fn(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, xv)
    variables = cast_inference_params(variables, cfg)
    if not args.no_bias_cache:
        from deepfake_tpu.models.registry import precompute_bias_cache

        variables = precompute_bias_cache(model, variables, xv, cfg=cfg)

    @jax.jit
    def chain(x, v, n):
        def body(_, carry):
            out = model.apply(v, x + (carry * 1e-30).astype(x.dtype),
                              deterministic=True)
            y = out[0] if isinstance(out, tuple) else out
            return carry + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chain(xv, variables, 1))  # compile outside the trace

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
        print(json.dumps({"error": "xplane parse failed", "file": planes[0]}))
        return
    if isinstance(raw, bytes):
        raw = raw.decode("utf-8", "replace")
    out = f"{args.logdir}/{tool}.json"
    with open(out, "w") as f:
        f.write(raw)
    print(f"[trace_config2] wrote {out} ({len(raw)} bytes)", file=sys.stderr)
    try:
        data = json.loads(raw)
    except Exception:
        print(f"[trace_config2] raw output not JSON; inspect {out}")
        return
    # Aggregate the framework_op_stats table into something a doc can hold:
    # per-op-type device self-time and the top individual ops.
    tbl = data[0]
    cols = [c["id"] for c in tbl["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in r["c"]])) for r in tbl["rows"]]
    dev = [r for r in rows if r.get("host_or_device") == "Device"]
    total = sum(r["total_self_time"] for r in dev) or 1.0
    from collections import defaultdict

    agg = defaultdict(lambda: [0.0, 0.0])
    for r in dev:
        agg[r["type"]][0] += r["total_self_time"]
        agg[r["type"]][1] += r.get("occurrences", 0)
    n = args.iters
    print(f"device self-time covered by top-{args.top} rows: "
          f"{total / (1000 * n):.3f} ms/iter over {n} iters")
    print(json.dumps({
        "by_type_ms_per_iter": {
            t: round(v[0] / (1000 * n), 3)
            for t, v in sorted(agg.items(), key=lambda kv: -kv[1][0])},
        "top_ops": [
            {"type": r["type"],
             "ms_per_iter": round(r["total_self_time"] / (1000 * n), 3),
             "occ": r.get("occurrences"),
             "op": "/".join(r["operation"].split("/")[2:])[:110]}
            for r in sorted(dev, key=lambda r: -r["total_self_time"])[:12]],
    }, indent=1))


if __name__ == "__main__":
    main()
