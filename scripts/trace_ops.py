"""Capture a jax.profiler trace of the config-4 forward and print the top
HLO ops by self-time (parsed from the xplane.pb via xprof).

The axon tunnel acks dispatch, so wall timing lies — but the device-side
trace (if the tunnel relays it) gives true per-op attribution. Falls back
loudly if no device plane shows up.

Usage: python scripts/trace_ops.py [--batch 8] [--iters 3] [--top 40]
"""

from __future__ import annotations

import argparse
import functools
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def parse_xplane(path: str, top: int):
    from xprof.convert import _pywrap_profiler_plugin as pp

    # op_profile / framework_op_stats need the tool name; use hlo_op stats
    for tool in ("framework_op_stats", "op_profile"):
        try:
            raw, _ = pp.xspace_to_tools_data([path], tool, {})
            return tool, raw
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"[trace_ops] {tool} failed: {e}", file=sys.stderr)
    return None, None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logdir", default="/tmp/trace_c4")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from deepfake_tpu.models.swin3d import VideoClassifier, window_feed_host

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    kw3 = dict(num_classes=1, embed_dim=128, depths=(2, 2, 18, 2),
               num_heads=(4, 8, 16, 32), patch_size=(2, 4, 4),
               window_size=(8, 7, 7), drop_path_rate=0.0, classify_drop=0.0,
               dtype=dt)
    model = VideoClassifier(**kw3, use_pallas=True)
    # production feed: pre-windowed host layout (same as bench.py config 4)
    xv = jnp.asarray(window_feed_host(
        rng.standard_normal((args.batch, 32, 224, 224, 3)).astype(np.float32),
        (2, 4, 4), (8, 7, 7)))
    init_fn = jax.jit(functools.partial(model.init, deterministic=True))
    variables = init_fn({"params": jax.random.PRNGKey(0)}, xv)

    @jax.jit
    def chain(x, v, n):
        def body(_, c):
            y, _f = model.apply(v, x + (c * 1e-30).astype(x.dtype),
                                deterministic=True)
            return c + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # warm (compile) outside the trace
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
        print(json.dumps({"error": "xplane parse failed", "file": planes[0]}))
        return
    if isinstance(raw, bytes):
        raw = raw.decode("utf-8", "replace")
    out = f"{args.logdir}/{tool}.json"
    with open(out, "w") as f:
        f.write(raw)
    print(f"[trace_ops] wrote {out} ({len(raw)} bytes)", file=sys.stderr)
    # framework_op_stats is JSON-ish; try to summarize
    try:
        data = json.loads(raw)
    except Exception:
        print(f"[trace_ops] raw output not JSON; inspect {out}")
        return
    print(json.dumps(data)[:2000])


if __name__ == "__main__":
    main()
