"""Capture an xprof trace of the fused forward (and optionally a train step)
for kernel-level analysis.

    python scripts/profile_fused.py [--batch 8] [--out /tmp/xprof]

View with tensorboard --logdir <out> (or xprof tooling).
"""

from __future__ import annotations

import argparse
import functools
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out", type=str, default="/tmp/xprof")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache
    from deepfake_tpu.config import Config
    from deepfake_tpu.models.registry import build_model, example_inputs

    _enable_compile_cache()
    cfg = Config()
    cfg.data.modality = "fused"
    cfg.parallel.compute_dtype = "bfloat16"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    inputs = jax.tree.map(
        lambda x: jnp.asarray(rng.standard_normal(x.shape).astype(np.float32) * 0.5),
        example_inputs(cfg, batch=args.batch),
    )
    init_fn = jax.jit(functools.partial(model.init, deterministic=True))
    v = init_fn(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, *inputs
    )
    f = jax.jit(
        lambda v, x: jnp.sum(model.apply(v, x, deterministic=True).astype(jnp.float32))
    )
    float(f(v, inputs[0]))  # compile + warm

    jax.profiler.start_trace(args.out)
    for i in range(args.iters):
        with jax.profiler.StepTraceAnnotation("fused_fwd", step_num=i):
            s = float(f(v, inputs[0]))
    jax.profiler.stop_trace()
    print(f"trace written to {args.out} (last sum={s:.4g})")


if __name__ == "__main__":
    main()
