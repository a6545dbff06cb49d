"""Kernel A/B benchmark: XLA einsum windowed attention vs the fused Pallas
kernel, inside full Swin forwards on real TPU hardware.

    python scripts/bench_kernels.py [--batch 8] [--iters 20]

Prints one JSON line per configuration. Uses the same serialized-loop timing
as bench.py (the tunnel acks dispatch before execution).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import timed_throughput
    from deepfake_tpu.models.swin2d import SwinTransformerV2
    from deepfake_tpu.models.swin3d import VideoClassifier

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    def run(name, model_a, model_b, x):
        init_fn = jax.jit(functools.partial(model_a.init, deterministic=True))
        variables = init_fn({"params": jax.random.PRNGKey(0)}, x)
        for tag, model in (("xla", model_a), ("pallas", model_b)):
            cps = timed_throughput(model, variables, x, args.batch, args.iters)
            print(json.dumps({
                "metric": f"{name}_{tag}_clips_per_sec_b{args.batch}_{args.dtype}",
                "value": round(cps, 2), "unit": "clips/s",
            }))

    # SwinV2-B @224 (the audio branch config, reference train.py:35)
    kw = dict(img_size=224, num_classes=1, embed_dim=128, depths=(2, 2, 18, 2),
              num_heads=(4, 8, 16, 32), window_size=7,
              pretrained_window_sizes=(16, 16, 16, 16), drop_path_rate=0.0,
              dtype=dtype)
    x = jnp.asarray(rng.standard_normal((args.batch, 224, 224, 3)), jnp.float32)
    run("swin2d_b224", SwinTransformerV2(**kw, use_pallas=False),
        SwinTransformerV2(**kw, use_pallas=True), x)

    # Video Swin 3D @16x224x224 (canonical config, reference :773-780)
    kw3 = dict(num_classes=1, embed_dim=96, depths=(2, 2, 18, 2),
               num_heads=(3, 6, 12, 24), patch_size=(2, 4, 4),
               window_size=(8, 7, 7), drop_path_rate=0.0, classify_drop=0.0,
               dtype=dtype)
    xv = jnp.asarray(
        rng.standard_normal((max(args.batch // 4, 1), 16, 224, 224, 3)), jnp.float32
    )
    run("swin3d_16f224", VideoClassifier(**kw3, use_pallas=False),
        VideoClassifier(**kw3, use_pallas=True), xv)


if __name__ == "__main__":
    main()
