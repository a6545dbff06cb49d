"""Per-layer timing of the Inception-ResNet-v2 stem (the fused model's
lowest-MFU section, BASELINE_MEASURED.md stage profile) plus A/B variants:
space-to-depth first conv, and the full stem for cross-checking.

    python scripts/bench_stem.py [--frames 256] [--iters 20]

One JSON line per measurement; timing methodology = bench.py (carry-chained
jitted calls, overhead cancelled — the tunnel acks dispatch, see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timed_fn(fn, variables, feature, iters: int, repeats: int = 2):
    """bench.timed_per_iter generalised to any fn(variables, feature)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(variables, carry, feature):
        feat = jax.tree.map(lambda x: x + (carry * 1e-30).astype(x.dtype), feature)
        out = fn(variables, feat)
        return carry + sum(
            jnp.sum(o.astype(jnp.float32)) for o in jax.tree_util.tree_leaves(out)
        )

    def measure(n):
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            carry = step(variables, carry, feature)
        float(carry)
        return time.perf_counter() - t0

    float(step(variables, jnp.float32(0.0), feature))
    measure(1)
    samples = []
    for _ in range(repeats):
        t_low = min(measure(1) for _ in range(2))
        t_high = min(measure(1 + iters) for _ in range(2))
        samples.append((t_high - t_low) / iters)
    return min(samples)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=256)  # b8 x 32 frames
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache
    from deepfake_tpu.models.inception_resnet_v2 import Stem
    from deepfake_tpu.models.layers import ConvBnRelu, max_pool_torch

    _enable_compile_cache()
    d = jnp.dtype(args.dtype)
    F = args.frames
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def t_layer(name, module, shape, fn=None):
        x = jnp.asarray(rng.standard_normal(shape, np.float32) * 0.5, d)
        if module is not None:
            v = jax.jit(module.init)(key, x)
            fn = lambda v, x: module.apply(v, x)
        else:
            v = {}
        per = timed_fn(fn, v, x, args.iters)
        print(json.dumps({"layer": name, "ms": round(per * 1e3, 3),
                          "in_shape": list(shape)}), flush=True)
        return per

    total = 0.0
    total += t_layer("cast_f32_to_bf16", None, (F, 224, 224, 3),
                     fn=lambda v, x: x.astype(d) * 1.0000001)
    total += t_layer("f0_3x3s2_3to32", ConvBnRelu(32, (3, 3), 2, "VALID", use_bias=False, dtype=d),
                     (F, 224, 224, 3))
    total += t_layer("f1_3x3_32to32", ConvBnRelu(32, (3, 3), 1, "VALID", use_bias=False, dtype=d),
                     (F, 111, 111, 32))
    total += t_layer("f2_3x3_32to64", ConvBnRelu(64, (3, 3), 1, 1, use_bias=False, dtype=d),
                     (F, 109, 109, 32))
    total += t_layer("pool1_3x3s2", None, (F, 109, 109, 64),
                     fn=lambda v, x: max_pool_torch(x, 3, 2))
    total += t_layer("f4_1x1_64to80", ConvBnRelu(80, (1, 1), 1, 0, use_bias=False, dtype=d),
                     (F, 54, 54, 64))
    total += t_layer("f5_3x3_80to192", ConvBnRelu(192, (3, 3), 1, "VALID", use_bias=False, dtype=d),
                     (F, 54, 54, 80))
    total += t_layer("pool2_3x3s2", None, (F, 52, 52, 192),
                     fn=lambda v, x: max_pool_torch(x, 3, 2))

    stem = Stem(dtype=d)
    x = jnp.asarray(rng.standard_normal((F, 224, 224, 3), np.float32) * 0.5)
    v = jax.jit(stem.init)(key, x)
    per = timed_fn(lambda v, x: stem.apply(v, x), v, x, args.iters)
    print(json.dumps({"layer": "FULL_STEM (f32 in)", "ms": round(per * 1e3, 3),
                      "sum_of_parts_to_pool2_ms": round(total * 1e3, 3)}), flush=True)

    # A/B: space-to-depth first conv — [F,224,224,3] -> [F,112,112,12],
    # then 2x2 stride-1 VALID conv to 32ch (mathematically equivalent taps)
    s2d_conv = ConvBnRelu(32, (2, 2), 1, "VALID", use_bias=False, dtype=d)
    xs = jnp.asarray(rng.standard_normal((F, 112, 112, 12), np.float32) * 0.5, d)
    vs = jax.jit(s2d_conv.init)(key, xs)

    def s2d_fn(v, x):
        # includes the on-device rearrange from the raw frame layout
        B, H, W, C = x.shape
        y = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(B, H // 2, W // 2, 4 * C)
        return s2d_conv.apply(v, y)[:, :111, :111, :]

    x_raw = jnp.asarray(rng.standard_normal((F, 224, 224, 3), np.float32) * 0.5, d)
    per = timed_fn(s2d_fn, vs, x_raw, args.iters)
    print(json.dumps({"layer": "f0_s2d_2x2_12to32 (incl. rearrange)",
                      "ms": round(per * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
