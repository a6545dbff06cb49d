"""A/B experiments for the Video Swin 3D hot path (b8, stage shapes).

1. NHC kernel: f32 dot inputs (current) vs bf16 dot inputs (MXU native rate)
2. MLP: XLA exact-gelu (current) vs gelu variants vs fused Pallas chain
3. per-block relative-position bias expansion (table gather + transpose) cost

Usage: python scripts/bench_swin3d_opts.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from profile_swin3d import timed_fn  # noqa: E402  (same tunnel-safe timing)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from deepfake_tpu.models.swin3d import compute_mask_3d
    from deepfake_tpu.ops.pallas_window_attn import pallas_window_attention_nhc

    B = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    N = 392
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32), dt)

    stages = [
        (16, 56, 56, 128, 4, 2),
        (16, 28, 28, 256, 8, 2),
        (16, 14, 14, 512, 16, 18),
        (16, 7, 7, 1024, 32, 2),
    ]
    out = {}
    for (D, H, W, C, heads, depth) in stages:
        tag = f"C{C}"
        nW = (D // 8) * (H // 7) * (W // 7)
        B_ = B * nW
        mask = jnp.asarray(compute_mask_3d(D, H, W, (8, 7, 7),
                                           (4, 3 if H > 7 else 0, 3 if W > 7 else 0)))
        bias = jnp.asarray(rng.standard_normal((heads, N, N)), jnp.float32)
        q, k, v = r(B_, N, C), r(B_, N, C), r(B_, N, C)

        # 1: kernel dtype A/B
        f32k = lambda q, k, v, b, m: pallas_window_attention_nhc(
            q, k, v, num_heads=heads, bias=b, mask=m, scale=0.177)
        bf16k = lambda q, k, v, b, m: pallas_window_attention_nhc(
            q, k, v, num_heads=heads, bias=b, mask=m, scale=0.177,
            mxu_bf16=True)
        t32 = timed_fn(f32k, (q, k, v, bias, mask), args.iters) * 1e3
        try:
            t16 = timed_fn(bf16k, (q, k, v, bias, mask), args.iters) * 1e3
            d = float(jnp.max(jnp.abs(
                f32k(q, k, v, bias, mask).astype(jnp.float32)
                - bf16k(q, k, v, bias, mask).astype(jnp.float32))))
        except TypeError:
            t16, d = float("nan"), float("nan")
        out[f"attn_{tag}"] = {"f32_ms": round(t32, 3), "bf16_ms": round(t16, 3),
                              "maxdiff": d}
        print(json.dumps({("attn_" + tag): out[f"attn_{tag}"]}), flush=True)

        # 2: MLP variants
        x = r(B_, N, C)
        w1, w2 = r(C, 4 * C), r(4 * C, C)
        variants = {
            "exact_f32": lambda x, w1, w2: (
                nn.gelu(( x @ w1).astype(jnp.float32), approximate=False)
            ).astype(dt) @ w2,
            "exact_bf16": lambda x, w1, w2: nn.gelu(x @ w1, approximate=False) @ w2,
            "tanh_bf16": lambda x, w1, w2: nn.gelu(x @ w1, approximate=True) @ w2,
            "relu": lambda x, w1, w2: jnp.maximum(x @ w1, 0) @ w2,
            "noact": lambda x, w1, w2: (x @ w1) @ w2,
        }
        row = {}
        for name, fn in variants.items():
            row[name] = round(timed_fn(fn, (x, w1, w2), args.iters) * 1e3, 3)
        out[f"mlp_{tag}"] = row
        print(json.dumps({("mlp_" + tag): row}), flush=True)

        # 3: bias expansion (table[idx] -> [H,N,N]) as done per block in the model
        tbl = jnp.asarray(rng.standard_normal((15 * 13 * 13, heads)), jnp.float32)
        idx = jnp.asarray(
            rng.integers(0, 15 * 13 * 13, size=(N * N,)).astype(np.int32))
        expand = lambda tbl, idx: tbl[idx].reshape(N, N, heads).transpose(2, 0, 1)
        te = timed_fn(expand, (tbl, idx), args.iters) * 1e3
        out[f"bias_{tag}"] = round(te, 3)
        print(json.dumps({("bias_" + tag): out[f"bias_{tag}"],
                          "x_per_fwd": depth}), flush=True)


if __name__ == "__main__":
    main()
