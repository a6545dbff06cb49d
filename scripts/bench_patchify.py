"""A/B the config-4 patchify pipeline: NTHWC [.., 3] input (lane-padded
3->128 on TPU: every consumer reads ~43x the bytes) vs the channel-folded
[B, T, H, W*3] feed (dense lanes; same values, host reshape is free).

Times cast + space-to-depth + patchify GEMM at config-4 scale with the
tunnel-safe chained-carry methodology.

Usage: python scripts/bench_patchify.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    B, T, S, C, E = args.batch, 32, 224, 3, 128
    pd, ph, pw = 2, 4, 4
    rng = np.random.default_rng(0)
    x5 = rng.standard_normal((B, T, S, S, C)).astype(np.float32)
    w = jnp.asarray(
        rng.standard_normal((pd * ph * pw * C, E)).astype(np.float32) * 0.02,
        jnp.bfloat16,
    )

    def embed_5d(x):
        x = x.astype(jnp.bfloat16)
        x = x.reshape(B, T // pd, pd, S // ph, ph, S // pw, pw, C)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(B, T // pd, S // ph, S // pw, pd * ph * pw * C)
        return x @ w

    def embed_folded(x):  # x: [B, T, S, S*C]
        x = x.astype(jnp.bfloat16)
        x = x.reshape(B, T // pd, pd, S // ph, ph, S // pw, pw * C)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6)
        x = x.reshape(B, T // pd, S // ph, S // pw, pd * ph * pw * C)
        return x @ w

    def timed(fn, x_np, iters):
        x = jax.device_put(jnp.asarray(x_np))

        @jax.jit
        def step(c, x):
            y = fn(x + (c * 1e-30).astype(x.dtype))
            return c + jnp.sum(y.astype(jnp.float32))

        def run(n):
            c = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(n):
                c = step(c, x)
            float(c)
            return time.perf_counter() - t0

        run(1)
        lo = min(run(1) for _ in range(2))
        hi = min(run(1 + iters) for _ in range(2))
        return (hi - lo) / iters

    t5 = timed(embed_5d, x5, args.iters)
    tf = timed(embed_folded, x5.reshape(B, T, S, S * C), args.iters)
    print(json.dumps({
        "nthwc_ms": round(t5 * 1e3, 3),
        "folded_ms": round(tf * 1e3, 3),
        "speedup": round(t5 / tf, 2),
    }))


if __name__ == "__main__":
    main()
