"""Microbench: 3D shifted-window data movement alternatives, per stage shape.

Compares, at each Video Swin-B stage shape (b8, bf16):
  roll+part   - current shifted path: 3-axis jnp.roll -> window partition
                (reshape/transpose) -> window reverse -> 3-axis roll back
  gather      - proposed: ONE row-gather [B, L, C] -> [B_, N, C] with the
                cyclic shift folded into the index table, + inverse gather
  part        - non-shifted partition transpose + reverse (the cost a
                window-layout-persistent stage avoids entirely)

Timing: tunnel-safe chained jitted calls with a carry data-dependency
(see bench.py docstring). Prints one JSON line per (stage, variant).

Usage: python scripts/bench_shift_gather.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def shift_partition_indices(D, H, W, ws, ss):
    """[nW*N] flat source-token index for fused (cyclic-shift + window
    partition); ss=(0,0,0) gives the plain partition permutation. Token
    order matches window_partition_3d (windows row-major over (nd,nh,nw),
    tokens row-major over (d,i,j))."""
    nd, nh, nw = D // ws[0], H // ws[1], W // ws[2]
    out = np.empty((nd, nh, nw, ws[0], ws[1], ws[2]), np.int32)
    d = np.arange(ws[0])
    i = np.arange(ws[1])
    j = np.arange(ws[2])
    for a in range(nd):
        gd = (a * ws[0] + d + ss[0]) % D
        for b in range(nh):
            gh = (b * ws[1] + i + ss[1]) % H
            for c in range(nw):
                gw = (c * ws[2] + j + ss[2]) % W
                out[a, b, c] = (
                    gd[:, None, None] * (H * W) + gh[None, :, None] * W + gw[None, None, :]
                )
    return out.reshape(-1)


def timed(fn, x, iters, repeats=2):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(carry, x):
        y = fn(x + (carry * 1e-30).astype(x.dtype))
        return carry + jnp.sum(y[..., :1].astype(jnp.float32)), x

    def measure(n):
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            carry, _ = step(carry, x)
        float(carry)
        return time.perf_counter() - t0

    float(measure(1))
    samples = []
    for _ in range(repeats):
        lo = min(measure(1) for _ in range(2))
        hi = min(measure(1 + iters) for _ in range(2))
        samples.append((hi - lo) / iters)
    return min(samples)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepfake_tpu.models.swin3d import (
        get_window_size, window_partition_3d, window_reverse_3d,
    )

    B = args.batch
    stages = [  # Swin-B 3D (config 4): 32f -> D=16
        (16, 56, 56, 128),
        (16, 28, 28, 256),
        (16, 14, 14, 512),
        (16, 7, 7, 1024),
    ]
    rng = np.random.default_rng(0)
    for (D, H, W, C) in stages:
        ws, ss = get_window_size((D, H, W), (8, 7, 7), [4, 3, 3])
        N = ws[0] * ws[1] * ws[2]
        L = D * H * W
        x = jnp.asarray(
            rng.standard_normal((B, D, H, W, C)).astype(np.float32), jnp.bfloat16
        )
        xt = x.reshape(B, L, C)
        idx = jnp.asarray(shift_partition_indices(D, H, W, ws, ss))
        inv = jnp.asarray(np.argsort(np.asarray(idx)).astype(np.int32))
        idx0 = jnp.asarray(shift_partition_indices(D, H, W, ws, (0, 0, 0)))
        inv0 = jnp.asarray(np.argsort(np.asarray(idx0)).astype(np.int32))

        def roll_part(x):
            h = jnp.roll(x, (-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
            w = window_partition_3d(h, ws)
            h = window_reverse_3d(w, ws, B, D, H, W)
            return jnp.roll(h, (ss[0], ss[1], ss[2]), axis=(1, 2, 3))

        def gather(x):
            w = jnp.take(x, idx, axis=1)
            return jnp.take(w.reshape(B, L, C), inv, axis=1)

        def part(x):
            w = window_partition_3d(x, ws)
            return window_reverse_3d(w, ws, B, D, H, W)

        def gather0(x):
            w = jnp.take(x, idx0, axis=1)
            return jnp.take(w.reshape(B, L, C), inv0, axis=1)

        mb = x.size * 2 / 1e6
        for name, fn, arg in (
            ("roll+part", roll_part, x),
            ("gather", gather, xt),
            ("part", part, x),
            ("gather_noshift", gather0, xt),
        ):
            ms = timed(fn, arg, args.iters) * 1e3
            print(json.dumps({
                "stage": f"{D}x{H}x{W}x{C}", "variant": name,
                "ms": round(ms, 3), "mb": round(mb, 1),
                "ms_per_100mb": round(ms / mb * 100, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
