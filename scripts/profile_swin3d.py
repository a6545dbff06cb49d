"""Per-component roofline of the Video Swin-B 3D forward (BASELINE config 4).

Times each block component in isolation at exact stage shapes (b8, bf16,
32 frames -> D=16, window (8,7,7), N=392) and compares the per-stage sums
against the measured full forward. Tunnel-safe chained timing (bench.py).

Usage: python scripts/profile_swin3d.py [--iters 20] [--full]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed_fn(fn, args_list, iters, repeats=2):
    """Overhead-cancelled seconds/iter for fn(*args) chained via carry."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(carry, args):
        perturbed = jax.tree.map(
            lambda x: x + (carry * 1e-30).astype(x.dtype), args[0]
        )
        y = fn(perturbed, *args[1:])
        # consume the FULL output (a sliced sum lets XLA dead-code-eliminate
        # most of a matmul by computing only the consumed columns)
        return carry + sum(
            jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(y)
        )

    def measure(n):
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            carry = step(carry, args_list)
        float(carry)
        return time.perf_counter() - t0

    measure(1)
    best = []
    for _ in range(repeats):
        lo = min(measure(1) for _ in range(2))
        hi = min(measure(1 + iters) for _ in range(2))
        best.append((hi - lo) / iters)
    return min(best)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--full", action="store_true", help="also time the full model")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from deepfake_tpu.models.swin3d import compute_mask_3d, relative_position_index_3d
    from deepfake_tpu.ops.pallas_window_attn import (
        _nhc_head_group, pallas_window_attention_nhc,
    )

    B = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    ws = (8, 7, 7)
    N = 392
    # Swin-B 3D stages: (D,H,W,C,H_heads,n_blocks)
    stages = [
        (16, 56, 56, 128, 4, 2),
        (16, 28, 28, 256, 8, 2),
        (16, 14, 14, 512, 16, 18),
        (16, 7, 7, 1024, 32, 2),
    ]
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32), dt)

    total_est = 0.0
    for (D, H, W, C, heads, depth) in stages:
        nW = (D // 8) * (H // 7) * (W // 7)
        B_ = B * nW
        L = D * H * W
        Gh = _nhc_head_group(heads, C // heads, N)
        ss = tuple(min(s, d // 2 if d <= w else s) for s, d, w in zip((4, 3, 3), (D, H, W), ws))
        ss = tuple(0 if d <= w else s for s, d, w in zip((4, 3, 3), (D, H, W), ws))
        mask = jnp.asarray(compute_mask_3d(D, H, W, ws, ss))
        bias = r(heads, N, N).astype(jnp.float32)

        q, k, v = r(B_, N, C), r(B_, N, C), r(B_, N, C)
        kern = lambda q, k, v, bias, mask: pallas_window_attention_nhc(
            q, k, v, num_heads=heads, bias=bias, mask=mask, scale=0.177
        )
        t_attn = timed_fn(kern, (q, k, v, bias, mask), args.iters) * 1e3

        x = r(B_, N, C)
        wqkv = r(C, 3 * C)
        t_qkv = timed_fn(lambda x, w: x @ w, (x, wqkv), args.iters) * 1e3
        wproj = r(C, C)
        t_proj = timed_fn(lambda x, w: x @ w, (x, wproj), args.iters) * 1e3

        w1, w2 = r(C, 4 * C), r(4 * C, C)
        mlp = lambda x, w1, w2: nn.gelu(x @ w1, approximate=False) @ w2
        t_mlp = timed_fn(mlp, (x, w1, w2), args.iters) * 1e3

        ln = lambda x: (x - jnp.mean(x, -1, keepdims=True)) * jax.lax.rsqrt(
            jnp.var(x, -1, keepdims=True) + 1e-5
        )
        t_ln = timed_fn(ln, (x,), args.iters) * 1e3

        t_add = timed_fn(lambda x, y: x + y, (x, k), args.iters) * 1e3

        per_block = t_qkv + t_attn + t_proj + 2 * t_ln + t_mlp + 2 * t_add
        stage_est = per_block * depth
        total_est += stage_est
        print(json.dumps({
            "stage": f"{D}x{H}x{W}x{C}", "B_": B_, "nW": nW, "Gh": Gh,
            "attn_ms": round(t_attn, 3), "qkv_ms": round(t_qkv, 3),
            "proj_ms": round(t_proj, 3), "mlp_ms": round(t_mlp, 3),
            "ln_ms": round(t_ln, 3), "add_ms": round(t_add, 3),
            "per_block_ms": round(per_block, 3),
            "stage_est_ms": round(stage_est, 2), "blocks": depth,
        }), flush=True)

    print(json.dumps({"sum_of_parts_ms": round(total_est, 1)}), flush=True)

    if args.full:
        from deepfake_tpu.models.swin3d import VideoClassifier

        kw3 = dict(num_classes=1, embed_dim=128, depths=(2, 2, 18, 2),
                   num_heads=(4, 8, 16, 32), patch_size=(2, 4, 4),
                   window_size=(8, 7, 7), drop_path_rate=0.0, classify_drop=0.0,
                   dtype=dt)
        model = VideoClassifier(**kw3, use_pallas=True)
        xv = jnp.asarray(rng.standard_normal((B, 32, 224, 224, 3)), jnp.float32)
        init_fn = jax.jit(functools.partial(model.init, deterministic=True))
        variables = init_fn({"params": jax.random.PRNGKey(0)}, xv)
        fwd = lambda x, v: model.apply(v, x, deterministic=True)[0]
        t_full = timed_fn(fwd, (xv, variables), args.iters) * 1e3
        print(json.dumps({
            "full_fwd_ms": round(t_full, 2),
            "clips_per_sec": round(B / (t_full / 1e3), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
