"""In-context per-stage cost of the Video Swin-B 3D forward (config 4).

Times the FULL backbone truncated after each stage (depths prefixes) so each
stage's cost includes the real fusions (QKV-fused kernel, MLP tail, patch
merging) rather than isolated-op dispatch overhead. Differencing consecutive
rows gives the marginal cost of each stage.

Usage: python scripts/profile_swin3d_stages.py [--batch 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed_fn(fn, args_list, iters, repeats=2):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(carry, args):
        perturbed = jax.tree.map(
            lambda x: x + (carry * 1e-30).astype(x.dtype), args[0]
        )
        y = fn(perturbed, *args[1:])
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
    p.add_argument("--frames", type=int, default=32)
    args = p.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from deepfake_tpu.models.swin3d import SwinTransformer3D

    B = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    xv = jnp.asarray(
        rng.standard_normal((B, args.frames, 224, 224, 3)), jnp.float32
    )

    full_depths = (2, 2, 18, 2)
    heads = (4, 8, 16, 32)
    prev = 0.0
    for k in range(1, len(full_depths) + 1):
        model = SwinTransformer3D(
            patch_size=(2, 4, 4), embed_dim=128, depths=full_depths[:k],
            num_heads=heads[:k], window_size=(8, 7, 7), drop_path_rate=0.0,
            patch_norm=True, use_pallas=True, dtype=dt,
        )
        init_fn = jax.jit(functools.partial(model.init, deterministic=True))
        variables = init_fn({"params": jax.random.PRNGKey(0)}, xv)
        fwd = lambda x, v: model.apply(v, x, deterministic=True)
        t_ms = timed_fn(fwd, (xv, variables), args.iters) * 1e3
        print(json.dumps({
            "depths": full_depths[:k], "cum_ms": round(t_ms, 2),
            "marginal_ms": round(t_ms - prev, 2),
        }), flush=True)
        prev = t_ms


if __name__ == "__main__":
    main()
