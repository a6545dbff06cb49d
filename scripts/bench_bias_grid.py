"""A/B: (1) relative-position-bias expansion formulations, (2) NHC kernel
grid parameters (Gh head group, Wt windows/step) at Swin-B 3D stage shapes.

Usage: python scripts/bench_bias_grid.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from profile_swin3d import timed_fn  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    import jax.numpy as jnp

    from deepfake_tpu.models.swin3d import compute_mask_3d
    from deepfake_tpu.ops.pallas_window_attn import _run_nhc

    B = args.batch
    rng = np.random.default_rng(0)
    N = 392
    T = 15 * 13 * 13

    # ---- bias expansion variants (stage2: H=16) -------------------------
    for H in (4, 16):
        tbl = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
        tblT = jnp.asarray(np.asarray(tbl).T.copy())
        idx = jnp.asarray(rng.integers(0, T, size=(N * N,)).astype(np.int32))
        idx2d = idx.reshape(N, N)

        variants = {
            "rows_T": lambda tbl, idx: tbl[idx].reshape(N, N, H).transpose(2, 0, 1),
            "lanes_T": lambda tblT, idx: jnp.take(tblT, idx, axis=1).reshape(H, N, N),
            "rows_noT": lambda tbl, idx: tbl[idx].reshape(N, N, H),
        }
        arrs = {"rows_T": (tbl, idx), "lanes_T": (tblT, idx), "rows_noT": (tbl, idx)}
        row = {}
        for name, fn in variants.items():
            row[name] = round(timed_fn(fn, arrs[name], args.iters) * 1e3, 3)
        print(json.dumps({f"bias_H{H}": row}), flush=True)

    # ---- NHC grid sweep at stage2 (C=512, H=16, nW=8) -------------------
    C, H, heads_nW = 512, 16, 8
    nW = 8
    B_ = B * nW
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32), jnp.bfloat16)
    q, k, v = r(B_, N, C), r(B_, N, C), r(B_, N, C)
    bias = jnp.asarray(rng.standard_normal((H, N, N)), jnp.float32)
    mask = jnp.asarray(
        compute_mask_3d(16, 14, 14, (8, 7, 7), (4, 3, 3))).astype(jnp.bfloat16)
    scales = jnp.full((H, 1), 0.177, jnp.float32)

    for Gh in (4, 8):
        for Wt in (1, 2, 4, 8):
            if nW % Wt:
                continue
            fn = lambda q, k, v, bias, mask, scales: _run_nhc(
                q, k, v, bias, mask, scales, cosine=False, n_masks=nW,
                num_heads=H, Gh=Gh, Wt=Wt)
            try:
                ms = timed_fn(fn, (q, k, v, bias, mask, scales), args.iters) * 1e3
                print(json.dumps({"stage2_attn": {"Gh": Gh, "Wt": Wt,
                                                  "ms": round(ms, 3)}}), flush=True)
            except Exception as e:  # VMEM overflow etc.
                print(json.dumps({"stage2_attn": {"Gh": Gh, "Wt": Wt,
                                                  "err": str(e)[:120]}}), flush=True)

    # ---- stage0 grid sweep (C=128, H=4, nW=128) -------------------------
    C, H, nW = 128, 4, 128
    B_ = B * nW
    q, k, v = r(B_, N, C), r(B_, N, C), r(B_, N, C)
    bias = jnp.asarray(rng.standard_normal((H, N, N)), jnp.float32)
    mask = jnp.asarray(
        compute_mask_3d(16, 56, 56, (8, 7, 7), (4, 3, 3))).astype(jnp.bfloat16)
    scales = jnp.full((H, 1), 0.177, jnp.float32)
    for Wt in (4, 8, 16):
        fn = lambda q, k, v, bias, mask, scales: _run_nhc(
            q, k, v, bias, mask, scales, cosine=False, n_masks=nW,
            num_heads=H, Gh=4, Wt=Wt)
        try:
            ms = timed_fn(fn, (q, k, v, bias, mask, scales), args.iters) * 1e3
            print(json.dumps({"stage0_attn": {"Gh": 4, "Wt": Wt,
                                              "ms": round(ms, 3)}}), flush=True)
        except Exception as e:
            print(json.dumps({"stage0_attn": {"Gh": 4, "Wt": Wt,
                                              "err": str(e)[:120]}}), flush=True)


if __name__ == "__main__":
    main()
