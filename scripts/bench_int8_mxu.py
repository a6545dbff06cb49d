"""Microbench: int8 vs bf16 MXU rates for matmul and IRv2-trunk conv shapes.

Question (round 5): v5e executes 8-bit ops at ~2x the bf16 MXU rate. The
fused inference headline is conv-trunk-bound at ~51% conv-MFU in bf16
(BASELINE_MEASURED.md round-5 training section quotes the fwd+bwd figure;
the forward-only trunk sits ~1.2x over its practical roofline). If XLA
lowers int8 convolutions to the MXU's double-rate path, an int8-quantized
serving mode breaks that cap. If it upcasts, the idea dies here — either
way the A/B gets recorded.

Timing: chained lax.fori_loop with a carry data-dependency + scalar fetch
(the axon tunnel acks dispatch; see CLAUDE.md / bench.py).

Usage: python scripts/bench_int8_mxu.py [--iters 30]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timed_chain(fn, x, iters: int) -> float:
    """Seconds/iter, overhead-cancelled (long chain minus short chain)."""

    @jax.jit
    def run(x, n):
        def body(_, carry):
            x, acc = carry
            out = fn(x)
            # fold a scalar of the output back into the input: serializes
            # iterations and defeats loop-invariant hoisting. The scalar is
            # runtime-zero (1e-30, or int-cast 0) but data-dependent, so the
            # simplifier cannot fold it away; numerically negligible.
            s = jnp.sum(out.astype(jnp.float32)) * 1e-30
            return x + s.astype(x.dtype), acc + s

        _, acc = lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc

    float(run(x, 1))  # compile+warm
    def measure(n):
        t0 = time.perf_counter()
        float(run(x, n))
        return time.perf_counter() - t0
    measure(1)
    lo = min(measure(1) for _ in range(2))
    hi = min(measure(1 + iters) for _ in range(2))
    return (hi - lo) / iters


def bench_matmul(n: int, dtype, acc_dtype, iters: int):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, (n, n), dtype=np.int8))
        b = jnp.asarray(rng.integers(-127, 127, (n, n), dtype=np.int8))
    else:
        a = jnp.asarray(rng.standard_normal((n, n)), dtype=dtype)
        b = jnp.asarray(rng.standard_normal((n, n)), dtype=dtype)

    def fn(a):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=acc_dtype)

    s = timed_chain(fn, a, iters)
    tf = 2 * n**3 / s / 1e12
    return s, tf


def bench_conv(xshape, wshape, stride, pad, dtype, acc_dtype, iters: int):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, xshape, dtype=np.int8))
        w = jnp.asarray(rng.integers(-127, 127, wshape, dtype=np.int8))
    else:
        x = jnp.asarray(rng.standard_normal(xshape), dtype=dtype)
        w = jnp.asarray(rng.standard_normal(wshape), dtype=dtype)

    def fn(x):
        return lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_dtype)

    s = timed_chain(fn, x, iters)
    out = jax.eval_shape(fn, jax.ShapeDtypeStruct(xshape, x.dtype))
    flops = 2 * np.prod(out.shape) * wshape[0] * wshape[1] * wshape[2]
    return s, flops / s / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")

    rows = []
    for n in (4096,):
        for name, dt, at in (("bf16", jnp.bfloat16, jnp.float32),
                             ("int8", jnp.int8, jnp.int32)):
            s, tf = bench_matmul(n, dt, at, args.iters)
            rows.append({"op": f"matmul{n}", "dtype": name,
                         "ms": round(s * 1e3, 3), "tflops": round(tf, 1)})
            print(json.dumps(rows[-1]))

    # IRv2 trunk shapes at the fused headline batch (8 clips x 32 frames = 256
    # images, 224 px input; models/inception_resnet_v2.py stem + block mixes)
    convs = [
        ("stem_f2_3x3", (256, 109, 109, 32), (3, 3, 32, 64), 1, "SAME"),
        ("b35_1x1", (256, 25, 25, 320), (1, 1, 320, 64), 1, "SAME"),
        ("b35_3x3", (256, 25, 25, 48), (3, 3, 48, 64), 1, "SAME"),
        ("b17_1x1", (256, 12, 12, 1088), (1, 1, 1088, 192), 1, "SAME"),
        ("b17_1x7", (256, 12, 12, 160), (1, 7, 160, 176), 1, "SAME"),
    ]
    for name, xs, ws, st, pd in convs:
        for dname, dt, at in (("bf16", jnp.bfloat16, jnp.float32),
                              ("int8", jnp.int8, jnp.int32)):
            try:
                s, tf = bench_conv(xs, ws, st, pd, dt, at, args.iters)
                rows.append({"op": name, "dtype": dname,
                             "ms": round(s * 1e3, 3), "tflops": round(tf, 1)})
            except Exception as e:  # lowering may reject int8 convs
                rows.append({"op": name, "dtype": dname,
                             "error": f"{type(e).__name__}: {str(e)[:160]}"})
            print(json.dumps(rows[-1]))

    print(json.dumps({"metric": "int8_mxu_microbench", "rows": rows}))


if __name__ == "__main__":
    main()
