"""One-window experiment: prove every 1x1 int8 conv shape the fused model
actually emits (B = 8 clips x 32 frames = 256), then — only if all pass —
run the scope=pointwise int8 headline A/B in the same process.

Rationale (docs/sweeps/round5_quant.jsonl): int8 1x1 convs measured up to
2.7x bf16, but two non-pointwise shapes (f0 C=3 s2 VALID, f1 32ch s1 VALID)
wedge the device at batch, costing ~35 min of tunnel downtime each. This
script risks at most one more wedge and banks either a measured headline
win or the exact failing shape.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def probe(name, xshape, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, xshape, dtype=np.int8))
    w = jnp.asarray(rng.integers(-127, 127, (1, 1, xshape[-1], cout), dtype=np.int8))

    @jax.jit
    def f(x, w):
        out = lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return jnp.sum(out)

    t0 = time.perf_counter()
    int(f(x, w))
    print(f"OK  {name:24s} {(time.perf_counter()-t0)*1e3:8.1f} ms", flush=True)


def main():
    B = 256
    cases = [
        ("stem_f4_64_80",    (B, 54, 54, 64),   80),
        ("stemmix_320_64",   (B, 25, 25, 320),  64),
        ("bA_320_32",        (B, 25, 25, 320),  32),
        ("bA_res_128_320",   (B, 25, 25, 128),  320),
        ("bB_1088_192",      (B, 12, 12, 1088), 192),
        ("bB_1088_128",      (B, 12, 12, 1088), 128),
        ("bB_res_384_1088",  (B, 12, 12, 384),  1088),
        ("bC_2080_192",      (B, 5, 5, 2080),   192),
        ("bC_res_448_2080",  (B, 5, 5, 448),    2080),
        ("final_2080_1536",  (B, 5, 5, 2080),   1536),
    ]
    print(f"backend={jax.default_backend()}", flush=True)
    for name, xs, co in cases:
        print(f"... {name}", flush=True)
        probe(name, xs, co)
    print("ALL POINTWISE SHAPES OK — running headline A/B", flush=True)

    # same-window headline A/B: scope=pointwise int8 vs (cached) float
    import os
    import subprocess
    import sys

    env = dict(os.environ, DEEPFAKE_TPU_INT8_SCOPE="pointwise")
    for label, extra in (
        ("headline_b8_int8_pointwise", ["--set", "model.irv2_quant=int8"]),
        ("headline_b8_int8s_pointwise", ["--set", "model.irv2_quant=int8_static"]),
    ):
        cmd = [sys.executable, "bench.py", "--iters", "20", "--e2e_clips", "0"] + extra
        print(f"=== {label}: {' '.join(cmd)}", flush=True)
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=1500)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        print(line, flush=True)
        with open("docs/sweeps/round5_quant.jsonl", "a") as f:
            f.write(json.dumps({"run": label, "row": json.loads(line) if line.startswith("{") else line}) + "\n")


if __name__ == "__main__":
    main()
