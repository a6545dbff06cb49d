"""Bisect which int8 conv shapes hang the TPU (round-5 int8 serving).

The int8 microbench shapes (stride-1, SAME padding, C>=32) all execute;
the full quantized IRv2 forward compiles in 31 s and then never returns.
This probe runs each remaining shape class one jitted call at a time with
flushed prints, so when the device wedges the last line names the culprit.

Run only when the tunnel is healthy. Expect to lose the tunnel if a shape
hangs — that is the experiment.
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def probe(name, xshape, wshape, stride, pad):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, xshape, dtype=np.int8))
    w = jnp.asarray(rng.integers(-127, 127, wshape, dtype=np.int8))

    @jax.jit
    def f(x, w):
        out = lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return jnp.sum(out)

    t0 = time.perf_counter()
    val = int(f(x, w))
    dt = time.perf_counter() - t0
    print(f"OK  {name:28s} {dt*1e3:9.1f} ms (compile+run) sum={val}", flush=True)


def main():
    B = 32  # small batch: we care about hang-vs-run, not throughput
    # FINDING (first probe run, 2026-08-21): f0 (3x3 s2 VALID, C_in=3) at
    # B=32 never returned within 7 min — the C=3 int8 conv is the (or at
    # least the first) pathology. f0 cases therefore run LAST so one probe
    # window classifies everything else first.
    cases = [
        # name, x shape, w shape, stride, padding
        ("f1_3x3_s1_VALID",      (B, 111, 111, 32), (3, 3, 32, 32),   1, "VALID"),
        ("f5_3x3_s1_VALID",      (B, 54, 54, 80),   (3, 3, 80, 192),  1, "VALID"),
        ("stem_5x5_SAME",        (B, 25, 25, 48),   (5, 5, 48, 64),   1, [(2, 2), (2, 2)]),
        ("redA_3x3_s2_VALID",    (B, 25, 25, 320),  (3, 3, 320, 384), 2, "VALID"),
        ("redB_3x3_s2_VALID",    (B, 12, 12, 288),  (3, 3, 288, 320), 2, "VALID"),
        ("b17_7x1_SAME",         (B, 12, 12, 160),  (7, 1, 160, 176), 1, [(3, 3), (0, 0)]),
        ("bC_1x3_SAME",          (B, 5, 5, 192),    (1, 3, 192, 224), 1, [(0, 0), (1, 1)]),
        ("bC_3x1_SAME",          (B, 5, 5, 224),    (3, 1, 224, 256), 1, [(1, 1), (0, 0)]),
        ("final_1x1_2080_1536",  (B, 5, 5, 2080),   (1, 1, 2080, 1536), 1, "VALID"),
        # explicit-pairs padding spelling of an already-OK shape (the model
        # emits [(1,1),(1,1)] instead of the string "SAME")
        ("b35_3x3_pairpad",      (B, 25, 25, 48),   (3, 3, 48, 64),   1, [(1, 1), (1, 1)]),
    ]
    # C=3 f0 batch scaling LAST (known to wedge at B=32; b1 completed inside
    # model.init, so some batch in between is the cliff)
    cases += [
        ("f0_b1",  (1, 224, 224, 3),  (3, 3, 3, 32), 2, "VALID"),
        ("f0_b4",  (4, 224, 224, 3),  (3, 3, 3, 32), 2, "VALID"),
        ("f0_b32", (B, 224, 224, 3),  (3, 3, 3, 32), 2, "VALID"),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    print(f"backend={jax.default_backend()}", flush=True)
    for name, xs, ws, st, pd in cases:
        if only and only not in name:
            continue
        print(f"... {name}", flush=True)
        probe(name, xs, ws, st, pd)
    print("ALL SHAPES OK", flush=True)


if __name__ == "__main__":
    main()
