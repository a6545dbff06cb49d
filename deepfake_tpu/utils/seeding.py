"""Determinism utilities (reference: src/utils.py:382-391 seed_torch).

JAX PRNG keys are explicit, so the framework threads jax.random keys
everywhere; this helper seeds the remaining host-side RNGs and returns the
root key. (The reference disables cuDNN entirely for determinism — on TPU,
XLA is deterministic per compiled program, so nothing equivalent is needed.)
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    seed = int(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def apply_prng_impl(impl: str) -> str:
    """Set jax_default_prng_impl BEFORE any PRNGKey is created.

    impl: 'auto' | 'threefry2x32' | 'rbg' | 'unsafe_rbg'. 'auto' resolves to
    'rbg' on TPU and 'threefry2x32' elsewhere: threefry generates random bits
    in software on the VPU and its per-dropout-mask cost is visible in wide
    training steps (round-5 A/B, docs/sweeps/round5_train.jsonl: fused b8
    step 168.0 -> 159.9 ms, 37.2 -> 39.1% MFU just by switching to rbg;
    video_swin neutral), while rbg uses the hardware RNG path. Tradeoff:
    rbg keys are deterministic per compiled program and seed but the bit
    stream is not guaranteed stable across XLA versions the way threefry is
    — matching the reference, whose cuDNN dropout is similarly
    implementation-defined (src/utils.py:382-391 pins seeds, not streams).
    Returns the resolved impl name."""
    if impl == "auto":
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    jax.config.update("jax_default_prng_impl", impl)
    return impl
