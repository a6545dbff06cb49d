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
