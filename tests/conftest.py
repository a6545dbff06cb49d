"""Test session config: run JAX on CPU with 8 virtual devices so multi-chip
sharding tests work without TPU hardware (the TPU-world substitute for a fake
backend — SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TRANSFORMERS_NO_ADVISORY_WARNINGS", "1")

# The ambient environment pins JAX_PLATFORMS to the TPU tunnel and overrides
# env-var changes; jax.config is authoritative, so force CPU through it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"
WAV2VEC2_DIR = os.path.join(REFERENCE_ROOT, "checkpoints", "wav2vec2-base-960h")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def has_wav2vec2_weights() -> bool:
    p = os.path.join(WAV2VEC2_DIR, "model.safetensors")
    # the image ships a 134-byte git-lfs pointer stub, not real weights
    return os.path.isfile(p) and os.path.getsize(p) > 1 << 20
