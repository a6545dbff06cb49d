"""Observability + init tests: HBM census/tracker, model size, activation
estimator, XLA FLOPs accounting, reference-style weight init, determinism."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_model_size_census():
    from deepfake_tpu.utils.profiling import model_size

    params = {"a": jnp.zeros((10, 10)), "b": {"c": jnp.zeros((5,), jnp.float32)}}
    s = model_size(params)
    assert s["params"] == 105
    assert abs(s["mb"] - 105 * 4 / 1024 / 1024) < 1e-9


def test_live_buffer_census_and_tracker(tmp_path):
    from deepfake_tpu.utils.profiling import HbmTracker, live_buffer_census

    keep = jnp.ones((128, 128))
    census = live_buffer_census()
    assert census["total_bytes"] >= keep.size * 4
    tracker = HbmTracker(path=str(tmp_path), every=1)
    tracker.track()
    tracker.step()
    tracker.track()
    assert os.path.getsize(tracker.file) > 0


def test_activation_memory_estimate():
    from deepfake_tpu.utils.profiling import activation_memory_estimate

    f = lambda x: jnp.tanh(x @ x)  # one [8,8] matmul + one [8,8] tanh
    est = activation_memory_estimate(f, jnp.zeros((8, 8)))
    assert est == 2 * 2 * 8 * 8 * 4


def test_xla_flops_matmul():
    from deepfake_tpu.utils.profiling import xla_flops

    n = 64
    fl = xla_flops(lambda a, b: a @ b, jnp.zeros((n, n)), jnp.zeros((n, n)))
    if fl is not None:  # cost analysis availability varies by backend
        assert fl == pytest.approx(2 * n ** 3, rel=0.01)


def test_reference_weights_init():
    from deepfake_tpu.utils.init import apply_reference_init

    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 8, 16)), "bias": jnp.zeros((16,))},
        "dense": {"kernel": jnp.zeros((128, 64)), "bias": jnp.ones((64,))},
        "bn1": {"scale": jnp.full((8,), 2.0), "bias": jnp.full((8,), 3.0)},
    }
    out = apply_reference_init(params, jax.random.PRNGKey(0))
    # conv: xavier std sqrt(2/(fan_in+fan_out)), bias 0.3 (trainer.py:34-37)
    k = np.asarray(out["conv"]["kernel"])
    expected_std = np.sqrt(2.0 / (8 * 9 + 16 * 9))
    assert abs(k.std() - expected_std) / expected_std < 0.15
    np.testing.assert_allclose(np.asarray(out["conv"]["bias"]), 0.3)
    # linear: kaiming std sqrt(2/fan_in), bias 0 (trainer.py:38-41)
    d = np.asarray(out["dense"]["kernel"])
    assert abs(d.std() - np.sqrt(2.0 / 128)) / np.sqrt(2.0 / 128) < 0.15
    np.testing.assert_allclose(np.asarray(out["dense"]["bias"]), 0.0)
    # bn: scale 1, bias 0 (trainer.py:42-44)
    np.testing.assert_allclose(np.asarray(out["bn1"]["scale"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["bn1"]["bias"]), 0.0)


def test_determinism_same_seed_same_logits():
    """Fixed seed => bit-identical init and forward (the reference pins seeds
    everywhere and disables cuDNN for this, src/utils.py:382-391; XLA is
    deterministic per program so only the keys matter)."""
    from deepfake_tpu.models.swin2d import SwinTransformerV2

    model = SwinTransformerV2(
        img_size=56, num_classes=1, embed_dim=16, depths=(2,), num_heads=(2,),
        drop_path_rate=0.0,
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 56, 56, 3)),
                    jnp.float32)
    p1 = model.init(jax.random.PRNGKey(7), x)["params"]
    p2 = model.init(jax.random.PRNGKey(7), x)["params"]
    assert all(
        np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2))
    )
    o1 = model.apply({"params": p1}, x)
    o2 = model.apply({"params": p2}, x)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))


def test_apply_prng_impl_resolves_and_stays_deterministic():
    """parallel.prng_impl='auto' resolves per backend (rbg on TPU, threefry
    elsewhere — round-5 A/B: fused train 37.2 -> 39.1% MFU on rbg); any
    resolved impl keeps same-seed determinism, which is all the reference's
    seed-pinning guarantees (src/utils.py:382-391)."""
    from deepfake_tpu.utils.seeding import apply_prng_impl

    prev = jax.config.jax_default_prng_impl
    try:
        resolved = apply_prng_impl("auto")
        assert resolved == (
            "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
        )
        apply_prng_impl("rbg")
        k1, k2 = jax.random.PRNGKey(3), jax.random.PRNGKey(3)
        a = jax.random.uniform(k1, (64,))
        b = jax.random.uniform(k2, (64,))
        assert np.array_equal(np.asarray(a), np.asarray(b))
        # rbg keys are 4x uint32 (vs threefry's 2) — downstream code must
        # thread keys opaquely; this pins the shape assumption
        assert np.asarray(k1).shape == (4,)
    finally:
        apply_prng_impl(prev)


def test_step_watchdog_fires_and_resets():
    import time

    from deepfake_tpu.utils.watchdog import StepWatchdog

    events = []
    wd = StepWatchdog(deadline_s=0.2, on_stall=events.append, poll_s=0.05)
    try:
        with wd.watch("fast"):
            time.sleep(0.05)
        assert not events
        with wd.watch("slow"):
            time.sleep(0.5)
        assert len(events) == 1 and "slow" in events[0]
        with wd.watch("fast2"):
            time.sleep(0.05)
        assert len(events) == 1  # fired flag reset per section
    finally:
        wd.close()


def test_duty_cycle_shares_and_log():
    """Device-duty breakdown (the GpuInfoTracker utilization analogue,
    reference: src/utils.py:216-240): phase shares sum to 1 and a summary
    line lands in the log every log_step steps."""
    from deepfake_tpu.utils.logging import DutyCycle, Logger

    lines = []

    class L(Logger):
        def __init__(self):
            pass

        def __call__(self, msg):
            lines.append(str(msg))

    duty = DutyCycle(L(), log_step=2)
    for _ in range(4):
        duty.add("input_wait", 0.25)
        duty.add("step", 0.75)
        duty.step()
    assert abs(duty.share("input_wait") - 0.25) < 1e-9
    assert abs(duty.share("step") - 0.75) < 1e-9
    duty_lines = [l for l in lines if l.startswith("duty |")]
    assert len(duty_lines) == 2
    assert "input_wait 25.0%" in duty_lines[-1] and "step 75.0%" in duty_lines[-1]
