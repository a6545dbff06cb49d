"""int8-quantized IRv2 conv trunk (round 5, serving-only opt-in).

`model.irv2_quant=int8` folds each ConvBnRelu's BatchNorm affine into the
conv weight, quantizes the folded weight per-output-channel and the input
per-tensor (dynamic max-abs), and runs every trunk convolution
int8 x int8 -> int32 on the MXU's double-rate 8-bit path (the reference has
no quantized path at all; its convs run fp32 with cuDNN globally disabled,
reference: src/utils.py:391). These tests pin:

* quantize_sym's elementwise error bound (<= scale/2),
* that the quant branch declares the EXACT parameter tree of the float
  branch (names, shapes, and init values — checkpoints/importers see no
  difference),
* ConvBnRelu and residual-block parity within quantization noise,
* that training paths ignore the knob (live-BN float path),
* the registry plumbing of model.irv2_quant.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from deepfake_tpu.models.layers import ConvBnRelu, quantize_sym


def _corr(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.corrcoef(a, b)[0, 1])


def test_quantize_sym_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32) * 3.0)
    q, s = quantize_sym(x)
    assert q.dtype == jnp.int8 and s.dtype == jnp.float32
    err = np.abs(np.asarray(q, np.float32) * float(s) - np.asarray(x))
    assert err.max() <= float(s) / 2 + 1e-7  # round-to-nearest half-ULP

    # per-output-channel: each channel's scale set by its own max
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32))
    qw, sw = quantize_sym(w, axis=(0, 1, 2))
    assert sw.shape == (1, 1, 1, 16)
    deq = np.asarray(qw, np.float32) * np.asarray(sw)
    assert np.abs(deq - np.asarray(w)).max() <= float(np.max(sw)) / 2 + 1e-7


def test_quant_convbnrelu_param_tree_identical():
    x = jnp.zeros((1, 8, 8, 12))
    mf = ConvBnRelu(16, (3, 3), 1, 1, use_bias=False)
    mq = ConvBnRelu(16, (3, 3), 1, 1, use_bias=False, quant="int8")
    vf = mf.init(jax.random.PRNGKey(7), x)
    vq = mq.init(jax.random.PRNGKey(7), x)
    assert jtu.tree_structure(vf) == jtu.tree_structure(vq)
    for a, b in zip(jtu.tree_leaves(vf), jtu.tree_leaves(vq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _nontrivial_bn(variables, n, rng):
    """Perturb BN stats/affine so the fold is exercised (init stats are
    identity)."""
    v = jax.tree.map(lambda x: x, dict(variables))
    v["batch_stats"]["bn"]["mean"] = jnp.asarray(
        0.2 * rng.standard_normal(n).astype(np.float32))
    v["batch_stats"]["bn"]["var"] = jnp.asarray(
        (1.0 + 0.5 * rng.random(n)).astype(np.float32))
    v["params"]["bn"]["scale"] = jnp.asarray(
        (1.0 + 0.3 * rng.standard_normal(n)).astype(np.float32))
    v["params"]["bn"]["bias"] = jnp.asarray(
        0.1 * rng.standard_normal(n).astype(np.float32))
    return v


def test_quant_convbnrelu_matches_float_within_quant_noise():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 24)).astype(np.float32))
    mf = ConvBnRelu(32, (3, 3), 1, 1, use_bias=False)
    mq = ConvBnRelu(32, (3, 3), 1, 1, use_bias=False, quant="int8")
    v = _nontrivial_bn(mf.init(jax.random.PRNGKey(0), x), 32, rng)
    yf = np.asarray(mf.apply(v, x))
    yq = np.asarray(mq.apply(v, x))
    assert _corr(yf, yq) > 0.999
    assert np.abs(yf - yq).max() / np.abs(yf).max() < 0.05


def test_quant_ignored_in_training():
    """train=True must take the float path (live BN batch stats), whatever
    quant says — outputs and mutated stats equal the float module's."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)).astype(np.float32))
    mf = ConvBnRelu(8, (3, 3), 1, 1, use_bias=False)
    mq = ConvBnRelu(8, (3, 3), 1, 1, use_bias=False, quant="int8")
    v = mf.init(jax.random.PRNGKey(0), x)
    yf, mutf = mf.apply(v, x, train=True, mutable=["batch_stats"])
    yq, mutq = mq.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yq), rtol=1e-6)
    for a, b in zip(jtu.tree_leaves(mutf), jtu.tree_leaves(mutq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_quant_residual_block_parity():
    """BlockA exercises the plain biased residual 1x1 (_residual_conv int8
    route) on top of six quantized ConvBnRelus."""
    from deepfake_tpu.models.inception_resnet_v2 import BlockA

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 320)).astype(np.float32))
    mf = BlockA()
    mq = BlockA(quant="int8")
    v = mf.init(jax.random.PRNGKey(0), x)
    yf = np.asarray(mf.apply(v, x))
    yq = np.asarray(mq.apply(v, x))
    assert jtu.tree_structure(v) == jtu.tree_structure(
        mq.init(jax.random.PRNGKey(0), x))
    assert _corr(yf, yq) > 0.999
    assert np.abs(yf - yq).max() / np.abs(yf).max() < 0.05


def test_registry_plumbs_irv2_quant():
    from deepfake_tpu.config import Config
    from deepfake_tpu.models.registry import build_model

    cfg = Config()
    cfg.data.modality = "video"
    cfg.model.irv2_quant = "int8"
    assert build_model(cfg).quant == "int8"
    cfg.model.irv2_quant = "none"
    assert build_model(cfg).quant is None
    cfg.data.modality = "fused"
    cfg.model.irv2_quant = "int8"
    assert build_model(cfg).video_extractor.quant == "int8"


@pytest.mark.slow
def test_irv2_quant_full_forward_parity():
    """Whole backbone at a reduced input: features stay finite and correlate
    with the float forward within int8 noise (random weights amplify
    quantization error vs trained nets; the bound here is deliberately
    loose)."""
    from deepfake_tpu.models.inception_resnet_v2 import InceptionResNetV2

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)).astype(np.float32))
    mf = InceptionResNetV2()
    mq = InceptionResNetV2(quant="int8")
    v = jax.jit(mf.init)(jax.random.PRNGKey(0), x)
    yf = np.asarray(jax.jit(mf.apply)(v, x))
    yq = np.asarray(jax.jit(mq.apply)(v, x))
    assert np.isfinite(yq).all()
    assert _corr(yf, yq) > 0.99


def test_int8_static_calibrated_matches_dynamic_on_calib_batch():
    """After calibrating on a batch, static scales on that same batch equal
    the dynamic scales, so the outputs must be bitwise identical; a fresh
    batch with smaller activations stays within quant noise of float."""
    from deepfake_tpu.models.inception_resnet_v2 import BlockA
    from deepfake_tpu.models.registry import calibrate_act_scales

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 320)).astype(np.float32))
    mdyn = BlockA(quant="int8")
    mstat = BlockA(quant="int8_static")
    v = mdyn.init(jax.random.PRNGKey(0), x)
    v = {k: t for k, t in v.items() if k != "quant_cache"}  # init-created
    vc = calibrate_act_scales(mstat, v, [(x,)])
    assert "quant_cache" in vc and jtu.tree_leaves(vc["quant_cache"])
    y_dyn = np.asarray(mdyn.apply(v, x))
    y_stat = np.asarray(mstat.apply(vc, x))
    # the calibrated scales equal the dynamic ones on the calibration batch,
    # but the two forwards are DIFFERENT compiled graphs (the calibration
    # pass computes the max in-graph; the static pass reads a scalar), so
    # low-bit FMA/fusion drift can flip values sitting exactly on a
    # round-to-nearest boundary — compare within quant noise, not bitwise
    assert _corr(y_dyn, y_stat) > 0.999
    assert np.abs(y_dyn - y_stat).max() / np.abs(y_dyn).max() < 0.05

    # uncalibrated static falls back to the identical dynamic computation
    y_fb = np.asarray(mstat.apply(v, x))
    np.testing.assert_array_equal(y_dyn, y_fb)


def test_int8_static_scales_are_running_max_over_batches():
    from deepfake_tpu.models.layers import ConvBnRelu
    from deepfake_tpu.models.registry import calibrate_act_scales

    rng = np.random.default_rng(6)
    small = jnp.asarray(rng.standard_normal((1, 6, 6, 8)).astype(np.float32))
    big = small * 4.0
    m = ConvBnRelu(8, (3, 3), 1, 1, use_bias=False, quant="int8_static")
    v = m.init(jax.random.PRNGKey(0), small)
    v = {k: t for k, t in v.items() if k != "quant_cache"}
    v1 = calibrate_act_scales(m, v, [(small,), (big,)])
    v2 = calibrate_act_scales(m, v, [(big,), (small,)])
    a1 = jtu.tree_leaves(v1["quant_cache"])[0]
    a2 = jtu.tree_leaves(v2["quant_cache"])[0]
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(
        np.asarray(a1), np.abs(np.asarray(big)).max(), rtol=1e-6)


def test_submitctl_strips_stale_quant_cache_on_weight_load():
    """SubmitCtl weight loads must not carry init-derived activation scales
    (data-staleness analogue of the ADVICE-r4 bias-cache fix)."""
    from deepfake_tpu.config import Config
    from deepfake_tpu.train.submit import SubmitCtl
    from deepfake_tpu.models.registry import build_model

    cfg = Config()
    cfg.data.modality = "video"
    cfg.data.num_frames = 2
    cfg.data.frame_size = 96  # smallest side the VALID-conv reductions allow
    cfg.model.irv2_quant = "int8_static"
    model = build_model(cfg)
    ctl = SubmitCtl(model, cfg, data=None)
    assert "quant_cache" not in ctl.variables
    ctl.calibrate([jnp.zeros((1, 2, 96, 96, 3)) + 0.5])
    assert "quant_cache" in ctl.variables


def test_int8_scope_env_gates_shapes(monkeypatch):
    """DEEPFAKE_TPU_INT8_SCOPE=pointwise must route non-1x1 convs to the
    float path (bitwise-identical to the float module) while 1x1 stays
    quantized."""
    from deepfake_tpu.models.layers import int8_shape_allowed

    monkeypatch.setenv("DEEPFAKE_TPU_INT8_SCOPE", "pointwise")
    assert int8_shape_allowed((1, 1), 1, 320)
    assert not int8_shape_allowed((3, 3), 1, 320)
    assert not int8_shape_allowed((1, 1), 2, 320)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    mf = ConvBnRelu(8, (3, 3), 1, 1, use_bias=False)
    mq = ConvBnRelu(8, (3, 3), 1, 1, use_bias=False, quant="int8")
    v = mf.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(
        np.asarray(mf.apply(v, x)), np.asarray(mq.apply(v, x)))

    m1f = ConvBnRelu(8, (1, 1), 1, 0, use_bias=False)
    m1q = ConvBnRelu(8, (1, 1), 1, 0, use_bias=False, quant="int8")
    v1 = m1f.init(jax.random.PRNGKey(0), x)
    assert not np.array_equal(
        np.asarray(m1f.apply(v1, x)), np.asarray(m1q.apply(v1, x)))

    monkeypatch.setenv("DEEPFAKE_TPU_INT8_SCOPE", "wide")
    assert int8_shape_allowed((3, 3), 1, 320)
    assert not int8_shape_allowed((3, 3), 1, 3)
    assert not int8_shape_allowed((3, 3), 2, 320)


def test_int8_scope_default_is_all_off_tpu():
    """Off-TPU the scope default must stay 'all' (the CPU parity suite
    exercises every shape class; the batch-hang is an XLA:TPU int8-conv
    lowering pathology — see BASELINE_MEASURED round-5 int8 section)."""
    import os

    from deepfake_tpu.models.layers import int8_shape_allowed

    assert os.environ.get("DEEPFAKE_TPU_INT8_SCOPE") is None
    assert jax.default_backend() == "cpu"
    assert int8_shape_allowed((3, 3), 2, 3)
