"""Per-modality model construction (reference: train.py:31-49, test.py:30-46).

``build_model(cfg)`` returns (module, input_signature) for the configured
modality; the fused model composes the three branch extractors exactly as the
reference's FusionModel constructor does.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from deepfake_tpu.config import Config


def _dtype(cfg: Config):
    return jnp.dtype(cfg.parallel.compute_dtype)


def wav_config(cfg: Config):
    from deepfake_tpu.models.wav2vec2 import Wav2Vec2Config

    m = cfg.model
    return Wav2Vec2Config(
        conv_dim=(m.wav_conv_dim,) * 7,
        hidden_size=m.wav_hidden,
        num_hidden_layers=m.wav_layers,
        num_attention_heads=m.wav_heads,
        intermediate_size=m.wav_intermediate,
        remat=cfg.parallel.remat,
        remat_policy=cfg.parallel.remat_policy,
    )


def build_model(cfg: Config):
    modality = cfg.data.modality
    m = cfg.model
    dtype = _dtype(cfg)
    if modality == "paudio":
        from deepfake_tpu.models.audio2d import Audio2D

        return Audio2D(
            num_classes=m.num_classes,
            model_drop=m.swin_drop,
            classify_drop=m.classify_drop,
            wav_config=wav_config(cfg),
            parity_inference_dropout=m.parity_inference_dropout,
            dtype=dtype,
        )
    if modality == "audio":
        from deepfake_tpu.models.swin2d import SwinTransformerV2

        return SwinTransformerV2(
            img_size=cfg.data.audio_size,
            num_classes=m.num_classes,
            embed_dim=m.swin2d_embed_dim,
            depths=tuple(m.swin2d_depths),
            num_heads=tuple(m.swin2d_heads),
            window_size=m.swin2d_window,
            pretrained_window_sizes=tuple(m.swin2d_pretrained_windows),
            remat=cfg.parallel.remat,
            remat_policy=cfg.parallel.remat_policy,
            use_pallas=m.swin2d_pallas_attn,
            dtype=dtype,
        )
    if modality == "video":
        from deepfake_tpu.models.nextvlad import InceptionVideoClassifier

        return InceptionVideoClassifier(
            num_classes=m.num_classes,
            drop_rate=m.swin_drop,
            classify_drop=m.classify_drop,
            bn_momentum=m.bn_momentum,
            parity_inference_dropout=m.parity_inference_dropout,
            use_pallas=m.irv2_pallas_blocks,
            quant=None if m.irv2_quant == "none" else m.irv2_quant,
            dtype=dtype,
        )
    if modality == "video_swin":
        from deepfake_tpu.models.swin3d import VideoClassifier

        return VideoClassifier(
            num_classes=m.num_classes,
            embed_dim=m.swin3d_embed_dim,
            depths=tuple(m.swin3d_depths),
            num_heads=tuple(m.swin3d_heads),
            patch_size=tuple(m.swin3d_patch),
            window_size=tuple(m.swin3d_window),
            drop_path_rate=m.swin3d_drop_path,
            num_hiddens=m.num_hiddens,
            pool=m.video_pool,
            classify_drop=m.classify_drop,
            use_pallas=m.swin3d_pallas_attn,
            remat=cfg.parallel.remat,
            remat_policy=cfg.parallel.remat_policy,
            dtype=dtype,
        )
    if modality == "fused":
        from deepfake_tpu.models.fusion import FusionModel

        return FusionModel.from_config(cfg)
    raise ValueError(f"unknown modality: {modality}")


def cast_inference_params(variables: Any, cfg: Config) -> Any:
    """Store params in compute_dtype for inference so each jitted forward
    skips the f32->bf16 cast (and re-read) of every parameter — ~1.6 GB of
    HBM traffic per fused-forward call at 271M params. flax modules receive
    already-cast leaves and use them as-is. batch_stats stay f32 (BatchNorm
    statistics precision); training paths never call this (f32 masters)."""
    import jax

    dtype = _dtype(cfg)
    if not cfg.parallel.infer_cast_params or dtype == jnp.float32:
        return variables

    def cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(dtype)
        return x

    out = dict(variables)
    out["params"] = jax.tree.map(cast, variables["params"])
    return out


def precompute_bias_cache(model, variables: Any, *inputs, cfg: Config = None) -> Any:
    """Populate the "bias_cache" collection: one jitted batch-agnostic
    forward with the collection mutable collects every window-attention
    module's expanded relative-position bias ([H, N, N], a pure function of
    params — swin2d.py CPB MLP+gather+sigmoid, swin3d.py table gather), and
    the merged variables make subsequent inference forwards skip that work
    (2.5 ms of the 5.5 ms config-2 b1 forward; round-4 trace in
    BASELINE_MEASURED.md). Call AFTER weights are final (checkpoint load /
    cast_inference_params) — modules shape-guard the cached entries, so a
    later geometry change only loses the speedup, never correctness.

    `inputs` must match the model's input geometry (batch 1 is enough; the
    bias is batch-independent)."""
    import functools

    import jax

    if cfg is not None and not cfg.parallel.infer_bias_cache:
        return variables
    # Drop any pre-existing cache first: the modules' read path serves a
    # shape-matching cached entry as-is, so passing stale entries through the
    # mutable forward would return them unchanged — after a checkpoint load
    # that means biases derived from the *old* params (ADVICE r4 high).
    variables = {k: v for k, v in variables.items() if k != "bias_cache"}
    fwd = jax.jit(functools.partial(
        model.apply, deterministic=True, mutable=["bias_cache"]))
    _, cache = fwd(variables, *inputs)
    if not cache.get("bias_cache"):
        return variables  # model has no window attention (e.g. paudio)
    out = dict(variables)
    out["bias_cache"] = cache["bias_cache"]  # stays on device — never fetch
    return out


def calibrate_act_scales(model, variables: Any, batches, cfg: Config = None) -> Any:
    """Populate the "quant_cache" collection for `model.irv2_quant=int8_static`:
    run the deterministic forward over `batches` (an iterable of input
    tuples) with the collection mutable; every quantized conv records the
    running max-abs of its input activation (layers.act_scale_for). The
    merged variables let serving forwards read a calibrated per-conv scalar
    scale instead of paying a dynamic max reduction per conv (~90 extra
    reductions per IRv2 forward in 'int8' mode).

    Like any post-training static quantization, the calibration batches must
    be representative: activations exceeding the calibrated max simply
    saturate (clip at ±127·scale). Call AFTER weights are final. Returns
    `variables` unchanged if the model has no quantized convs."""
    import functools
    import inspect

    import jax

    variables = {k: v for k, v in variables.items() if k != "quant_cache"}
    # top-level models take deterministic=; bare blocks/layers (tests) don't
    kw = ({"deterministic": True}
          if "deterministic" in inspect.signature(model.__call__).parameters
          else {})
    fwd = jax.jit(functools.partial(
        model.apply, mutable=["quant_cache"], **kw))
    cache = None
    for inputs in batches:
        seed = dict(variables)
        if cache is not None:
            # carry the running max forward: act_scale_for folds each
            # batch's max into the previous entry via jnp.maximum
            seed["quant_cache"] = cache
        _, mut = fwd(seed, *inputs)
        cache = mut.get("quant_cache") or cache
    if not cache:
        return variables
    out = dict(variables)
    out["quant_cache"] = cache  # scalars; stays on device
    return out


def example_inputs(cfg: Config, batch: int = 1) -> Tuple[Any, ...]:
    """Zero-filled example inputs with the canonical shapes per modality."""
    modality = cfg.data.modality
    t = cfg.data.num_frames
    s = cfg.data.frame_size
    wave = int(cfg.data.wave_seconds_buckets[0] * cfg.data.wave_sample_rate)
    a = cfg.data.audio_size
    if modality == "paudio":
        return (jnp.zeros((batch, wave), jnp.float32),)
    if modality == "audio":
        return (jnp.zeros((batch, a, a, 3), jnp.float32),)
    if modality in ("video", "video_swin"):
        return (jnp.zeros((batch, t, s, s, 3), jnp.float32),)
    if modality == "fused":
        return (
            (
                jnp.zeros((batch, t, s, s, 3), jnp.float32),
                jnp.zeros((batch, a, a, 3), jnp.float32),
                jnp.zeros((batch, wave), jnp.float32),
            ),
        )
    raise ValueError(modality)
