"""PyTorch/HF checkpoint importers.

Converts reference-world checkpoints (.pth state_dicts, HF safetensors) into
this framework's flax param pytrees, replacing the reference's checkpoint
surgery helpers (reference: src/utils.py:262-380 load_pre_fused /
load_pretrained, src/trainer.py:90-122 load_ckpt).

Conventions (torch -> flax):
  Linear   weight [out, in]        -> kernel [in, out] (transpose)
  Conv1d   weight [out, in/g, k]   -> kernel [k, in/g, out]
  Conv2d   weight [out, in, kh, kw]-> kernel [kh, kw, in, out]
  Conv3d   weight [out,in,kd,kh,kw]-> kernel [kd, kh, kw, in, out]
  *Norm    weight/bias             -> scale/bias
  BatchNorm running_mean/var       -> batch_stats mean/var
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import numpy as np


def strip_prefix(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Drop a key prefix (e.g. DataParallel's 'module.',
    reference: src/trainer.py:113-115)."""
    out = {}
    for k, v in sd.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def t_linear(sd, name) -> Dict[str, np.ndarray]:
    p = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        p["bias"] = _np(sd[f"{name}.bias"])
    return p


def t_conv1d(sd, name) -> Dict[str, np.ndarray]:
    p = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = _np(sd[f"{name}.bias"])
    return p


def t_conv2d(sd, name) -> Dict[str, np.ndarray]:
    p = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = _np(sd[f"{name}.bias"])
    return p


def t_conv3d(sd, name) -> Dict[str, np.ndarray]:
    p = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 4, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = _np(sd[f"{name}.bias"])
    return p


def t_norm(sd, name) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def t_batchstats(sd, name) -> Dict[str, np.ndarray]:
    return {
        "mean": _np(sd[f"{name}.running_mean"]),
        "var": _np(sd[f"{name}.running_var"]),
    }


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth / .safetensors file into a numpy state dict. For .pth the
    reference wraps weights as {'epoch','checkpoint','optimizer'}
    (reference: src/trainer.py:305-309) — unwrap 'checkpoint'/'state_dict'/'model'."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("checkpoint", "state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: _np(v) for k, v in obj.items()}


# ---------------------------------------------------------------------------
# wav2vec2-base (HF) -> deepfake_tpu.models.wav2vec2.Wav2Vec2Model
# ---------------------------------------------------------------------------

def _materialize_weight_norm(sd: Dict[str, np.ndarray], base: str) -> np.ndarray:
    """HF stores the positional conv with torch weight_norm(dim=2). Materialise
    w = g * v / ||v|| (norm over dims 0,1 per kernel position). Handles both
    legacy (weight_g/weight_v) and parametrized naming."""
    cands = [
        (f"{base}.weight_g", f"{base}.weight_v"),
        (
            f"{base}.parametrizations.weight.original0",
            f"{base}.parametrizations.weight.original1",
        ),
    ]
    for g_key, v_key in cands:
        if g_key in sd:
            g = _np(sd[g_key])
            v = _np(sd[v_key])
            norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
            return g * v / norm
    return _np(sd[f"{base}.weight"])


def import_wav2vec2(
    state_dict: Mapping[str, np.ndarray], num_layers: int = 12
) -> Dict[str, Any]:
    """Build the flax params tree for Wav2Vec2Model from an HF state dict
    (Wav2Vec2Model or Wav2Vec2ForCTC; 'wav2vec2.' prefixes are stripped)."""
    sd = strip_prefix(dict(state_dict), "wav2vec2.")

    fe: Dict[str, Any] = {}
    for i in range(7):
        fe[f"conv_{i}"] = t_conv1d(sd, f"feature_extractor.conv_layers.{i}.conv")
    fe["group_norm"] = t_norm(sd, "feature_extractor.conv_layers.0.layer_norm")

    fp = {
        "layer_norm": t_norm(sd, "feature_projection.layer_norm"),
        "projection": t_linear(sd, "feature_projection.projection"),
    }

    pos_w = _materialize_weight_norm(sd, "encoder.pos_conv_embed.conv")
    enc: Dict[str, Any] = {
        "pos_conv_embed": {
            "conv": {
                "kernel": pos_w.transpose(2, 1, 0),
                "bias": _np(sd["encoder.pos_conv_embed.conv.bias"]),
            }
        },
        "layer_norm": t_norm(sd, "encoder.layer_norm"),
    }
    for i in range(num_layers):
        b = f"encoder.layers.{i}"
        enc[f"layers_{i}"] = {
            "attention": {
                "q_proj": t_linear(sd, f"{b}.attention.q_proj"),
                "k_proj": t_linear(sd, f"{b}.attention.k_proj"),
                "v_proj": t_linear(sd, f"{b}.attention.v_proj"),
                "out_proj": t_linear(sd, f"{b}.attention.out_proj"),
            },
            "layer_norm": t_norm(sd, f"{b}.layer_norm"),
            "feed_forward": {
                "intermediate_dense": t_linear(sd, f"{b}.feed_forward.intermediate_dense"),
                "output_dense": t_linear(sd, f"{b}.feed_forward.output_dense"),
            },
            "final_layer_norm": t_norm(sd, f"{b}.final_layer_norm"),
        }

    params: Dict[str, Any] = {
        "feature_encoder": fe,
        "feature_projection": fp,
        "encoder": enc,
    }
    if "masked_spec_embed" in sd:
        params["masked_spec_embed"] = _np(sd["masked_spec_embed"])
    else:
        params["masked_spec_embed"] = np.zeros((768,), np.float32)
    return params


# ---------------------------------------------------------------------------
# Swin Transformer V2 (2D) -> deepfake_tpu.models.swin2d.SwinTransformerV2
# (reference: src/models/swin_transformer2d.py; buffers relative_coords_table /
#  relative_position_index / attn_mask are recomputed, matching the
#  reference's own loader which drops them: src/utils.py:298-311)
# ---------------------------------------------------------------------------

def import_swin2d(
    state_dict: Mapping[str, np.ndarray],
    depths: Tuple[int, ...] = (2, 2, 18, 2),
) -> Dict[str, Any]:
    sd = strip_prefix(dict(state_dict), "module.")
    params: Dict[str, Any] = {}
    params["patch_embed"] = {
        "proj": t_conv2d(sd, "patch_embed.proj"),
        "norm": t_norm(sd, "patch_embed.norm"),
    }
    for i, depth in enumerate(depths):
        for j in range(depth):
            b = f"layers.{i}.blocks.{j}"
            params[f"layers_{i}_blocks_{j}"] = {
                "norm1": t_norm(sd, f"{b}.norm1"),
                "norm2": t_norm(sd, f"{b}.norm2"),
                "attn": {
                    "logit_scale": _np(sd[f"{b}.attn.logit_scale"]),
                    "qkv_kernel": _np(sd[f"{b}.attn.qkv.weight"]).T,
                    "q_bias": _np(sd[f"{b}.attn.q_bias"]),
                    "v_bias": _np(sd[f"{b}.attn.v_bias"]),
                    "cpb_fc1": t_linear(sd, f"{b}.attn.cpb_mlp.0"),
                    "cpb_fc2": t_linear(sd, f"{b}.attn.cpb_mlp.2"),
                    "proj": t_linear(sd, f"{b}.attn.proj"),
                },
                "mlp": {
                    "fc1": t_linear(sd, f"{b}.mlp.fc1"),
                    "fc2": t_linear(sd, f"{b}.mlp.fc2"),
                },
            }
        if f"layers.{i}.downsample.reduction.weight" in sd:
            params[f"layers_{i}_downsample"] = {
                "reduction": t_linear(sd, f"layers.{i}.downsample.reduction"),
                "norm": t_norm(sd, f"layers.{i}.downsample.norm"),
            }
    params["norm"] = t_norm(sd, "norm")
    if "head.fc1.weight" in sd:
        params["head"] = {
            "fc1": t_linear(sd, "head.fc1"),
            "fc2": t_linear(sd, "head.fc2"),
        }
    if "absolute_pos_embed" in sd:
        params["absolute_pos_embed"] = _np(sd["absolute_pos_embed"])
    return params


def import_audio2d(state_dict: Mapping[str, np.ndarray]) -> Tuple[Dict[str, Any], None]:
    """Audio2D (reference: src/models/audioTransformer.py) — wav2vec2 backbone
    under 'wav_model.' plus the mlp/norm/classifier head."""
    sd = strip_prefix(dict(state_dict), "module.")
    params: Dict[str, Any] = {
        "wav_model": import_wav2vec2(strip_prefix(sd, "wav_model."))
    }
    if "classifier.weight" in sd:
        params["classifier"] = t_linear(sd, "classifier")
    if "mlp.fc1.weight" in sd:
        params["mlp"] = {"fc1": t_linear(sd, "mlp.fc1"), "fc2": t_linear(sd, "mlp.fc2")}
        params["norm"] = t_norm(sd, "norm")
    return params, None
