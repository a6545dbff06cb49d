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
from typing import Any, Dict, Mapping, Optional, Tuple

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
# Inception-ResNet-v2 + NeXtVLAD video branch
# (reference: src/models/InceptionResV2.py, src/models/IResNet.py:247-393)
# ---------------------------------------------------------------------------

def _cbr(sd, name):
    """ConvBnRelu: params + batch stats."""
    p = {"conv": t_conv2d(sd, f"{name}.conv"), "bn": t_norm(sd, f"{name}.bn")}
    s = {"bn": t_batchstats(sd, f"{name}.bn")}
    return p, s


def _branch(sd, prefix, spec):
    """spec: list of (our_name, ref_name) ConvBnRelu pairs."""
    p, s = {}, {}
    for ours, ref in spec:
        p[ours], s[ours] = _cbr(sd, f"{prefix}.{ref}")
    return p, s


def import_inception_resnet_v2(sd: Mapping[str, np.ndarray], prefix: str = ""):
    """Returns (params, batch_stats) for InceptionResNetV2. `prefix` addresses
    the backbone inside a larger state dict (e.g. 'inceptionRes.')."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    stem_spec = [
        ("f0", "features.0"), ("f1", "features.1"), ("f2", "features.2"),
        ("f4", "features.4"), ("f5", "features.5"),
        ("b0", "branch_0"), ("b1_0", "branch_1.0"), ("b1_1", "branch_1.1"),
        ("b2_0", "branch_2.0"), ("b2_1", "branch_2.1"), ("b2_2", "branch_2.2"),
        ("b3_1", "branch_3.1"),
    ]
    params["stem"], stats["stem"] = _branch(sd, "features.0", stem_spec)

    def res_block(idx, branch_spec):
        p, s = _branch(sd, f"features.{idx}", branch_spec)
        p["conv"] = t_conv2d(sd, f"features.{idx}.conv")
        return p, s

    a_spec = [("b0", "branch_0"), ("b1_0", "branch_1.0"), ("b1_1", "branch_1.1"),
              ("b2_0", "branch_2.0"), ("b2_1", "branch_2.1"), ("b2_2", "branch_2.2")]
    for i in range(10):
        params[f"a_{i}"], stats[f"a_{i}"] = res_block(1 + i, a_spec)

    red_a_spec = [("b0", "branch_0"), ("b1_0", "branch_1.0"),
                  ("b1_1", "branch_1.1"), ("b1_2", "branch_1.2")]
    params["red_a"], stats["red_a"] = _branch(sd, "features.11", red_a_spec)

    b_spec = [("b0", "branch_0"), ("b1_0", "branch_1.0"),
              ("b1_1", "branch_1.1"), ("b1_2", "branch_1.2")]
    for i in range(20):
        params[f"b_{i}"], stats[f"b_{i}"] = res_block(12 + i, b_spec)

    red_b_spec = [("b0_0", "branch_0.0"), ("b0_1", "branch_0.1"),
                  ("b1_0", "branch_1.0"), ("b1_1", "branch_1.1"),
                  ("b2_0", "branch_2.0"), ("b2_1", "branch_2.1"), ("b2_2", "branch_2.2")]
    params["red_b"], stats["red_b"] = _branch(sd, "features.32", red_b_spec)

    c_spec = [("b0", "branch_0"), ("b1_0", "branch_1.0"),
              ("b1_1", "branch_1.1"), ("b1_2", "branch_1.2")]
    for i in range(10):
        params[f"c_{i}"], stats[f"c_{i}"] = res_block(33 + i, c_spec)

    params["conv"], stats["conv"] = _cbr(sd, "conv")
    return params, stats


def _bn1d(sd, name):
    return t_norm(sd, name), t_batchstats(sd, name)


def import_nextvlad(sd: Mapping[str, np.ndarray], prefix: str = ""):
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    bn0_p, bn0_s = _bn1d(sd, "bn0")
    bn1_p, bn1_s = _bn1d(sd, "bn1")
    params = {
        "fc0": t_linear(sd, "fc0"),
        "fc_gk": t_linear(sd, "fc_gk"),
        "fc_g": t_linear(sd, "fc_g"),
        "cluster_weights2": _np(sd["cluster_weights2"]),
        "bn0": bn0_p,
        "bn1": bn1_p,
    }
    stats = {"bn0": bn0_s, "bn1": bn1_s}
    return params, stats


def import_inception_video(state_dict: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """InceptionVideoClassifier (reference: IResNet.py:331-393) ->
    {"params", "batch_stats"} variables for the flax module."""
    sd = strip_prefix(dict(state_dict), "module.")
    inc_p, inc_s = import_inception_resnet_v2(sd, "inceptionRes.")
    vlad_p, vlad_s = import_nextvlad(sd, "video_nextvlad.")
    bn0_p, bn0_s = _bn1d(sd, "bn0")
    bn1_p, bn1_s = _bn1d(sd, "bn1")
    params: Dict[str, Any] = {
        "inception": inc_p,
        "video_nextvlad": vlad_p,
        "fc0": t_linear(sd, "fc0"),
        "fc1": t_linear(sd, "fc1"),
        "fc2": t_linear(sd, "fc2"),
        "bn0": bn0_p,
        "bn1": bn1_p,
    }
    stats: Dict[str, Any] = {
        "inception": inc_s,
        "video_nextvlad": vlad_s,
        "bn0": bn0_s,
        "bn1": bn1_s,
    }
    if "logistic.weight" in sd:
        params["logistic"] = t_linear(sd, "logistic")
    return {"params": params, "batch_stats": stats}


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


# ---------------------------------------------------------------------------
# iResNet / Res34 alternative CNNs (reference: src/models/IResNet.py:20-245,
# src/models/resnet34.py)
# ---------------------------------------------------------------------------

def import_iresnet(
    state_dict: Mapping[str, np.ndarray],
    layers: Tuple[int, ...] = (2, 2, 2, 2),
    block: str = "bottleneck",
) -> Dict[str, Any]:
    sd = strip_prefix(dict(state_dict), "module.")
    params: Dict[str, Any] = {"conv1": t_conv2d(sd, "conv1"), "bn1": t_norm(sd, "bn1")}
    stats: Dict[str, Any] = {"bn1": t_batchstats(sd, "bn1")}
    n_bn = 3 if block == "bottleneck" else 2
    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            ref = f"layer{li + 1}.{bi}"
            ours = f"layer{li + 1}_{bi}"
            p, s = {}, {}
            for name in ["conv1", "conv2"] + (["conv3"] if block == "bottleneck" else []):
                p[name] = t_conv2d(sd, f"{ref}.{name}")
            for bn_i in range(n_bn + 1):
                key = f"{ref}.bn{bn_i}"
                if f"{key}.weight" in sd:
                    p[f"bn{bn_i}"] = t_norm(sd, key)
                    s[f"bn{bn_i}"] = t_batchstats(sd, key)
            if f"{ref}.downsample.1.weight" in sd and f"{ref}.downsample.2.weight" in sd:
                p["ds_conv"] = t_conv2d(sd, f"{ref}.downsample.1")
                p["ds_bn"] = t_norm(sd, f"{ref}.downsample.2")
                s["ds_bn"] = t_batchstats(sd, f"{ref}.downsample.2")
            elif f"{ref}.downsample.0.weight" in sd:
                p["ds_conv"] = t_conv2d(sd, f"{ref}.downsample.0")
                p["ds_bn"] = t_norm(sd, f"{ref}.downsample.1")
                s["ds_bn"] = t_batchstats(sd, f"{ref}.downsample.1")
            params[ours] = p
            if s:
                stats[ours] = s
    return {"params": params, "batch_stats": stats}


def import_res34(state_dict: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    sd = strip_prefix(dict(state_dict), "module.")
    params: Dict[str, Any] = {
        "pre_conv": t_conv2d(sd, "pre.0"),
        "pre_gn": t_norm(sd, "pre.1"),
        "fc": t_linear(sd, "fc"),
    }
    stats: Dict[str, Any] = {}
    for li, blocks in enumerate([3, 4, 6, 3]):
        for bi in range(blocks):
            ref = f"layer{li + 1}.{bi}"
            ours = f"layer{li + 1}_{bi}"
            p = {
                "conv1": t_conv2d(sd, f"{ref}.layers.0"),
                "gn1": t_norm(sd, f"{ref}.layers.1"),
                "conv2": t_conv2d(sd, f"{ref}.layers.2"),
                "gn2": t_norm(sd, f"{ref}.layers.3"),
            }
            if f"{ref}.residual.0.weight" in sd:
                p["sc_conv"] = t_conv2d(sd, f"{ref}.residual.0")
                p["sc_bn"] = t_norm(sd, f"{ref}.residual.1")
                stats[ours] = {"sc_bn": t_batchstats(sd, f"{ref}.residual.1")}
            params[ours] = p
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Video Swin Transformer 3D (reference: src/models/video_swin_transformer.py)
# ---------------------------------------------------------------------------

def import_swin3d(
    state_dict: Mapping[str, np.ndarray],
    depths: Tuple[int, ...] = (2, 2, 18, 2),
    prefix: str = "",
) -> Dict[str, Any]:
    """SwinTransformer3D backbone params (no batch stats — LN only)."""
    sd = {k[len(prefix):]: v for k, v in dict(state_dict).items() if k.startswith(prefix)}
    sd = strip_prefix(sd, "module.")
    sd = strip_prefix(sd, "backbone.")  # Kinetics-format checkpoints
    params: Dict[str, Any] = {
        "patch_embed": {"proj": t_conv3d(sd, "patch_embed.proj")},
    }
    if "patch_embed.norm.weight" in sd:
        params["patch_embed"]["norm"] = t_norm(sd, "patch_embed.norm")
    for i, depth in enumerate(depths):
        for j in range(depth):
            b = f"layers.{i}.blocks.{j}"
            params[f"layers_{i}_blocks_{j}"] = {
                "norm1": t_norm(sd, f"{b}.norm1"),
                "norm2": t_norm(sd, f"{b}.norm2"),
                "attn": {
                    "relative_position_bias_table": _np(
                        sd[f"{b}.attn.relative_position_bias_table"]
                    ),
                    "qkv": t_linear(sd, f"{b}.attn.qkv"),
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
    return params


def import_pooling_mlp(
    sd: Mapping[str, np.ndarray], prefix: str
) -> Tuple[Dict[str, Any], Optional[Dict[str, Any]]]:
    """PoolingMLP head (reference: video_swin_transformer.py:688-731).
    Returns (params, batch_stats_or_None); the Attention variant carries the
    conv-downsampler BN stats and 6 torch TransformerEncoderLayer blocks
    (in_proj_weight/bias are raw parameters, not a submodule)."""
    params: Dict[str, Any] = {}
    stats: Optional[Dict[str, Any]] = None
    if f"{prefix}mlp.fc1.weight" in sd:
        params["mlp"] = {
            "fc1": t_linear(sd, f"{prefix}mlp.fc1"),
            "fc2": t_linear(sd, f"{prefix}mlp.fc2"),
        }
    if f"{prefix}cls" in sd:  # Attention pooling
        params.update({
            "down_conv1": t_conv2d(sd, f"{prefix}downsample.0"),
            "down_bn1": t_norm(sd, f"{prefix}downsample.1"),
            "down_conv2": t_conv2d(sd, f"{prefix}downsample.2"),
            "down_bn2": t_norm(sd, f"{prefix}downsample.3"),
            "cls": _np(sd[f"{prefix}cls"]),
            "pos_embedding": _np(sd[f"{prefix}pos_embedding"]),
            "projection": {
                "fc1": t_linear(sd, f"{prefix}projection.fc1"),
                "fc2": t_linear(sd, f"{prefix}projection.fc2"),
            },
        })
        for li in range(6):
            tp = f"{prefix}selfAttention.layers.{li}."
            params[f"enc_{li}"] = {
                "in_proj": {
                    "kernel": _np(sd[f"{tp}self_attn.in_proj_weight"]).T,
                    "bias": _np(sd[f"{tp}self_attn.in_proj_bias"]),
                },
                "out_proj": t_linear(sd, f"{tp}self_attn.out_proj"),
                "linear1": t_linear(sd, f"{tp}linear1"),
                "linear2": t_linear(sd, f"{tp}linear2"),
                "norm1": t_norm(sd, f"{tp}norm1"),
                "norm2": t_norm(sd, f"{tp}norm2"),
            }
        stats = {
            "down_bn1": t_batchstats(sd, f"{prefix}downsample.1"),
            "down_bn2": t_batchstats(sd, f"{prefix}downsample.3"),
        }
    return params, stats


def import_video_classifier(
    state_dict: Mapping[str, np.ndarray], depths: Tuple[int, ...] = (2, 2, 18, 2)
) -> Dict[str, Any]:
    """VideoClassifier (reference: video_swin_transformer.py:734-793; note the
    reference spells the head module 'classsifier').
    Returns {"params", "batch_stats"} (stats empty for the mean-pool head)."""
    sd = strip_prefix(dict(state_dict), "module.")
    head_prefix = "classsifier." if any(k.startswith("classsifier.") for k in sd) else "classifier."
    head_params, head_stats = import_pooling_mlp(sd, head_prefix)
    params: Dict[str, Any] = {
        "videoSwinT": import_swin3d(sd, depths, prefix="videoSwinT."),
        "classifier": head_params,
    }
    out: Dict[str, Any] = {"params": params}
    if head_stats:
        out["batch_stats"] = {"classifier": head_stats}
    return out


def inflate_swin2d_to_3d(
    state_dict: Mapping[str, np.ndarray],
    depths: Tuple[int, ...] = (2, 2, 18, 2),
    patch_depth: int = 2,
    window: Tuple[int, int, int] = (8, 7, 7),
) -> Dict[str, np.ndarray]:
    """2D->3D weight inflation (reference: video_swin_transformer.py:566-632):
    center-repeat the patch-embed kernel over depth (divided by depth), and
    bicubic-resize + depth-tile each relative_position_bias_table. Input is a
    2D Swin 'backbone.'-style state dict; output feeds import_swin3d."""
    import torch
    import torch.nn.functional as F

    sd = {k: _np(v) for k, v in dict(state_dict).items()}
    sd = strip_prefix(sd, "backbone.")
    sd = {k: v for k, v in sd.items()
          if "relative_position_index" not in k and "attn_mask" not in k}

    w = sd["patch_embed.proj.weight"]  # [C, 3, kh, kw]
    sd["patch_embed.proj.weight"] = (
        np.repeat(w[:, :, None], patch_depth, axis=2) / patch_depth
    )

    wd = window[0]
    target_l = (2 * window[1] - 1) * (2 * window[2] - 1)
    for k in [k for k in sd if "relative_position_bias_table" in k]:
        table = sd[k]  # [L1, nH]
        L1, nH = table.shape
        if L1 != target_l:
            S1 = int(L1 ** 0.5)
            t = torch.from_numpy(table).permute(1, 0).reshape(1, nH, S1, S1)
            t = F.interpolate(
                t, size=(2 * window[1] - 1, 2 * window[2] - 1), mode="bicubic"
            )
            table = t.reshape(nH, target_l).permute(1, 0).numpy()
        sd[k] = np.tile(table, (2 * wd - 1, 1))
    return sd


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


# ---------------------------------------------------------------------------
# FusionModel (reference: src/models/ModalFusion.py:7-99)
# ---------------------------------------------------------------------------

def _sub(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def import_fusion(
    state_dict: Mapping[str, np.ndarray],
    swin_depths: Tuple[int, ...] = (2, 2, 18, 2),
    wav_layers: int = 12,
) -> Dict[str, Any]:
    """Full fused model -> {"params", "batch_stats"} (covers the reference's
    per-branch checkpoint grafting, src/utils.py:262-292, by accepting either
    a fused state dict or branch dicts merged under vExtract./aExtract./paExtract.)."""
    sd = strip_prefix(dict(state_dict), "module.")
    video_vars = import_inception_video(_sub(sd, "vExtract."))
    params: Dict[str, Any] = {
        "video_extractor": video_vars["params"],
        "audio_extractor": import_swin2d(_sub(sd, "aExtract."), depths=swin_depths),
        "paudio_extractor": {
            "wav_model": import_wav2vec2(_sub(sd, "paExtract.wav_model."), wav_layers)
        },
        "video_projection": t_linear(sd, "video_projection"),
        "audio_projection": t_linear(sd, "audio_projection"),
        "paudio_projection": t_linear(sd, "paudio_projection"),
        "queries": t_linear(sd, "queries"),
        "keys": t_linear(sd, "keys"),
        "values": t_linear(sd, "values"),
        "attn_proj": {"kernel": _np(sd["attn_proj.weight"]).T},
        "norm": t_norm(sd, "norm"),
        "classify": {
            "fc1": t_linear(sd, "classify.fc1"),
            "fc2": t_linear(sd, "classify.fc2"),
        },
    }
    stats: Dict[str, Any] = {
        "video_extractor": video_vars["batch_stats"],
        "norm": t_batchstats(sd, "norm"),
    }
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# strict=False-style pretrained grafting (reference: src/utils.py:294-380
# load_pretrained — drop mismatched/missing keys, surface skips in the log)
# ---------------------------------------------------------------------------

def graft_pretrained(params, imported, logger=None, _path=""):
    """Merge `imported` (a nested param dict from an import_* function) into
    a copy of `params`: a leaf is taken when its path exists in params with
    the same shape; everything else is skipped and reported — the reference's
    strict=False semantics with its load-state warnings surfaced through the
    logger (reference: src/utils.py:374-375). Returns (merged, n_loaded,
    skipped_paths)."""
    skipped = []

    def rec(dst, src, path):
        loaded = 0
        out = dict(dst)
        for k, v in src.items():
            p = f"{path}/{k}" if path else k
            if k not in dst:
                skipped.append(p + " (missing in model)")
                continue
            if isinstance(v, Mapping) and isinstance(dst[k], Mapping):
                out[k], n = rec(dst[k], v, p)
                loaded += n
            elif hasattr(v, "shape") and hasattr(dst[k], "shape"):
                if tuple(v.shape) == tuple(dst[k].shape):
                    out[k] = np.asarray(v, dtype=np.float32)
                    loaded += 1
                else:
                    skipped.append(f"{p} (shape {tuple(v.shape)} vs {tuple(dst[k].shape)})")
            else:
                skipped.append(p + " (kind mismatch)")
        return out, loaded

    merged, n = rec(params, imported, _path)
    if logger is not None:
        for s in skipped:
            logger(f"[load_pretrained] skip {s}")
        logger(f"[load_pretrained] grafted {n} tensors, skipped {len(skipped)}")
    return merged, n, skipped
