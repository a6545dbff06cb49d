"""Checkpoint save/restore (orbax) + reference-format import routing.

Replaces the reference's torch.save({'epoch','checkpoint','optimizer'}) cycle
(reference: src/trainer.py:303-309) and its load paths: fine-tune resume with
module.-prefix stripping (src/trainer.py:90-122), external pretrained loads
with buffer dropping / bicubic bias-table resize (src/utils.py:294-380),
per-branch grafting into the fusion model (src/utils.py:262-292), and 2D->3D
inflation (video_swin_transformer.py:566-632) — the torch-side conversions
live in deepfake_tpu.io.torch_import.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, state, epoch: int = 0) -> str:
    """Save {step, params, batch_stats, opt_state, epoch} to `path` (dir)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": np.asarray(epoch),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, state) -> Tuple[Any, int]:
    """Restore into the given state template; returns (state, epoch)."""
    ckptr = _checkpointer()
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": np.asarray(0),
    }
    restored = ckptr.restore(os.path.abspath(path), template)
    new_state = state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return new_state, int(restored["epoch"])


def graft_branch_checkpoints(
    variables: dict,
    cfg,
    audio_path: Optional[str] = None,
    video_path: Optional[str] = None,
    paudio_path: Optional[str] = None,
) -> dict:
    """Graft per-branch reference checkpoints into a fused model's variables
    (reference: src/utils.py:262-292 load_pre_fused — strips 'module.', drops
    the audio head, loads each branch extractor). Branch ckpts are the
    reference's per-modality .pth dicts. Returns new variables."""
    from deepfake_tpu.io import torch_import as ti

    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    if audio_path:
        sd = ti.load_torch_state_dict(audio_path)
        sd = {k: v for k, v in ti.strip_prefix(sd, "module.").items()
              if "head" not in k}  # reference drops head* keys (:270-271)
        params["audio_extractor"] = ti.import_swin2d(
            sd, tuple(cfg.model.swin2d_depths)
        )
    if video_path:
        v = ti.import_inception_video(ti.load_torch_state_dict(video_path))
        v["params"].pop("logistic", None)
        params["video_extractor"] = v["params"]
        stats["video_extractor"] = v["batch_stats"]
    if paudio_path:
        p, _ = ti.import_audio2d(ti.load_torch_state_dict(paudio_path))
        p.pop("classifier", None)
        p.pop("mlp", None)
        p.pop("norm", None)
        params["paudio_extractor"] = p
    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out


def load_params_from_torch(path: str, cfg) -> Tuple[Any, Optional[Any]]:
    """Import a reference .pth checkpoint for the configured modality.
    Returns (params, batch_stats_or_None)."""
    from deepfake_tpu.io import torch_import as ti

    sd = ti.load_torch_state_dict(path)
    modality = cfg.data.modality
    if modality == "paudio":
        params, _ = ti.import_audio2d(sd)
        return params, None
    if modality == "audio":
        return ti.import_swin2d(sd, tuple(cfg.model.swin2d_depths)), None
    if modality == "video":
        v = ti.import_inception_video(sd)
        return v["params"], v["batch_stats"]
    if modality == "video_swin":
        v = ti.import_video_classifier(sd, tuple(cfg.model.swin3d_depths))
        return v["params"], v.get("batch_stats")
    if modality == "fused":
        v = ti.import_fusion(sd, tuple(cfg.model.swin2d_depths))
        return v["params"], v["batch_stats"]
    raise ValueError(modality)
