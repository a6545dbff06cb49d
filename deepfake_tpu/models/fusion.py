"""Cross-modal fusion model + InfoNCE modal alignment.

From-scratch flax implementation of the reference's FusionModel
(reference: src/models/ModalFusion.py:7-99): three frozen-ish branch
extractors (video 1024-d, audio 1024-d, paudio 768-d) projected to a 512-d
common space, stacked as 3 tokens, a single QKV self-attention over the
3 tokens, then flatten -> Linear(1536->768, no bias) -> BatchNorm(m=0.08) ->
MLP -> sigmoid.

Faithful quirk: the reference scales the attention *after* softmax
(att = softmax(energy) * d^-0.5, reference: ModalFusion.py:51) — reproduced.

The InfoNCE alignment loss (cal_nce_loss, reference: :78-99) is implemented
and exposed; the reference computes it but leaves it disabled (:41-43), as do
we by default (optim.align_loss_rate wiring in the trainer).

VAModel (reference: src/models/ModalAlignment.py:4-47) is the standalone
video/audio InfoNCE alignment head.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepfake_tpu.models.audio2d import Audio2D
from deepfake_tpu.models.layers import Mlp, torch_batchnorm
from deepfake_tpu.models.nextvlad import InceptionVideoClassifier
from deepfake_tpu.models.swin2d import SwinTransformerV2

Dtype = Any


def infonce_pair_loss(p_a: jnp.ndarray, p_b: jnp.ndarray, soft: float) -> jnp.ndarray:
    """Symmetric InfoNCE over a batch of paired embeddings
    (reference: ModalFusion.py:78-99)."""
    pos = jnp.einsum("bd,bd->b", p_a, p_b)[:, None]
    lse_pos = jax.nn.logsumexp(pos / soft, axis=1)
    ab = jnp.einsum("bd,cd->bc", p_a, p_b)
    ba = jnp.einsum("bd,cd->bc", p_b, p_a)
    loss_ab = jnp.mean(jax.nn.logsumexp(ab / soft, axis=1) - lse_pos)
    loss_ba = jnp.mean(jax.nn.logsumexp(ba / soft, axis=1) - lse_pos)
    return loss_ab + loss_ba


class FusionModel(nn.Module):
    video_extractor: nn.Module
    audio_extractor: nn.Module
    paudio_extractor: nn.Module
    out_dim: int = 1
    common_dim: int = 512
    soft: float = 0.01
    classify_drop: float = 0.1
    bn_momentum: float = 0.08  # reference: ModalFusion.py:24
    dtype: Dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg) -> "FusionModel":
        m = cfg.model
        dtype = jnp.dtype(cfg.parallel.compute_dtype)
        video = InceptionVideoClassifier(
            num_classes=m.num_classes, drop_rate=m.swin_drop, use_feat=True,
            bn_momentum=m.bn_momentum,
            parity_inference_dropout=m.parity_inference_dropout,
            use_pallas=m.irv2_pallas_blocks,
            quant=None if m.irv2_quant == "none" else m.irv2_quant,
            dtype=dtype,
        )
        audio = SwinTransformerV2(
            img_size=cfg.data.audio_size,
            num_classes=m.num_classes, use_feat=True,
            embed_dim=m.swin2d_embed_dim, depths=tuple(m.swin2d_depths),
            num_heads=tuple(m.swin2d_heads), window_size=m.swin2d_window,
            pretrained_window_sizes=tuple(m.swin2d_pretrained_windows),
            remat=cfg.parallel.remat, remat_policy=cfg.parallel.remat_policy,
            use_pallas=m.swin2d_pallas_attn, dtype=dtype,
        )
        from deepfake_tpu.models.registry import wav_config

        paudio = Audio2D(
            num_classes=m.num_classes, use_feat=True, model_drop=m.swin_drop,
            wav_config=wav_config(cfg),
            parity_inference_dropout=m.parity_inference_dropout, dtype=dtype,
        )
        return cls(
            video_extractor=video, audio_extractor=audio, paudio_extractor=paudio,
            out_dim=m.num_classes, soft=m.soft, classify_drop=m.classify_drop,
            dtype=dtype,
        )

    @nn.compact
    def __call__(
        self,
        feature: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        train: bool = False,
        deterministic: bool = True,
        return_logits: bool = False,
        with_align_loss: bool = False,
    ):
        video_feat, audio_feat, paudio_feat = feature
        v_x = self.video_extractor(
            video_feat, train=train, deterministic=deterministic
        )  # [B, 1024]
        a_x = self.audio_extractor(audio_feat, deterministic=deterministic)  # [B, 1024]
        pa_x = self.paudio_extractor(paudio_feat, deterministic=deterministic)  # [B, 768]

        v_x = nn.Dense(self.common_dim, dtype=self.dtype, name="video_projection")(v_x)
        a_x = nn.Dense(self.common_dim, dtype=self.dtype, name="audio_projection")(a_x)
        pa_x = nn.Dense(self.common_dim, dtype=self.dtype, name="paudio_projection")(pa_x)

        align_loss = None
        if with_align_loss:
            align_loss = 0.5 * (
                infonce_pair_loss(v_x, a_x, self.soft)
                + infonce_pair_loss(v_x, pa_x, self.soft)
            )

        comb = jnp.stack([v_x, a_x, pa_x], axis=1)  # [B, 3, C]
        q = nn.Dense(self.common_dim, dtype=self.dtype, name="queries")(comb)
        k = nn.Dense(self.common_dim, dtype=self.dtype, name="keys")(comb)
        v = nn.Dense(self.common_dim, dtype=self.dtype, name="values")(comb)
        energy = jnp.einsum("bqd,bkd->bqk", q, k)
        # reference quirk: softmax first, THEN scale (ModalFusion.py:51)
        att = jax.nn.softmax(energy, axis=-1) * (self.common_dim ** -0.5)
        att = nn.Dropout(self.classify_drop, deterministic=deterministic)(att)
        out = jnp.einsum("bal,blv->bav", att, v)  # [B, 3, C]

        feat = out.reshape(out.shape[0], -1)  # [B, 3*C]
        feat = nn.Dense(768, use_bias=False, dtype=self.dtype, name="attn_proj")(feat)
        feat = torch_batchnorm(768, self.bn_momentum, dtype=self.dtype, name="norm")(
            feat, use_running_average=not train
        )
        feat = nn.Dropout(self.classify_drop, deterministic=deterministic)(feat)
        # the reference's classify Mlp keeps its default drop=0 (ModalFusion.py:25)
        logits = Mlp(256, self.out_dim, drop=0.0, dtype=self.dtype,
                     name="classify")(feat, deterministic)
        logits = jnp.squeeze(logits, -1) if self.out_dim == 1 else logits
        result = logits if return_logits else jax.nn.sigmoid(logits)
        if with_align_loss:
            return result, align_loss
        return result


class VAModel(nn.Module):
    """Standalone video/audio InfoNCE alignment
    (reference: src/models/ModalAlignment.py:4-47). The reference's loss
    einsums ('bmd,bnd->bbmn') require 2-D inputs where they degenerate to the
    pairwise form; we implement the evident intent via infonce_pair_loss."""

    video_extractor: nn.Module
    audio_extractor: nn.Module
    video_dim: int = 512
    audio_dim: int = 1024
    common_dim: int = 512
    soft_param: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        a_feat = self.audio_extractor(x, deterministic=deterministic)
        v_feat = self.video_extractor(x, deterministic=deterministic)
        a = nn.Dense(self.common_dim, dtype=self.dtype, name="audio_projection")(a_feat)
        v = nn.Dense(self.common_dim, dtype=self.dtype, name="video_projection")(v_feat)
        return infonce_pair_loss(v, a, self.soft_param)
