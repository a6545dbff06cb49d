"""NeXtVLAD temporal aggregation + the active video classifier.

From-scratch flax implementation of the reference's NeXtVLAD layer and
InceptionVideoClassifier wrapper (reference: src/models/IResNet.py:247-393):
λ-expansion FC, grouped softmax assignment to K clusters, sigmoid group
attention, residual-to-centroid aggregation over frames, then a gated
embedding head (fc0/fc1/fc2 + sigmoid gates) and logistic output.

Reproduced quirks (all cited to the reference):
* BatchNorm1d(max_frames) normalises per *frame index* over (batch, G*K)
  (IResNet.py:267,282) — batch-stat axis is the frame axis;
* BatchNorm1d(1) on the flattened VLAD/hidden vectors normalises over
  (batch, features) with a single scalar stat (IResNet.py:268,325,347,349);
* F.normalize(vlad, 1) is an L1 normalisation along the group_size axis —
  positional arg 1 binds to p, dim stays at its default of 1 (IResNet.py:322);
* F.dropout on the VLAD output is ungated (active at inference)
  (IResNet.py:371-372) — only under parity_inference_dropout.

The einsum-heavy aggregation maps straight onto the MXU; the [B, M*G, K]
softmax-assignment tensors stay in registers/VMEM under XLA fusion.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepfake_tpu.models.inception_resnet_v2 import InceptionResNetV2
from deepfake_tpu.models.layers import torch_batchnorm

Dtype = Any


class NeXtVLAD(nn.Module):
    dim: int = 1024
    num_clusters: int = 64
    lamb: int = 2
    groups: int = 8
    max_frames: int = 300
    bn_momentum: float = 0.1  # torch semantics
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        # x: [B, M, N]
        B, M, N = x.shape
        G, K = self.groups, self.num_clusters
        group_size = (self.lamb * self.dim) // G

        x_dot = nn.Dense(self.lamb * self.dim, dtype=self.dtype, name="fc0")(x)
        x_tilde = x_dot.reshape(B, M, G, group_size)

        wgk = nn.Dense(G * K, dtype=self.dtype, name="fc_gk")(x_dot)  # [B, M, G*K]
        # BatchNorm1d(max_frames): frame axis is the channel axis (quirk)
        wgk = torch_batchnorm(M, self.bn_momentum, axis=1, dtype=self.dtype, name="bn0")(
            wgk, use_running_average=not train
        )
        wgk = wgk.reshape(B, M * G, K)
        alpha_gk = jax.nn.softmax(wgk, axis=-1)

        alpha_g = jax.nn.sigmoid(nn.Dense(G, dtype=self.dtype, name="fc_g")(x_dot))
        if mask is not None:
            alpha_g = alpha_g * mask[..., None]
        alpha_g = alpha_g.reshape(B, M * G, 1)

        activation = alpha_gk * alpha_g  # [B, M*G, K]
        a_sum = jnp.sum(activation, axis=-2, keepdims=True)  # [B, 1, K]
        cluster_weights2 = self.param(
            "cluster_weights2",
            lambda rng: jax.random.uniform(rng, (1, group_size, K), jnp.float32),
        )
        a = a_sum * cluster_weights2.astype(x.dtype)  # [B, group_size, K]

        reshaped_x_tilde = x_tilde.reshape(B, M * G, group_size)
        vlad = jnp.einsum(
            "bkm,bmg->bkg", activation.transpose(0, 2, 1), reshaped_x_tilde,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # [B, K, group_size]
        vlad = vlad.transpose(0, 2, 1) - a  # [B, group_size, K]
        # F.normalize(vlad, 1): L1 along dim=1 (group_size), eps 1e-12 (quirk)
        l1 = jnp.sum(jnp.abs(vlad), axis=1, keepdims=True)
        vlad = vlad / jnp.maximum(l1, 1e-12)
        vlad = vlad.reshape(B, 1, K * group_size)
        vlad = torch_batchnorm(1, self.bn_momentum, axis=1, dtype=self.dtype, name="bn1")(
            vlad, use_running_average=not train
        )
        return vlad.reshape(B, K * group_size)


class InceptionVideoClassifier(nn.Module):
    """Per-frame Inception-ResNet-v2 -> NeXtVLAD over time -> gated embedding
    -> logistic head (reference: IResNet.py:331-393)."""

    num_classes: int = 1
    num_clusters: int = 64
    lamb: int = 2
    hidden_size: int = 1024
    groups: int = 8
    drop_rate: float = 0.5
    classify_drop: float = 0.1
    gating_reduction: int = 8
    bn_momentum: float = 0.1
    use_feat: bool = False
    parity_inference_dropout: bool = False
    use_pallas: bool = False  # fused B/C block kernels at inference
    quant: str = None  # 'int8': MXU 8-bit conv trunk at inference
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, mask=None, train: bool = False, deterministic: bool = True,
        return_logits: bool = False,
    ):
        # x: [B, T, H, W, 3] NTHWC
        B, T = x.shape[:2]
        frames = x.reshape((B * T,) + x.shape[2:])
        feat = InceptionResNetV2(
            drop_rate=self.drop_rate,
            parity_inference_dropout=self.parity_inference_dropout,
            use_pallas=self.use_pallas,
            quant=self.quant,
            dtype=self.dtype,
            name="inception",
        )(frames, train=train, deterministic=deterministic)
        feat = feat.reshape(B, T, -1)  # [B, T, 1536]

        vlad = NeXtVLAD(
            dim=1536, num_clusters=self.num_clusters, lamb=self.lamb,
            groups=self.groups, max_frames=T, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="video_nextvlad",
        )(feat, mask=mask, train=train)

        det = deterministic and not self.parity_inference_dropout
        vlad = nn.Dropout(self.drop_rate, deterministic=det)(vlad)

        activation = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc0")(vlad)
        activation = torch_batchnorm(
            1, self.bn_momentum, axis=1, dtype=self.dtype, name="bn0"
        )(activation[:, None, :], use_running_average=not train)[:, 0, :]
        activation = nn.relu(activation)
        gates = nn.Dense(
            self.hidden_size // self.gating_reduction, dtype=self.dtype, name="fc1"
        )(activation)
        gates = torch_batchnorm(1, self.bn_momentum, axis=1, dtype=self.dtype, name="bn1")(
            gates[:, None, :], use_running_average=not train
        )[:, 0, :]
        gates = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(gates)
        gates = jax.nn.sigmoid(gates)
        feat = activation * gates  # [B, hidden]
        if self.use_feat:
            return feat
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="logistic")(feat)
        logits = jnp.squeeze(logits, -1) if self.num_classes == 1 else logits
        # classify_drop here is a gated nn.Dropout in the reference (IResNet.py:353)
        logits = nn.Dropout(self.classify_drop, deterministic=deterministic)(logits)
        if return_logits:
            return logits
        return jax.nn.sigmoid(logits)
