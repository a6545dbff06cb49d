"""Inception-ResNet-v2 per-frame CNN backbone (active video branch).

From-scratch flax/NHWC implementation of the reference's backbone
(reference: src/models/InceptionResV2.py:37-191): Stem -> 10x block A
(scale .17) -> Reduction-A(k=256,l=256,m=384,n=384) -> 20x block B (.10) ->
Reduction-B -> 9x block C (.20) + 1x block C (scale 1, no activation) ->
1x1 ConvBnRelu to 1536 -> global average pool.

All composite convs are Conv+BN(eps=1e-3)+ReLU; each residual block ends in a
*plain* biased 1x1 conv (no BN) before the scaled residual add. Pure XLA convs
(MXU); fusions are left to the compiler.

Faithful quirk: the reference applies F.dropout without training= gating after
the global pool (reference: InceptionResV2.py:189) — reproduced only under
``parity_inference_dropout``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from deepfake_tpu.models.layers import ConvBnRelu, avg_pool_torch, max_pool_torch

Dtype = Any


class Stem(nn.Module):
    """(reference: InceptionResV2.py:37-69) 299-style stem run at 224."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBnRelu(32, (3, 3), 2, "VALID", use_bias=False, dtype=d, name="f0")(x, train)
        x = ConvBnRelu(32, (3, 3), 1, "VALID", use_bias=False, dtype=d, name="f1")(x, train)
        x = ConvBnRelu(64, (3, 3), 1, 1, use_bias=False, dtype=d, name="f2")(x, train)
        x = max_pool_torch(x, 3, 2)
        x = ConvBnRelu(80, (1, 1), 1, 0, use_bias=False, dtype=d, name="f4")(x, train)
        x = ConvBnRelu(192, (3, 3), 1, "VALID", use_bias=False, dtype=d, name="f5")(x, train)
        x = max_pool_torch(x, 3, 2)
        b0 = ConvBnRelu(96, (1, 1), 1, 0, use_bias=False, dtype=d, name="b0")(x, train)
        b1 = ConvBnRelu(48, (1, 1), 1, 0, use_bias=False, dtype=d, name="b1_0")(x, train)
        b1 = ConvBnRelu(64, (5, 5), 1, 2, use_bias=False, dtype=d, name="b1_1")(b1, train)
        b2 = ConvBnRelu(64, (1, 1), 1, 0, use_bias=False, dtype=d, name="b2_0")(x, train)
        b2 = ConvBnRelu(96, (3, 3), 1, 1, use_bias=False, dtype=d, name="b2_1")(b2, train)
        b2 = ConvBnRelu(96, (3, 3), 1, 1, use_bias=False, dtype=d, name="b2_2")(b2, train)
        b3 = avg_pool_torch(x, 3, 1, 1, count_include_pad=False)
        b3 = ConvBnRelu(64, (1, 1), 1, 0, use_bias=False, dtype=d, name="b3_1")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 320


class BlockA(nn.Module):
    """(reference: InceptionResV2.py:72-94)"""

    scale: float = 0.17
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBnRelu(32, (1, 1), 1, 0, use_bias=False, dtype=d, name="b0")(x, train)
        b1 = ConvBnRelu(32, (1, 1), 1, 0, use_bias=False, dtype=d, name="b1_0")(x, train)
        b1 = ConvBnRelu(32, (3, 3), 1, 1, use_bias=False, dtype=d, name="b1_1")(b1, train)
        b2 = ConvBnRelu(32, (1, 1), 1, 0, use_bias=False, dtype=d, name="b2_0")(x, train)
        b2 = ConvBnRelu(48, (3, 3), 1, 1, use_bias=False, dtype=d, name="b2_1")(b2, train)
        b2 = ConvBnRelu(64, (3, 3), 1, 1, use_bias=False, dtype=d, name="b2_2")(b2, train)
        res = jnp.concatenate([b0, b1, b2], axis=-1)
        res = nn.Conv(320, (1, 1), use_bias=True, dtype=d, name="conv")(res)
        return nn.relu(x + self.scale * res)


class ReductionA(nn.Module):
    """(reference: InceptionResV2.py:19-35) k,l,m,n = 256,256,384,384"""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBnRelu(384, (3, 3), 2, "VALID", use_bias=False, dtype=d, name="b0")(x, train)
        b1 = ConvBnRelu(256, (1, 1), 1, 0, use_bias=False, dtype=d, name="b1_0")(x, train)
        b1 = ConvBnRelu(256, (3, 3), 1, 1, use_bias=False, dtype=d, name="b1_1")(b1, train)
        b1 = ConvBnRelu(384, (3, 3), 2, "VALID", use_bias=False, dtype=d, name="b1_2")(b1, train)
        b2 = max_pool_torch(x, 3, 2)
        return jnp.concatenate([b0, b1, b2], axis=-1)  # 1088


class BlockB(nn.Module):
    """(reference: InceptionResV2.py:97-114)"""

    scale: float = 0.10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBnRelu(192, (1, 1), 1, 0, use_bias=False, dtype=d, name="b0")(x, train)
        b1 = ConvBnRelu(128, (1, 1), 1, 0, use_bias=False, dtype=d, name="b1_0")(x, train)
        b1 = ConvBnRelu(160, (1, 7), 1, (0, 3), use_bias=False, dtype=d, name="b1_1")(b1, train)
        b1 = ConvBnRelu(192, (7, 1), 1, (3, 0), use_bias=False, dtype=d, name="b1_2")(b1, train)
        res = jnp.concatenate([b0, b1], axis=-1)
        res = nn.Conv(1088, (1, 1), use_bias=True, dtype=d, name="conv")(res)
        return nn.relu(x + self.scale * res)


class ReductionB(nn.Module):
    """(reference: InceptionResV2.py:117-140)"""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBnRelu(256, (1, 1), 1, 0, use_bias=False, dtype=d, name="b0_0")(x, train)
        b0 = ConvBnRelu(384, (3, 3), 2, "VALID", use_bias=False, dtype=d, name="b0_1")(b0, train)
        b1 = ConvBnRelu(256, (1, 1), 1, 0, use_bias=False, dtype=d, name="b1_0")(x, train)
        b1 = ConvBnRelu(288, (3, 3), 2, "VALID", use_bias=False, dtype=d, name="b1_1")(b1, train)
        b2 = ConvBnRelu(256, (1, 1), 1, 0, use_bias=False, dtype=d, name="b2_0")(x, train)
        b2 = ConvBnRelu(288, (3, 3), 1, 1, use_bias=False, dtype=d, name="b2_1")(b2, train)
        b2 = ConvBnRelu(320, (3, 3), 2, "VALID", use_bias=False, dtype=d, name="b2_2")(b2, train)
        b3 = max_pool_torch(x, 3, 2)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 2080


class BlockC(nn.Module):
    """(reference: InceptionResV2.py:143-163)"""

    scale: float = 0.20
    activation: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = ConvBnRelu(192, (1, 1), 1, 0, use_bias=False, dtype=d, name="b0")(x, train)
        b1 = ConvBnRelu(192, (1, 1), 1, 0, use_bias=False, dtype=d, name="b1_0")(x, train)
        b1 = ConvBnRelu(224, (1, 3), 1, (0, 1), use_bias=False, dtype=d, name="b1_1")(b1, train)
        b1 = ConvBnRelu(256, (3, 1), 1, (1, 0), use_bias=False, dtype=d, name="b1_2")(b1, train)
        res = jnp.concatenate([b0, b1], axis=-1)
        res = nn.Conv(2080, (1, 1), use_bias=True, dtype=d, name="conv")(res)
        out = x + self.scale * res
        return nn.relu(out) if self.activation else out


class InceptionResNetV2(nn.Module):
    """Full backbone -> [B, 1536] clip-frame features
    (reference: InceptionResV2.py:166-191)."""

    drop_rate: float = 0.0
    parity_inference_dropout: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        # x: [B, H, W, 3] NHWC
        x = Stem(dtype=self.dtype, name="stem")(x, train)
        for i in range(10):
            x = BlockA(0.17, dtype=self.dtype, name=f"a_{i}")(x, train)
        x = ReductionA(dtype=self.dtype, name="red_a")(x, train)
        for i in range(20):
            x = BlockB(0.10, dtype=self.dtype, name=f"b_{i}")(x, train)
        x = ReductionB(dtype=self.dtype, name="red_b")(x, train)
        for i in range(9):
            x = BlockC(0.20, dtype=self.dtype, name=f"c_{i}")(x, train)
        x = BlockC(1.0, activation=False, dtype=self.dtype, name="c_9")(x, train)
        x = ConvBnRelu(1536, (1, 1), 1, 0, use_bias=False, dtype=self.dtype, name="conv")(
            x, train
        )
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 1536]
        det = deterministic and not self.parity_inference_dropout
        x = nn.Dropout(self.drop_rate, deterministic=det)(x)
        return x
