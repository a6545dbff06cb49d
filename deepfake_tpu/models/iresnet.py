"""Alternative video CNN backbones kept in the reference tree.

* iResNet — "improved ResNet" with start/end-block BatchNorm placement and
  MaxPool-assisted downsample shortcuts (reference: src/models/IResNet.py:20-245;
  instantiable as iResNet(Bottleneck, [2,2,2,2]), the commented-out alternative
  at IResNet.py:337).
* Res34 — GroupNorm ResNet-34 variant with BN shortcuts, LeakyReLU stem and
  GELU block activations, optional ReZero (reference: src/models/resnet34.py).

Neither is wired into the active video path (InceptionVideoClassifier uses
Inception-ResNet-v2), but both are part of the component inventory
(SURVEY.md §2 items 11-12). NHWC layouts.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepfake_tpu.models.layers import (
    avg_pool_torch,
    gelu_exact,
    max_pool_torch,
    torch_batchnorm,
)

Dtype = Any


def _conv(features, kernel, stride=1, name=None, use_bias=False, dtype=jnp.float32):
    pad = [(kernel // 2, kernel // 2)] * 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride), padding=pad,
                   use_bias=use_bias, dtype=dtype, name=name)


class BasicBlock(nn.Module):
    """(reference: IResNet.py:20-80)"""

    planes: int
    stride: int = 1
    downsample: str = "none"  # none | pool_conv | conv | pool
    start_block: bool = False
    end_block: bool = False
    exclude_bn0: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: torch_batchnorm(0, dtype=self.dtype, name=name)
        if self.start_block:
            out = _conv(self.planes, 3, self.stride, "conv1", dtype=self.dtype)(x)
        elif self.exclude_bn0:
            # faithful quirk: the reference's inplace ReLU (IResNet.py:34,56-57)
            # mutates x, so the residual identity becomes relu(x)
            x = nn.relu(x)
            out = _conv(self.planes, 3, self.stride, "conv1", dtype=self.dtype)(x)
        else:
            out = bn("bn0")(x, use_running_average=not train)
            out = _conv(self.planes, 3, self.stride, "conv1", dtype=self.dtype)(nn.relu(out))
        out = bn("bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, "conv2", dtype=self.dtype)(out)
        if self.start_block:
            out = bn("bn2")(out, use_running_average=not train)
        identity = _apply_downsample(
            self, x, self.planes, self.stride, train, dtype=self.dtype
        )
        out = out + identity
        if self.end_block:
            out = bn("bn2")(out, use_running_average=not train)
            out = nn.relu(out)
        return out


class Bottleneck(nn.Module):
    """(reference: IResNet.py:83-150); expansion 4."""

    planes: int
    stride: int = 1
    downsample: str = "none"
    start_block: bool = False
    end_block: bool = False
    exclude_bn0: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: torch_batchnorm(0, dtype=self.dtype, name=name)
        if self.start_block:
            out = _conv(self.planes, 1, 1, "conv1", dtype=self.dtype)(x)
        elif self.exclude_bn0:
            # faithful quirk: inplace ReLU residual (see BasicBlock)
            x = nn.relu(x)
            out = _conv(self.planes, 1, 1, "conv1", dtype=self.dtype)(x)
        else:
            out = bn("bn0")(x, use_running_average=not train)
            out = _conv(self.planes, 1, 1, "conv1", dtype=self.dtype)(nn.relu(out))
        out = nn.relu(bn("bn1")(out, use_running_average=not train))
        out = _conv(self.planes, 3, self.stride, "conv2", dtype=self.dtype)(out)
        out = nn.relu(bn("bn2")(out, use_running_average=not train))
        out = _conv(self.planes * self.expansion, 1, 1, "conv3", dtype=self.dtype)(out)
        if self.start_block:
            out = bn("bn3")(out, use_running_average=not train)
        identity = _apply_downsample(
            self, x, self.planes * self.expansion, self.stride, train, dtype=self.dtype
        )
        out = out + identity
        if self.end_block:
            out = bn("bn3")(out, use_running_average=not train)
            out = nn.relu(out)
        return out


def _apply_downsample(mod, x, out_planes, stride, train, dtype):
    """Shortcut variants (reference: IResNet.py:195-211)."""
    if mod.downsample == "pool_conv":
        y = max_pool_torch(x, 3, stride, 1)
        y = _conv(out_planes, 1, 1, "ds_conv", dtype=dtype)(y)
        return torch_batchnorm(0, dtype=dtype, name="ds_bn")(
            y, use_running_average=not train
        )
    if mod.downsample == "conv":
        y = _conv(out_planes, 1, 1, "ds_conv", dtype=dtype)(x)
        return torch_batchnorm(0, dtype=dtype, name="ds_bn")(
            y, use_running_average=not train
        )
    if mod.downsample == "pool":
        return max_pool_torch(x, 3, stride, 1)
    return x


class IResNet(nn.Module):
    """(reference: IResNet.py:153-245); all stages stride 2, global avg pool,
    no final fc (the reference comments it out, :176,243)."""

    block: str = "bottleneck"  # or "basic"
    layers: Sequence[int] = (2, 2, 2, 2)
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        expansion = 4 if self.block == "bottleneck" else 1
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = torch_batchnorm(64, dtype=self.dtype, name="bn1")(
            x, use_running_average=not train
        )
        x = nn.relu(x)
        inplanes = 64
        for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 2
            if stride != 1 and inplanes != planes * expansion:
                ds = "pool_conv"
            elif inplanes != planes * expansion:
                ds = "conv"
            elif stride != 1:
                ds = "pool"
            else:
                ds = "none"
            x = block_cls(planes, stride, ds, start_block=True, dtype=self.dtype,
                          name=f"layer{li + 1}_0")(x, train)
            inplanes = planes * expansion
            exclude = True
            idx = 1
            for _ in range(1, blocks - 1):
                x = block_cls(planes, 1, "none", exclude_bn0=exclude, dtype=self.dtype,
                              name=f"layer{li + 1}_{idx}")(x, train)
                exclude = False
                idx += 1
            x = block_cls(planes, 1, "none", end_block=True, exclude_bn0=exclude,
                          dtype=self.dtype, name=f"layer{li + 1}_{idx}")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class Res34ResidualBlock(nn.Module):
    """(reference: resnet34.py:4-25)"""

    features: int
    stride: int = 1
    has_shortcut: bool = False
    re_zero: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        left = _conv(self.features, 3, self.stride, "conv1", dtype=self.dtype)(x)
        left = nn.GroupNorm(num_groups=4, dtype=self.dtype, name="gn1")(left)
        left = _conv(self.features, 3, 1, "conv2", dtype=self.dtype)(left)
        left = nn.GroupNorm(num_groups=4, dtype=self.dtype, name="gn2")(left)
        if self.has_shortcut:
            right = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                            use_bias=False, dtype=self.dtype, name="sc_conv")(x)
            right = torch_batchnorm(self.features, dtype=self.dtype, name="sc_bn")(
                right, use_running_average=not train
            )
        else:
            right = x
        if self.re_zero:
            alpha = self.param("alpha", nn.initializers.zeros, (1,), jnp.float32)
            right = right * alpha
        return gelu_exact(left + right)


class Res34(nn.Module):
    """(reference: resnet34.py:28-67)"""

    out_channels: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=True, dtype=self.dtype, name="pre_conv")(x)
        x = nn.GroupNorm(num_groups=4, dtype=self.dtype, name="pre_gn")(x)
        x = nn.leaky_relu(x, 0.01)
        x = max_pool_torch(x, 3, 2, 1)
        for li, (feats, blocks, stride) in enumerate(
            [(128, 3, 1), (256, 4, 2), (512, 6, 2), (512, 3, 2)]
        ):
            x = Res34ResidualBlock(feats, stride, has_shortcut=True, dtype=self.dtype,
                                   name=f"layer{li + 1}_0")(x, train)
            for b in range(1, blocks):
                x = Res34ResidualBlock(feats, 1, dtype=self.dtype,
                                       name=f"layer{li + 1}_{b}")(x, train)
        x = avg_pool_torch(x, 7, 7)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.out_channels, dtype=self.dtype, name="fc")(x)
