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

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from deepfake_tpu.models.layers import (
    ConvBnRelu, RawBn, RawConv, avg_pool_torch, max_pool_torch, quant_conv,
    quantize_sym,
)

Dtype = Any


# Raw param-tree declarations moved to layers.py (shared with ConvBnRelu's
# int8 quant branch); aliased here for the fused-Pallas block paths.
_RawConv = RawConv
_RawBn = RawBn


class _RawConvBn(nn.Module):
    """ConvBnRelu's tree ({conv: kernel, bn: ...}), returning the 1x1/1xK/Kx1
    kernel plus the inference-folded BN affine for the fused block kernel."""

    features: int
    kshape: Sequence[int]
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, cin: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from deepfake_tpu.ops.pallas_inception import fold_bn

        w, _ = _RawConv(self.features, self.kshape, name="conv")(cin)
        scale, bias, mean, var = _RawBn(name="bn")(self.features)
        return w, fold_bn(scale, bias, mean, var, self.bn_eps)


class _S2dF0(nn.Module):
    """f0 (3x3 stride-2 VALID, 3->32ch) computed as a 2x2 stride-1 conv on the
    space-to-depth input [B,112,112,12]: the same 27 products per output tap
    (the kernel relayout zero-fills the 7 unused 4x4 receptive positions), but
    4x denser input lanes (12 vs 3 channels against the 128-lane register) and
    half the rows. Measured 0.70 vs 0.93 ms at 256 frames (scripts/
    bench_stem.py; BASELINE_MEASURED.md stem profile). Parameter tree is
    ConvBnRelu's exact {conv: kernel, bn: ...} — checkpoints/importers see no
    difference; the relayout happens in-graph (a 3x3x3x32 scatter, ~0)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax

        d = self.dtype
        cin = x.shape[-1]
        w, _ = _RawConv(32, (3, 3), name="conv")(cin)
        k = jnp.zeros((2, 2, 4 * cin, 32), w.dtype)
        for di in range(3):
            for dj in range(3):
                u, a = divmod(di, 2)
                v, b = divmod(dj, 2)
                g = a * 2 + b
                k = k.at[u, v, g * cin:(g + 1) * cin, :].set(w[di, dj])
        B, H, W, C = x.shape
        y = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(B, H // 2, W // 2, 4 * C)
        out = jax.lax.conv_general_dilated(
            y.astype(d), k.astype(d), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        from deepfake_tpu.models.layers import torch_batchnorm

        out = torch_batchnorm(32, eps=1e-3, dtype=d, name="bn")(
            out, use_running_average=not train
        )
        return nn.relu(out)


class Stem(nn.Module):
    """(reference: InceptionResV2.py:37-69) 299-style stem run at 224."""

    dtype: Dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        import os

        d = self.dtype
        q = self.quant
        # Space-to-depth f0 (stride-1 conv on a 2x2 depth-folded input):
        # the isolated f0 op is faster, but END-TO-END it is a measured LOSS
        # on the fused pipeline (round-4 sweep: b8 193.7 on vs 198.1 off,
        # b4 207.0 vs 216.4 — the relayout feeding f1 eats the gain), so the
        # s2d form is OPT-IN: DEEPFAKE_TPU_S2D_F0=1 for inference,
        # DEEPFAKE_TPU_S2D_TRAIN=1 for training (BN batch stats are over a
        # mathematically identical output, so parity holds in both modes).
        want_s2d = os.environ.get(
            "DEEPFAKE_TPU_S2D_TRAIN" if train else "DEEPFAKE_TPU_S2D_F0"
        ) == "1"
        if want_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = _S2dF0(dtype=d, name="f0")(x, train)
        else:
            x = ConvBnRelu(32, (3, 3), 2, "VALID", use_bias=False, dtype=d, quant=q, name="f0")(x, train)
        x = ConvBnRelu(32, (3, 3), 1, "VALID", use_bias=False, dtype=d, quant=q, name="f1")(x, train)
        x = ConvBnRelu(64, (3, 3), 1, 1, use_bias=False, dtype=d, quant=q, name="f2")(x, train)
        x = max_pool_torch(x, 3, 2)
        x = ConvBnRelu(80, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="f4")(x, train)
        x = ConvBnRelu(192, (3, 3), 1, "VALID", use_bias=False, dtype=d, quant=q, name="f5")(x, train)
        x = max_pool_torch(x, 3, 2)
        b0 = ConvBnRelu(96, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b0")(x, train)
        b1 = ConvBnRelu(48, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b1_0")(x, train)
        b1 = ConvBnRelu(64, (5, 5), 1, 2, use_bias=False, dtype=d, quant=q, name="b1_1")(b1, train)
        b2 = ConvBnRelu(64, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b2_0")(x, train)
        b2 = ConvBnRelu(96, (3, 3), 1, 1, use_bias=False, dtype=d, quant=q, name="b2_1")(b2, train)
        b2 = ConvBnRelu(96, (3, 3), 1, 1, use_bias=False, dtype=d, quant=q, name="b2_2")(b2, train)
        b3 = avg_pool_torch(x, 3, 1, 1, count_include_pad=False)
        b3 = ConvBnRelu(64, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b3_1")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 320



def _residual_conv(block, res, features: int, q, d, name: str = "conv"):
    """The plain biased 1x1 conv ending every residual block (no BN;
    reference: InceptionResV2.py:92,112,161). quant='int8'/'int8_static'
    runs it on the MXU 8-bit path with per-output-channel weight scales and
    a per-tensor activation scale (dynamic, or calibrated into `block`'s
    quant_cache); RawConv declares nn.Conv's exact tree."""
    from deepfake_tpu.models.layers import act_scale_for, quantize_to

    if q in ("int8", "int8_static"):
        w, b = RawConv(features, (1, 1), use_bias=True, name=name)(res.shape[-1])
        wq, ws = quantize_sym(w, axis=(0, 1, 2))
        xs = act_scale_for(block, res, q == "int8_static", name="res_act_amax")
        xq = quantize_to(res, xs)
        return quant_conv(
            xq, wq, 1, "VALID", out_scale=(xs * ws).reshape(1, 1, 1, -1),
            out_bias=b.astype(jnp.float32)).astype(d)
    return nn.Conv(features, (1, 1), use_bias=True, dtype=d, name=name)(res)


class BlockA(nn.Module):
    """(reference: InceptionResV2.py:72-94)"""

    scale: float = 0.17
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        q = self.quant
        if self.use_pallas and not train and x.shape[1] == x.shape[2]:
            from deepfake_tpu.ops.pallas_inception import fused_inception_block_a

            B, H, W, C = x.shape
            (w0, a0) = _RawConvBn(32, (1, 1), name="b0")(C)
            (w1, a1) = _RawConvBn(32, (1, 1), name="b1_0")(C)
            (w1b, a1b) = _RawConvBn(32, (3, 3), name="b1_1")(32)
            (w2, a2) = _RawConvBn(32, (1, 1), name="b2_0")(C)
            (w2b, a2b) = _RawConvBn(48, (3, 3), name="b2_1")(32)
            (w2c, a2c) = _RawConvBn(64, (3, 3), name="b2_2")(48)
            wf, bf = _RawConv(320, (1, 1), use_bias=True, name="conv")(128)
            wf = wf.reshape(128, C)
            flat, L = _pad_frames(x)
            out = fused_inception_block_a(
                flat,
                w0.reshape(C, 32).astype(d), a0,
                w1.reshape(C, 32).astype(d), a1,
                w1b.reshape(9, 32, 32).astype(d), a1b,
                w2.reshape(C, 32).astype(d), a2,
                w2b.reshape(9, 32, 48).astype(d), a2b,
                w2c.reshape(9, 48, 64).astype(d), a2c,
                wf[:32].astype(d), wf[32:64].astype(d), wf[64:].astype(d),
                bf.astype(jnp.float32).reshape(1, C),
                # 18 shifted-tap temporaries x three f32 branch accumulators
                # give block A ~9x block-size scoped-VMEM pressure
                side=W, frame_len=L, res_scale=self.scale,
                frames_per_block=max(1, 400_000 // (L * C)),
            )
            return _unpad_frames(out, x.shape, L)
        b0 = ConvBnRelu(32, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b0")(x, train)
        b1 = ConvBnRelu(32, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b1_0")(x, train)
        b1 = ConvBnRelu(32, (3, 3), 1, 1, use_bias=False, dtype=d, quant=q, name="b1_1")(b1, train)
        b2 = ConvBnRelu(32, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b2_0")(x, train)
        b2 = ConvBnRelu(48, (3, 3), 1, 1, use_bias=False, dtype=d, quant=q, name="b2_1")(b2, train)
        b2 = ConvBnRelu(64, (3, 3), 1, 1, use_bias=False, dtype=d, quant=q, name="b2_2")(b2, train)
        res = jnp.concatenate([b0, b1, b2], axis=-1)
        res = _residual_conv(self, res, 320, None if train else q, d)
        return nn.relu(x + self.scale * res)


class ReductionA(nn.Module):
    """(reference: InceptionResV2.py:19-35) k,l,m,n = 256,256,384,384"""

    dtype: Dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        q = self.quant
        b0 = ConvBnRelu(384, (3, 3), 2, "VALID", use_bias=False, dtype=d, quant=q, name="b0")(x, train)
        b1 = ConvBnRelu(256, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b1_0")(x, train)
        b1 = ConvBnRelu(256, (3, 3), 1, 1, use_bias=False, dtype=d, quant=q, name="b1_1")(b1, train)
        b1 = ConvBnRelu(384, (3, 3), 2, "VALID", use_bias=False, dtype=d, quant=q, name="b1_2")(b1, train)
        b2 = max_pool_torch(x, 3, 2)
        return jnp.concatenate([b0, b1, b2], axis=-1)  # 1088


def _pad_frames(x):
    """[B,H,W,C] -> ([B*L, C] flat frame-major rows, L) with L = H*W rounded
    up to a multiple of 8 (Pallas sublane divisibility); pad rows carry
    zeros in, garbage out, and are discarded by _unpad_frames."""
    B, H, W, C = x.shape
    L = -(-(H * W) // 8) * 8
    flat = x.reshape(B, H * W, C)
    if L != H * W:
        flat = jnp.pad(flat, ((0, 0), (0, L - H * W), (0, 0)))
    return flat.reshape(B * L, C), L


def _unpad_frames(flat, shape, L):
    B, H, W, C = shape
    out = flat.reshape(B, L, C)
    if L != H * W:
        out = out[:, : H * W]
    return out.reshape(B, H, W, C)


def _fused_block_apply(x, raws, side_k: int, scale: float, activation: bool,
                       dtype) -> jnp.ndarray:
    """Shared Pallas dispatch for blocks B/C: declare checkpoint-identical
    params via the raw modules, fold BN, run the fused VMEM-resident kernel
    (deepfake_tpu/ops/pallas_inception.py). x: [B, S, S, C] square."""
    from deepfake_tpu.ops.pallas_inception import fused_inception_block

    (w0, a0), (w1, a1), (wh, ah), (wv, av), (w2, b2) = raws
    B, H, W, C = x.shape
    n0 = w0.shape[-1]
    flat, L = _pad_frames(x)
    # frames per grid step: ~1M bf16 elements per in/out block (~2 MB);
    # Mosaic's scoped-VMEM peak runs several times the block size (f32
    # accumulators + per-tap shifted copies), so stay well under 16 MB
    per = max(1, 1_000_000 // (L * C))
    out = fused_inception_block(
        flat,
        w0.reshape(C, -1).astype(dtype), a0,
        w1.reshape(C, -1).astype(dtype), a1,
        wh.reshape(side_k, wh.shape[2], wh.shape[3]).astype(dtype), ah,
        wv.reshape(side_k, wv.shape[2], wv.shape[3]).astype(dtype), av,
        w2.reshape(-1, C)[:n0].astype(dtype),
        w2.reshape(-1, C)[n0:].astype(dtype),
        b2.astype(jnp.float32).reshape(1, C),
        side=W, frame_len=L, res_scale=scale, activation=activation,
        frames_per_block=per,
    )
    return _unpad_frames(out, x.shape, L)


class BlockB(nn.Module):
    """(reference: InceptionResV2.py:97-114)"""

    scale: float = 0.10
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        q = self.quant
        if self.use_pallas and not train and x.shape[1] == x.shape[2]:
            C = x.shape[-1]
            raws = [
                _RawConvBn(192, (1, 1), name="b0")(C),
                _RawConvBn(128, (1, 1), name="b1_0")(C),
                _RawConvBn(160, (1, 7), name="b1_1")(128),
                _RawConvBn(192, (7, 1), name="b1_2")(160),
                _RawConv(1088, (1, 1), use_bias=True, name="conv")(384),
            ]
            return _fused_block_apply(x, raws, 7, self.scale, True, d)
        b0 = ConvBnRelu(192, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b0")(x, train)
        b1 = ConvBnRelu(128, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b1_0")(x, train)
        b1 = ConvBnRelu(160, (1, 7), 1, (0, 3), use_bias=False, dtype=d, quant=q, name="b1_1")(b1, train)
        b1 = ConvBnRelu(192, (7, 1), 1, (3, 0), use_bias=False, dtype=d, quant=q, name="b1_2")(b1, train)
        res = jnp.concatenate([b0, b1], axis=-1)
        res = _residual_conv(self, res, 1088, None if train else q, d)
        return nn.relu(x + self.scale * res)


class ReductionB(nn.Module):
    """(reference: InceptionResV2.py:117-140)"""

    dtype: Dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        q = self.quant
        b0 = ConvBnRelu(256, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b0_0")(x, train)
        b0 = ConvBnRelu(384, (3, 3), 2, "VALID", use_bias=False, dtype=d, quant=q, name="b0_1")(b0, train)
        b1 = ConvBnRelu(256, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b1_0")(x, train)
        b1 = ConvBnRelu(288, (3, 3), 2, "VALID", use_bias=False, dtype=d, quant=q, name="b1_1")(b1, train)
        b2 = ConvBnRelu(256, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b2_0")(x, train)
        b2 = ConvBnRelu(288, (3, 3), 1, 1, use_bias=False, dtype=d, quant=q, name="b2_1")(b2, train)
        b2 = ConvBnRelu(320, (3, 3), 2, "VALID", use_bias=False, dtype=d, quant=q, name="b2_2")(b2, train)
        b3 = max_pool_torch(x, 3, 2)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 2080


class BlockC(nn.Module):
    """(reference: InceptionResV2.py:143-163)"""

    scale: float = 0.20
    activation: bool = True
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        q = self.quant
        if self.use_pallas and not train and x.shape[1] == x.shape[2]:
            C = x.shape[-1]
            raws = [
                _RawConvBn(192, (1, 1), name="b0")(C),
                _RawConvBn(192, (1, 1), name="b1_0")(C),
                _RawConvBn(224, (1, 3), name="b1_1")(192),
                _RawConvBn(256, (3, 1), name="b1_2")(224),
                _RawConv(2080, (1, 1), use_bias=True, name="conv")(448),
            ]
            return _fused_block_apply(x, raws, 3, self.scale, self.activation, d)
        b0 = ConvBnRelu(192, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b0")(x, train)
        b1 = ConvBnRelu(192, (1, 1), 1, 0, use_bias=False, dtype=d, quant=q, name="b1_0")(x, train)
        b1 = ConvBnRelu(224, (1, 3), 1, (0, 1), use_bias=False, dtype=d, quant=q, name="b1_1")(b1, train)
        b1 = ConvBnRelu(256, (3, 1), 1, (1, 0), use_bias=False, dtype=d, quant=q, name="b1_2")(b1, train)
        res = jnp.concatenate([b0, b1], axis=-1)
        res = _residual_conv(self, res, 2080, None if train else q, d)
        out = x + self.scale * res
        return nn.relu(out) if self.activation else out


class InceptionResNetV2(nn.Module):
    """Full backbone -> [B, 1536] clip-frame features
    (reference: InceptionResV2.py:166-191)."""

    drop_rate: float = 0.0
    parity_inference_dropout: bool = False
    # Fused Pallas kernels for the B/C residual blocks at inference
    # (VMEM-resident block; deepfake_tpu/ops/pallas_inception.py). Training
    # always uses the XLA path (live BatchNorm stats + autodiff).
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    # 'int8': BN-folded per-channel weight quant + dynamic per-tensor
    # activation quant on every ConvBnRelu and residual 1x1 (inference only;
    # the MXU runs 8-bit ops at ~2x the bf16 rate). Training ignores it.
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        # x: [B, H, W, 3] NHWC
        pallas = self.use_pallas
        q = self.quant
        x = Stem(dtype=self.dtype, quant=q, name="stem")(x, train)
        for i in range(10):
            x = BlockA(0.17, use_pallas=pallas, dtype=self.dtype, quant=q, name=f"a_{i}")(x, train)
        x = ReductionA(dtype=self.dtype, quant=q, name="red_a")(x, train)
        for i in range(20):
            x = BlockB(0.10, use_pallas=pallas, dtype=self.dtype, quant=q, name=f"b_{i}")(x, train)
        x = ReductionB(dtype=self.dtype, quant=q, name="red_b")(x, train)
        for i in range(9):
            x = BlockC(0.20, use_pallas=pallas, dtype=self.dtype, quant=q, name=f"c_{i}")(x, train)
        x = BlockC(1.0, activation=False, use_pallas=pallas, dtype=self.dtype, quant=q, name="c_9")(x, train)
        x = ConvBnRelu(1536, (1, 1), 1, 0, use_bias=False, dtype=self.dtype, quant=q, name="conv")(
            x, train
        )
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 1536]
        det = deterministic and not self.parity_inference_dropout
        x = nn.Dropout(self.drop_rate, deterministic=det)(x)
        return x
