"""Swin Transformer V2 (2D) — the spectrogram audio branch.

From-scratch flax implementation matching the reference's SwinV2
(reference: src/models/swin_transformer2d.py:16-643, instantiated as Swin-B
embed 128 / depths [2,2,18,2] / heads [4,8,16,32] / window 7 /
pretrained_window 16 at train.py:35). Architectural specifics reproduced:

* cosine attention: L2-normalised q,k; learnable per-head logit_scale clamped
  at log(100) then exponentiated (reference: swin_transformer2d.py:154-157);
* continuous relative position bias: MLP(2->512->heads) over a log-spaced
  relative-coordinate table, passed through 16*sigmoid (reference: :92-113,
  :159-164);
* single qkv projection with bias = [q_bias, 0, v_bias] (reference: :128-150);
* res-post-norm residuals: x + drop_path(norm(sublayer(x))) (reference:
  :301-304) with zero-initialised norm scales (_init_respostnorm, :447-452);
* shifted windows with cyclic roll and the -100 additive mask (reference:
  :245-268, :279-299); shift disabled when resolution <= window (:228-231);
* PatchMerging even/odd interleave, reduction then norm (reference: :343-364).

Layout is NHWC; window partition/reverse are pure reshape/transposes (free in
XLA). The attention inner loop can run through the Pallas kernel in
deepfake_tpu.ops.window_attn when ``use_pallas`` is set.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepfake_tpu.models.layers import DropPath, Mlp
from deepfake_tpu.ops.window_attn import cosine_window_attention

Dtype = Any


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, ws*ws, C] (reference: swin_transformer2d.py:35-47)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """[B*nW, ws*ws, C] -> [B, H, W, C] (reference: swin_transformer2d.py:50-64)."""
    C = windows.shape[-1]
    B = windows.shape[0] // (H * W // ws // ws)
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def relative_coords_table(ws: Tuple[int, int], pretrained_ws: Tuple[int, int]) -> np.ndarray:
    """Log-spaced relative coordinates, [1, 2Wh-1, 2Ww-1, 2]
    (reference: swin_transformer2d.py:97-113)."""
    h = np.arange(-(ws[0] - 1), ws[0], dtype=np.float32)
    w = np.arange(-(ws[1] - 1), ws[1], dtype=np.float32)
    table = np.stack(np.meshgrid(h, w, indexing="ij"), axis=-1)[None]  # 1,2Wh-1,2Ww-1,2
    denom = (
        (pretrained_ws[0] - 1, pretrained_ws[1] - 1)
        if pretrained_ws[0] > 0
        else (ws[0] - 1, ws[1] - 1)
    )
    table[..., 0] /= denom[0]
    table[..., 1] /= denom[1]
    table *= 8.0
    return np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)


def relative_position_index(ws: Tuple[int, int]) -> np.ndarray:
    """[N, N] index into the flattened bias table
    (reference: swin_transformer2d.py:116-126)."""
    coords = np.stack(
        np.meshgrid(np.arange(ws[0]), np.arange(ws[1]), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 0] *= 2 * ws[1] - 1
    return rel.sum(-1)


def shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Additive (-100) mask for SW-MSA, [nW, N, N]
    (reference: swin_transformer2d.py:245-264)."""
    img = np.zeros((H, W), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for ws_ in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, ws_] = cnt
            cnt += 1
    m = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA / SW-MSA with cosine attention + continuous relative bias."""

    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    pretrained_window_size: Tuple[int, int] = (0, 0)
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        B_, N, C = x.shape
        H = self.num_heads

        logit_scale = self.param(
            "logit_scale",
            lambda rng: jnp.log(10.0 * jnp.ones((H, 1, 1), jnp.float32)),
        )
        qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.lecun_normal(), (C, 3 * C), jnp.float32
        )
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,), jnp.float32)
            qkv_bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        else:
            qkv_bias = None

        qkv = x @ qkv_kernel.astype(self.dtype)
        if qkv_bias is not None:
            qkv = qkv + qkv_bias.astype(self.dtype)

        # continuous relative position bias (tiny MLP over the static table).
        # Param-only computation: at inference the post-sigmoid [H, N, N]
        # bias is precomputed once at weight-load time into "bias_cache"
        # (registry.precompute_bias_cache) — the MLP + gather + sigmoid
        # otherwise rerun every forward (config-2 trace finding applies to
        # the 2D branch of the fused headline too). Shape-guarded like 3D.
        bias = None
        if deterministic and self.has_variable("bias_cache", "cpb"):
            cached = self.get_variable("bias_cache", "cpb")
            if cached.shape == (H, N, N):
                bias = cached
        if bias is None:
            table = jnp.asarray(
                relative_coords_table(self.window_size, self.pretrained_window_size)
            )
            t = nn.Dense(512, dtype=jnp.float32, name="cpb_fc1")(table)
            t = nn.relu(t)
            t = nn.Dense(H, use_bias=False, dtype=jnp.float32, name="cpb_fc2")(t)
            t = t.reshape(-1, H)
            # expansion with a factorized adjoint (2D == the 3D helper at wd=1):
            # jnp.take's autodiff scatter-adds every block's [H,N,N] cotangent
            # into the 169-entry table before the CPB-MLP backward — serialised
            # on TPU; the banded-contraction custom_vjp is pure MXU work
            from deepfake_tpu.models.swin3d import _bias_expand_fn

            wh, ww = self.window_size
            bias = _bias_expand_fn(
                (1, wh, ww), (1, wh, ww), N, H, lane_major=H >= 8,
            )(t)
            bias = 16.0 * jax.nn.sigmoid(bias)
            # never during init: a cache baked from init-time params would
            # silently go stale when a checkpoint replaces "params"
            if (deterministic and not self.is_initializing()
                    and self.is_mutable_collection("bias_cache")):
                self.put_variable("bias_cache", "cpb", bias)

        scale = jnp.exp(jnp.minimum(logit_scale, jnp.log(1.0 / 0.01)))

        import os

        from deepfake_tpu.ops.pallas_window_attn import kernel_backend_ok

        use_packed_nhc = (
            self.use_pallas and deterministic and kernel_backend_ok()
            and N < 128 and B_ >= 2
        )
        # 2D TRAINING through the fused-backward kernel (VERDICT r3 next #4:
        # "2D training is pure einsum"): cosine attention reduces to the
        # scaled-dot train kernel by L2-normalising q/k and folding the
        # learnable per-head logit_scale into q OUTSIDE the kernel — XLA owns
        # those (cheap, elementwise) adjoints, the custom_vjp Pallas backward
        # owns the attention core, and the f32 [N,N] logits never round-trip
        # HBM in either pass. Default OFF pending a hardware A/B: three 2D
        # inference kernels lost to XLA at N=49 (BASELINE_MEASURED.md), and
        # the training economics (einsum writes+re-reads the f32 logits) may
        # or may not flip that. DEEPFAKE_TPU_2D_TRAIN_KERNEL=1 enables.
        use_nhc_train = (
            not deterministic and self.attn_drop == 0.0
            and kernel_backend_ok()
            and os.environ.get("DEEPFAKE_TPU_2D_TRAIN_KERNEL") == "1"
        )
        if use_nhc_train:
            from deepfake_tpu.ops.pallas_window_attn import (
                pallas_window_attention_nhc_train,
            )

            D = C // H

            def _norm_heads(t):
                # per-head L2 normalisation in token-major layout: heads are
                # contiguous D-lane ranges (torch qkv column order), so the
                # [B_,N,C]->[B_,N,H,D] split is a free minor-dim reshape
                t = t.reshape(B_, N, H, D).astype(jnp.float32)
                n = jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True))
                return t / jnp.maximum(n, 1e-12)

            qn = _norm_heads(qkv[..., :C]) * scale.reshape(1, 1, H, 1)
            kn = _norm_heads(qkv[..., C:2 * C])
            out = pallas_window_attention_nhc_train(
                qn.reshape(B_, N, C).astype(self.dtype),
                kn.reshape(B_, N, C).astype(self.dtype),
                qkv[..., 2 * C:],
                num_heads=H, bias=bias, mask=mask, scale=1.0,
            )
        elif use_packed_nhc:
            # token-major packed hybrid (VERDICT r2 next #5): heads stay in
            # lane slices (torch qkv column order q|k|v, heads contiguous),
            # windows pack along sublanes; no 5D head split/merge transposes
            from deepfake_tpu.ops.pallas_window_attn import (
                pallas_window_attention_nhc_packed,
            )

            q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
            out = pallas_window_attention_nhc_packed(
                q, k, v, num_heads=H, bias=bias, mask=mask, cosine=True,
                logit_scale=scale,
            )
        else:
            qkv = qkv.reshape(B_, N, 3, H, C // H).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]  # [B_, H, N, D]
            attn_out = cosine_window_attention(
                q, k, v, scale, bias, mask, use_pallas=self.use_pallas,
                attn_dropout=self.attn_drop if not deterministic else 0.0,
                dropout_rng=self.make_rng("dropout")
                if (not deterministic and self.attn_drop > 0)
                else None,
                # training keeps the max-stabilised softmax: a learnable
                # logit_scale past ln(68) would silently saturate the
                # static-shift clamp and zero those weights' gradients
                bounded=deterministic,
            )
            out = attn_out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class SwinBlock(nn.Module):
    """res-post-norm Swin block (reference: swin_transformer2d.py:199-306)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    pretrained_window_size: int = 0
    use_pallas: bool = False
    window_resident: bool = False  # input already [B*nW, N, C] in this
    # block's window layout; the stage loop owns the (single, composed)
    # re-windowing permutation between blocks — see SwinTransformerV2
    dtype: Dtype = jnp.float32

    def _drop_path_tokens(self, y, deterministic):
        """DropPath over window-resident tokens: rows of [B*nW, N, C] are
        sample-major, so a contiguous (free) reshape draws ONE keep-mask per
        ORIGINAL sample (the spatial path's per-sample stochastic-depth
        semantics), not per window."""
        if self.drop_path == 0.0 or deterministic:
            return y
        H, W = self.input_resolution
        ws = min(min(self.input_resolution), self.window_size)
        nW = (H // ws) * (W // ws)
        B_, N, C = y.shape
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(
            self.make_rng("dropout"), keep, (B_ // nW, 1, 1, 1)
        )
        y = y.reshape(B_ // nW, nW, N, C)
        y = jnp.where(mask, y / keep, jnp.zeros_like(y))
        return y.reshape(B_, N, C)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        H, W = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(self.input_resolution) <= ws:
            ws, shift = min(self.input_resolution), 0
        if self.window_resident:
            # tokens arrive window-partitioned (this block's shift layout);
            # every op below is token-wise, so no relayout happens here
            mask = (jnp.asarray(shift_attn_mask(H, W, ws, shift))
                    if shift > 0 else None)
            shortcut = x
            attn = WindowAttention(
                dim=x.shape[-1],
                window_size=(ws, ws),
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                attn_drop=self.attn_drop,
                proj_drop=self.drop,
                pretrained_window_size=(self.pretrained_window_size,) * 2,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name="attn",
            )(x, mask, deterministic)
            h = nn.LayerNorm(dtype=self.dtype,
                             scale_init=nn.initializers.zeros,
                             name="norm1")(attn)
            x = shortcut + self._drop_path_tokens(h, deterministic)
            y = Mlp(int(x.shape[-1] * self.mlp_ratio), x.shape[-1],
                    drop=self.drop, dtype=self.dtype, name="mlp")(
                x, deterministic)
            y = nn.LayerNorm(dtype=self.dtype,
                             scale_init=nn.initializers.zeros,
                             name="norm2")(y)
            return x + self._drop_path_tokens(y, deterministic)
        B, L, C = x.shape

        shortcut = x
        x = x.reshape(B, H, W, C)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw = window_partition(x, ws)

        mask = jnp.asarray(shift_attn_mask(H, W, ws, shift)) if shift > 0 else None
        attn = WindowAttention(
            dim=C,
            window_size=(ws, ws),
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            pretrained_window_size=(self.pretrained_window_size,) * 2,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="attn",
        )(xw, mask, deterministic)

        x = window_reverse(attn, ws, H, W)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(B, L, C)
        x = nn.LayerNorm(dtype=self.dtype, scale_init=nn.initializers.zeros, name="norm1")(x)
        x = shortcut + DropPath(self.drop_path)(x, deterministic)

        y = Mlp(int(C * self.mlp_ratio), C, drop=self.drop, dtype=self.dtype, name="mlp")(
            x, deterministic
        )
        y = nn.LayerNorm(dtype=self.dtype, scale_init=nn.initializers.zeros, name="norm2")(y)
        x = x + DropPath(self.drop_path)(y, deterministic)
        return x


class PatchMerging(nn.Module):
    """2x2 interleaved merge; reduction then norm (reference: :327-364)."""

    input_resolution: Tuple[int, int]
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = x.reshape(B, (H // 2) * (W // 2), 4 * C)
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class PatchEmbed(nn.Module):
    """4x4 conv patchify + optional norm (reference: :455-493). NHWC in."""

    patch_size: int = 4
    embed_dim: int = 96
    patch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="proj",
        )(x)
        x = x.reshape(B, (H // p) * (W // p), self.embed_dim)
        if self.patch_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class SwinTransformerV2(nn.Module):
    """Full model (reference: swin_transformer2d.py:503-634).

    ``__call__`` returns sigmoid probabilities (squeezed) like the reference;
    ``return_logits`` skips the sigmoid; ``use_feat`` returns the pooled
    pre-head feature for fusion (reference: :624-629).
    """

    img_size: int = 224
    patch_size: int = 4
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    pretrained_window_sizes: Sequence[int] = (0, 0, 0, 0)
    use_feat: bool = False
    use_pallas: bool = False
    # activation checkpointing per block (reference plumbs use_checkpoint at
    # swin_transformer2d.py:428-431; here it's jax.checkpoint/remat)
    remat: bool = False
    remat_policy: str = ""  # see layers.remat_wrap
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_logits: bool = False):
        # x: [B, H, W, 3] NHWC
        num_layers = len(self.depths)
        num_features = int(self.embed_dim * 2 ** (num_layers - 1))
        patches_res = self.img_size // self.patch_size

        x = PatchEmbed(
            self.patch_size, self.embed_dim, self.patch_norm, dtype=self.dtype,
            name="patch_embed",
        )(x)
        if self.ape:
            ape = self.param(
                "absolute_pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, patches_res * patches_res, self.embed_dim),
                jnp.float32,
            )
            x = x + ape.astype(self.dtype)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        import os

        for i in range(num_layers):
            dim = int(self.embed_dim * 2 ** i)
            res = patches_res // (2 ** i)
            from deepfake_tpu.models.layers import remat_wrap, stage_policy

            block_cls = remat_wrap(
                SwinBlock, *stage_policy(self.remat, self.remat_policy, i))
            # window-resident stage (same scheme as the 3D stack): tokens
            # stay window-partitioned across all blocks, the per-block
            # [reshape->roll->partition ... reverse->roll->reshape] chain
            # collapses to ONE composed permutation between consecutive
            # blocks (at 2D window sizes these relayouts are fixed-overhead
            # bound — traced 1.8 ms of the 6 ms SwinV2-B b8 forward).
            # Gathers carry exact custom_vjp adjoints, so training included.
            ws_eff = min(res, self.window_size)
            shift_amt = 0 if res <= ws_eff else ws_eff // 2
            # size gate (same rationale as the 3D stack's): the composed
            # gathers lose to the reshape/roll path on tiny activations —
            # measured b1 audio branch 764.9 resident vs 896.6 without
            # (-15%), b8 1676.3 vs 1560.8 (+7.4%). Gate on the model-input
            # scale so one model takes one path throughout.
            big_enough = (
                x.shape[0] * patches_res * patches_res * self.embed_dim
                >= 1_000_000
                or os.environ.get("DEEPFAKE_TPU_FORCE_WINDOW_RESIDENT") == "1"
            )
            resident = (
                big_enough
                and self.depths[i] >= 2 and res % ws_eff == 0
                and os.environ.get("DEEPFAKE_TPU_NO_WINDOW_RESIDENT") != "1"
            )
            common = dict(
                dim=dim,
                input_resolution=(res, res),
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                pretrained_window_size=self.pretrained_window_sizes[i],
                use_pallas=self.use_pallas,
                dtype=self.dtype,
            )
            if resident:
                from deepfake_tpu.models.swin3d import _token_permute_fn

                B = x.shape[0]
                L, N = res * res, ws_eff * ws_eff
                key3 = (1, res, res, (1, ws_eff, ws_eff))
                # single clamped window (res == ws, stage 3): the partition
                # permutation is the identity and no shifts occur — a plain
                # reshape avoids an identity gather pair
                identity = ws_eff >= res
                if identity:
                    xw = x.reshape(-1, N, dim)
                else:
                    part = _token_permute_fn(
                        ("shift",) + key3 + ((0, 0, 0),))
                    xw = part(x).reshape(-1, N, dim)
                prev = 0
                for j in range(self.depths[i]):
                    cur = 0 if j % 2 == 0 else shift_amt
                    if j > 0 and cur != prev:
                        rewin = _token_permute_fn(
                            ("composed",) + key3
                            + ((0, prev, prev), (0, cur, cur)))
                        xw = rewin(xw.reshape(B, L, dim)).reshape(-1, N, dim)
                    xw = block_cls(
                        shift_size=0 if j % 2 == 0 else self.window_size // 2,
                        drop_path=dpr[sum(self.depths[:i]) + j],
                        window_resident=True,
                        name=f"layers_{i}_blocks_{j}", **common,
                    )(xw, deterministic)
                    prev = cur
                if identity:
                    x = xw.reshape(B, L, dim)
                else:
                    unperm = _token_permute_fn(
                        ("inv",) + key3 + ((0, prev, prev),))
                    x = unperm(xw.reshape(B, L, dim))
            else:
                for j in range(self.depths[i]):
                    x = block_cls(
                        shift_size=0 if j % 2 == 0 else self.window_size // 2,
                        drop_path=dpr[sum(self.depths[:i]) + j],
                        name=f"layers_{i}_blocks_{j}", **common,
                    )(x, deterministic)
            if i < num_layers - 1:
                x = PatchMerging(
                    (res, res), dim, dtype=self.dtype, name=f"layers_{i}_downsample"
                )(x)

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = jnp.mean(x, axis=1)  # [B, num_features]
        if self.use_feat:
            return x
        logits = Mlp(256, self.num_classes, dtype=self.dtype, name="head")(
            x, deterministic
        )
        logits = jnp.squeeze(logits, -1) if self.num_classes == 1 else logits
        if return_logits:
            return logits
        out = nn.sigmoid(logits)
        # reference squeezes all singleton dims (torch.squeeze, :628)
        return jnp.squeeze(out)


def lse_pool(x: jnp.ndarray) -> jnp.ndarray:
    """LSE pooling over the token axis: [B, L, C] -> [B, C]
    (reference: swin_transformer2d.py:631-634 commonspace_proj)."""
    return jax.nn.logsumexp(x, axis=1)
