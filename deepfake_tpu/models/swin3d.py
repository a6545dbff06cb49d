"""Video Swin Transformer (3D) + pooling classifier head.

From-scratch flax implementation of the reference's SwinTransformer3D stack
(reference: src/models/video_swin_transformer.py:42-793; canonical config
embed 96 / depths [2,2,18,2] / heads [3,6,12,24] / patch (2,4,4) / window
(8,7,7) / drop_path 0.1 / patch_norm, at :773-780). This was the original
video path and is part of the required component set (SURVEY.md §0).

Reproduced specifics:
* pre-norm blocks (v1-style), unlike the 2D V2 stack (reference: :219-278);
* standard scaled-dot window attention with a learnable 3D relative-position
  bias table indexed by precomputed 3D relative coordinates (:114-158);
* padding of (D,H,W) up to window multiples, 3D cyclic roll, per-window shift
  masks computed on the padded volume (:224-253, :320-333);
* per-dim window clamping: any dim <= window uses the dim and shift 0 (:75-88);
* spatial-only PatchMerging with norm BEFORE reduction (:281-316 — note the
  2D V2 stack uses the opposite order);
* head: PoolingMLP 'mean' pooling -> Mlp(768, hiddens, classes) -> sigmoid,
  also returning the per-frame pooled feature map (:688-731, :789-793).

Reference bugs not reproduced (documented): video_swin_transformer.py never
imports Mlp (NameError on instantiation — the file is dead at the entry
point, train.py:8-9), and its 'Attention' pooling feeds [batch, seq, dim]
into a seq-first torch TransformerEncoder; our attention pooling treats
axis 1 as the sequence, which is the evident intent.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepfake_tpu.models.layers import DropPath, Mlp, gelu_exact, torch_batchnorm
from deepfake_tpu.ops.window_attn import scaled_window_attention

Dtype = Any


def get_window_size(x_size, window_size, shift_size=None):
    """Clamp window/shift to dims (reference: video_swin_transformer.py:75-88)."""
    ws = list(window_size)
    ss = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            ws[i] = x_size[i]
            if ss is not None:
                ss[i] = 0
    return (tuple(ws), tuple(ss)) if ss is not None else tuple(ws)


def window_partition_3d(x: jnp.ndarray, ws: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B*nW, wd*wh*ww, C] (reference: :42-54)."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // ws[0], ws[0], H // ws[1], ws[1], W // ws[2], ws[2], C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, ws[0] * ws[1] * ws[2], C)


def window_reverse_3d(win: jnp.ndarray, ws, B, D, H, W) -> jnp.ndarray:
    """inverse of window_partition_3d (reference: :57-70)."""
    x = win.reshape(B, D // ws[0], H // ws[1], W // ws[2], ws[0], ws[1], ws[2], -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, -1)


def relative_position_index_3d(ws: Tuple[int, int, int]) -> np.ndarray:
    """[N, N] into the flattened 3D bias table (reference: :117-131)."""
    coords = np.stack(
        np.meshgrid(np.arange(ws[0]), np.arange(ws[1]), np.arange(ws[2]), indexing="ij")
    ).reshape(3, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0).copy()
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 2] += ws[2] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= 2 * ws[2] - 1
    return rel.sum(-1)


import functools

# gathers/window-resident stages lose below this activation size (measured:
# b1 shift gather -2%, MLP-tail small-batch losses; BASELINE_MEASURED.md).
# Module-level so tests can monkeypatch it to 0 and exercise the big paths
# on small tensors.
GATHER_MIN_ELEMENTS = 8_000_000


@functools.lru_cache(maxsize=None)
def shift_partition_indices(D, H, W, ws, ss) -> np.ndarray:
    """[nW*N] flat source-token index performing cyclic shift + window
    partition in ONE gather (vs 3 sequential HBM copies for the 3-axis
    jnp.roll plus a partition relayout; measured 0.23 vs 0.165 ms round trip
    at stage-2 scale, scripts/bench_shift_gather.py). Window order matches
    window_partition_3d; ss=(0,0,0) degenerates to the plain partition."""
    nd, nh, nw = D // ws[0], H // ws[1], W // ws[2]
    out = np.empty((nd, nh, nw, ws[0], ws[1], ws[2]), np.int32)
    d = np.arange(ws[0])
    i = np.arange(ws[1])
    j = np.arange(ws[2])
    for a in range(nd):
        gd = (a * ws[0] + d + ss[0]) % D
        for b in range(nh):
            gh = (b * ws[1] + i + ss[1]) % H
            for c in range(nw):
                gw = (c * ws[2] + j + ss[2]) % W
                out[a, b, c] = (
                    gd[:, None, None] * (H * W)
                    + gh[None, :, None] * W
                    + gw[None, None, :]
                )
    return out.reshape(-1)


@functools.lru_cache(maxsize=None)
def _inverse_indices(D, H, W, ws, ss) -> np.ndarray:
    return np.argsort(shift_partition_indices(D, H, W, ws, ss)).astype(np.int32)


@functools.lru_cache(maxsize=None)
def composed_shift_indices(D, H, W, ws, ss_from, ss_to) -> np.ndarray:
    """[nW*N] gather taking tokens ALREADY in the ss_from window layout
    directly to the ss_to window layout — the window-resident stage keeps
    activations partitioned across all blocks (every op between attentions
    is token-wise), so the per-block partition+reverse pair collapses to ONE
    permutation between consecutive blocks (the traced b8 forward spent
    ~11 ms/iter in these relayouts; scripts/trace_ops.py)."""
    inv_from = np.argsort(shift_partition_indices(D, H, W, ws, ss_from))
    return inv_from[shift_partition_indices(D, H, W, ws, ss_to)].astype(
        np.int32
    )


@functools.lru_cache(maxsize=None)
def merged_window_indices(D, H, W, ws_in, ss_in, ws_out) -> np.ndarray:
    """[L] source-row index (a permutation) taking tokens in the stage-i
    window layout (shift ss_in) DIRECTLY to PatchMerging quadrant rows in
    stage-(i+1) unshifted window order: output rows 4p+q are the four
    spatial 2x2-neighbour tokens (concat order x0=[0::2,0::2], x1=[1::2,
    0::2], x2=[0::2,1::2], x3=[1::2,1::2] — reference :292-296) of merged
    token p, p enumerated in the NEXT stage's window partition. A reshape
    to [.., L/4, 4C] then reproduces the spatial path's lane order exactly,
    so the resident stage never round-trips through the spatial layout
    (traced: 2.4 ms inverse gather + 2.6 ms relayout at stage-0 scale,
    scripts/trace_ops.py)."""
    inv_in = _inverse_indices(D, H, W, ws_in, ss_in)  # spatial -> layout pos
    Ho, Wo = H // 2, W // 2
    out_order = shift_partition_indices(D, Ho, Wo, ws_out, (0, 0, 0))
    d, hp, wp = np.unravel_index(out_order, (D, Ho, Wo))
    qs = [
        inv_in[d * (H * W) + (2 * hp + qh) * W + (2 * wp + qw)]
        for (qh, qw) in ((0, 0), (1, 0), (0, 1), (1, 1))
    ]
    return np.stack(qs, axis=1).reshape(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _token_permute_fn(key: tuple):
    """custom_vjp token permutation along axis 1: a permutation's adjoint is
    its INVERSE permutation, so the backward is another gather instead of the
    scatter-add XLA emits for jnp.take's autodiff (scatter serialises on TPU;
    the shift-fold gathers run in training too). key identifies the
    permutation: ("shift", D, H, W, ws, ss) gathers spatial->windowed,
    ("inv", ...) its inverse, ("composed", ..., ss_from, ss_to) the
    window-resident re-windowing."""
    kind = key[0]
    if kind == "shift":
        fwd = shift_partition_indices(*key[1:])
        inv = _inverse_indices(*key[1:])
    elif kind == "inv":
        fwd = _inverse_indices(*key[1:])
        inv = shift_partition_indices(*key[1:])
    elif kind == "merge":
        fwd = merged_window_indices(*key[1:])
        inv = np.argsort(fwd).astype(np.int32)
    else:  # composed
        D, H, W, ws, ss_from, ss_to = key[1:]
        fwd = composed_shift_indices(D, H, W, ws, ss_from, ss_to)
        inv = composed_shift_indices(D, H, W, ws, ss_to, ss_from)

    @jax.custom_vjp
    def perm(x):  # x: [B, L, C]
        return jnp.take(x, jnp.asarray(fwd), axis=1)

    def perm_fwd(x):
        return perm(x), None

    def perm_bwd(_, g):
        return (jnp.take(g, jnp.asarray(inv), axis=1),)

    perm.defvjp(perm_fwd, perm_bwd)
    return perm


def window_feed_spec(patch_size, window_size, T: int, H: int, W: int,
                     in_chans: int = 3, batch: Optional[int] = None,
                     embed_dim: Optional[int] = None):
    """Static layout of the pre-windowed host feed, or None when the shape
    needs padding or window clamping (those clips take the spatial/folded
    path). The feed is [B, nd, nh, nw, N, Ct]: patchified tokens, already in
    the exact order of the stage-0 window-partition gather
    (shift_partition_indices, ss=0), so the device never runs the patchify
    relayout chain (traced at ~11 ms/iter of the config-4 b8 forward:
    5.3 ms lane-padded cast fusion + 2.3 ms transpose + 3.0 ms partition
    gather; scripts/trace_ops.py) — the host permutes uint8 instead, where
    the same regroup is a cheap strided copy."""
    pd, ph, pw = patch_size
    if T % pd or H % ph or W % pw:
        return None
    Dp, Hp, Wp = T // pd, H // ph, W // pw
    ws = get_window_size((Dp, Hp, Wp), window_size)
    if tuple(ws) != tuple(window_size):
        return None  # clamped windows: model-side gather path handles it
    if Dp % ws[0] or Hp % ws[1] or Wp % ws[2]:
        return None
    if batch is not None and embed_dim is not None:
        # the feed only pays off when stage 0 runs window-resident (same
        # gate as the model); below it, the model UNDOES the feed with an
        # inverse gather — neutral on hardware at config-2 b1 scale (136.7
        # windowed vs 133.5 folded, within the ~10% chip variance) but a
        # pure loss where kernels are unavailable (CPU eval)
        import os

        if (batch * Dp * Hp * Wp * embed_dim < GATHER_MIN_ELEMENTS
                and os.environ.get(
                    "DEEPFAKE_TPU_FORCE_WINDOW_RESIDENT") != "1"):
            return None
    return {
        "dims": (Dp, Hp, Wp),
        "grid": (Dp // ws[0], Hp // ws[1], Wp // ws[2]),
        "ws": tuple(ws),
        "N": ws[0] * ws[1] * ws[2],
        "Ct": pd * ph * pw * in_chans,
    }


def maybe_window_feed(clips, patch_size, window_size, *, embed_dim: int,
                      use_pallas: bool = True):
    """Single decision point for the pre-windowed host feed, shared by the
    data pipeline and bench.py so they can never diverge: returns the
    [B,nd,nh,nw,N,Ct] feed, or None when the folded/spatial layout should
    be used instead — shape unsupported, below the stage-0 residency
    pay-off size, the Pallas kernels unavailable on this backend (the model
    would UNDO the feed with an inverse gather), or
    DEEPFAKE_TPU_NO_WINDOW_FEED=1."""
    import os

    from deepfake_tpu.ops.pallas_window_attn import kernel_backend_ok

    if os.environ.get("DEEPFAKE_TPU_NO_WINDOW_FEED") == "1":
        return None
    if not (use_pallas and kernel_backend_ok()):
        return None
    B, T, H, W, C = clips.shape
    spec = window_feed_spec(tuple(patch_size), tuple(window_size), T, H, W,
                            C, batch=B, embed_dim=embed_dim)
    if spec is None:
        return None
    return window_feed_host(np.asarray(clips), tuple(patch_size),
                            tuple(window_size))


def window_feed_host(clips: np.ndarray, patch_size, window_size) -> np.ndarray:
    """[B, T, H, W, C] (any dtype, typically uint8) -> the pre-windowed
    [B, nd, nh, nw, N, Ct] feed. Pure permutation — bit-identical inputs to
    the GEMM the device-side patchify produces. numpy on the host: the copy
    rides with the loader's existing per-clip assembly."""
    B, T, H, W, C = clips.shape
    spec = window_feed_spec(patch_size, window_size, T, H, W, C)
    assert spec is not None, "caller must gate on window_feed_spec"
    pd, ph, pw = patch_size
    (Dp, Hp, Wp), (nd, nh, nw) = spec["dims"], spec["grid"]
    N, Ct = spec["N"], spec["Ct"]
    v = clips.reshape(B, Dp, pd, Hp, ph, Wp, pw, C)
    v = np.ascontiguousarray(v.transpose(0, 1, 3, 5, 2, 4, 6, 7))
    v = v.reshape(B, Dp * Hp * Wp, Ct)
    idx = shift_partition_indices(Dp, Hp, Wp, spec["ws"], (0, 0, 0))
    return v[:, idx].reshape(B, nd, nh, nw, N, Ct)


@functools.lru_cache(maxsize=None)
def _band_matrix(w_eff: int, w_full: int) -> np.ndarray:
    """[w_eff, w_eff, 2*w_full-1] one-hot of (a, b) -> a - b + w_full - 1."""
    m = np.zeros((w_eff, w_eff, 2 * w_full - 1), np.float32)
    for a in range(w_eff):
        for b in range(w_eff):
            m[a, b, a - b + w_full - 1] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _bias_expand_fn(table_window: tuple, ws: tuple, N: int, H: int,
                    lane_major: bool):
    """Relative-position-bias expansion table -> [H, N, N] with a fast
    adjoint. The forward is the static gather; jnp.take's autodiff emits a
    scatter-add into the table for the backward — 19 ms of stage-2
    scatter-adds in the traced b8 Swin3D train step (serialised on TPU).
    The 3D relative index factorises per axis (idx = rd*Rh*Rw + rh*Rw + rw,
    rd = d1-d2+wd-1, ...), so the adjoint is three banded contractions with
    tiny one-hot matrices — pure MXU work. The factorised path requires the
    reference's [:N,:N] slice quirk to coincide with whole-axis clamping
    (true when only D clamps or nothing clamps — every config shape); H/W
    clamps break the lex-prefix structure and fall back to take-autodiff."""
    idx_arr = relative_position_index_3d(table_window)[:N, :N].reshape(-1)
    wd_f, wh_f, ww_f = table_window

    def fwd_expand(table):
        if lane_major:
            # lane-gather from the transposed table: 0.072 vs 0.194 ms at
            # H=16 (scripts/bench_bias_grid.py) — the row-gather pads each
            # H-lane row to a full tile, the transpose relayouts 9.8 MB
            return jnp.take(table.T, jnp.asarray(idx_arr), axis=1).reshape(
                H, N, N)
        return table[jnp.asarray(idx_arr)].reshape(N, N, H).transpose(2, 0, 1)

    factorable = (
        N % (wh_f * ww_f) == 0 and ws[1] == wh_f and ws[2] == ww_f
    )
    if not factorable:
        return fwd_expand

    wd_e = N // (wh_f * ww_f)
    # numpy in the closure: the factory is lru_cached, so a jnp constant
    # created during one jit trace would leak its tracer into later traces
    Md = _band_matrix(wd_e, wd_f)
    Mh = _band_matrix(wh_f, wh_f)
    Mw = _band_matrix(ww_f, ww_f)
    M2 = wh_f * ww_f

    @jax.custom_vjp
    def expand(table):
        return fwd_expand(table)

    def expand_fwd(table):
        return expand(table), None

    def expand_bwd(_, g):
        gf = g.astype(jnp.float32).reshape(H, wd_e, M2, wd_e, M2)
        x = jnp.einsum("haxby,abr->hrxy", gf, jnp.asarray(Md))
        x = x.reshape(H, 2 * wd_f - 1, wh_f, ww_f, wh_f, ww_f)
        x = jnp.einsum("hrpuqv,pqs->hrsuv", x, jnp.asarray(Mh))
        x = jnp.einsum("hrsuv,uvt->hrst", x, jnp.asarray(Mw))
        return (x.reshape(H, -1).T,)

    expand.defvjp(expand_fwd, expand_bwd)
    return expand


def compute_mask_3d(Dp, Hp, Wp, ws, ss) -> Optional[np.ndarray]:
    """Shift mask on the padded volume, [nW, N, N] (reference: :320-333)."""
    img = np.zeros((Dp, Hp, Wp), np.float32)
    cnt = 0
    for d in (slice(-ws[0]), slice(-ws[0], -ss[0] or None), slice(-ss[0] or Dp, None)):
        for h in (slice(-ws[1]), slice(-ws[1], -ss[1] or None), slice(-ss[1] or Hp, None)):
            for w in (slice(-ws[2]), slice(-ws[2], -ss[2] or None), slice(-ss[2] or Wp, None)):
                img[d, h, w] = cnt
                cnt += 1
    m = img.reshape(Dp // ws[0], ws[0], Hp // ws[1], ws[1], Wp // ws[2], ws[2])
    m = m.transpose(0, 2, 4, 1, 3, 5).reshape(-1, ws[0] * ws[1] * ws[2])
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _apply_dense(x, kernel, bias, dtype):
    """nn.Dense numerics from raw params (promote to module dtype, matmul,
    bias add) — the einsum fallback path for DenseParams-owned weights."""
    y = x.astype(dtype) @ kernel.astype(dtype)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _apply_layernorm(x, scale, bias, dtype, eps=1e-6):
    """flax nn.LayerNorm numerics from raw params (f32 stats, fast variance,
    rsqrt*scale-then-bias order, final cast to module dtype)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mu * mu, 0.0)
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    return ((xf - mu) * mul + bias.astype(jnp.float32)).astype(dtype)


class LNParams(nn.Module):
    """Owns nn.LayerNorm-shaped parameters ({scale, bias}, same initializers
    and tree) but returns them raw — so the fused Pallas block kernel can run
    the pre-norm in VMEM while checkpoints see an unchanged structure."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class DenseParams(nn.Module):
    """Owns nn.Dense-shaped parameters ({kernel, bias}, same initializers and
    param tree) but returns them raw instead of applying — lets the QKV-fused
    Pallas kernel consume the weights in VMEM while checkpoints/torch imports
    see an unchanged parameter structure."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        return k, b


class MlpParams(nn.Module):
    """Owns Mlp-shaped parameters (children fc1/fc2 with nn.Dense trees) and
    returns them raw for the fused MLP-tail kernel."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, in_features: int):
        w1, b1 = DenseParams(self.hidden, name="fc1")(in_features)
        w2, b2 = DenseParams(self.out, name="fc2")(self.hidden)
        return w1, b1, w2, b2


class WindowAttention3D(nn.Module):
    """(reference: :91-173)

    The bias table is sized by the *constructor* window_size; when the call
    site clamps the window to smaller dims, the reference slices the full
    window's relative_position_index [:N, :N] (reference: :155) — a faithful
    quirk, reproduced here via `table_window`."""

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    table_window: Optional[Tuple[int, int, int]] = None
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True, ln=None):
        B_, N, C = x.shape
        H = self.num_heads
        D = C // H
        wd, wh, ww = self.table_window or self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), H),
            jnp.float32,
        )
        # The expanded [H, N, N] bias depends only on params, yet the table
        # gather costs 2.5 ms of the 5.5 ms config-2 b1 forward (trace,
        # BASELINE_MEASURED.md round-4 config-2 trace). At inference the
        # expansion is precomputed once at weight-load time into the
        # "bias_cache" collection (registry.precompute_bias_cache) and read
        # back here; shape-guarded so a geometry change (different clip
        # length => different window clamp => different N) recomputes.
        bias = None
        if deterministic and self.has_variable("bias_cache", "rpb"):
            cached = self.get_variable("bias_cache", "rpb")
            if cached.shape == (H, N, N):
                bias = cached
        if bias is None:
            bias = _bias_expand_fn(
                tuple(self.table_window or self.window_size),
                tuple(self.window_size), N, H, lane_major=H >= 8,
            )(table)
            # never during init: a cache baked from init-time params would
            # silently go stale when a checkpoint replaces "params"
            if (deterministic and not self.is_initializing()
                    and self.is_mutable_collection("bias_cache")):
                self.put_variable("bias_cache", "rpb", bias)

        qkv_w, qkv_b = DenseParams(3 * C, use_bias=self.qkv_bias, name="qkv")(C)
        proj_w, proj_b = DenseParams(C, name="proj")(C)

        import os

        from deepfake_tpu.ops.pallas_window_attn import (
            kernel_backend_ok, nhc_is_profitable, nhc_route,
        )

        route = "einsum"
        if self.use_pallas and kernel_backend_ok():
            if deterministic:
                route = nhc_route(B_, H, N, C)
            elif self.attn_drop == 0.0 and nhc_is_profitable(
                    B_, H, N, C,
                    min_steps=int(os.environ.get(
                        "DEEPFAKE_TPU_TRAIN_PROFIT_STEPS", "64"))):
                # training: custom_vjp token-major kernel (fused Pallas
                # backward, nothing but q/k/v saved between passes); only
                # valid without attention dropout — the kernel has none.
                # Lower step bar than inference: einsum training materialises
                # the f32 logits in HBM twice (fwd + bwd re-read)
                route = "nhc_train"
        if route == "qkv":
            # QKV-fused token-major kernel: the qkv projection (and, at a
            # single head group, the pre-norm LayerNorm and the output
            # projection too) runs inside the attention kernel with
            # VMEM-resident weights, so the [B_, N, 3C] qkv tensor never
            # touches HBM, and heads live in lane ranges (no 5D head
            # split/merge transposes)
            from deepfake_tpu.ops.pallas_window_attn import (
                pallas_window_attention_nhc_qkv,
            )

            out, projected = pallas_window_attention_nhc_qkv(
                x, qkv_w, qkv_b, num_heads=H, bias=bias, mask=mask,
                scale=D ** -0.5, ln=ln, proj=(proj_w, proj_b),
            )
            if not projected:
                out = _apply_dense(out, proj_w, proj_b, self.dtype)
        elif route in ("nhc", "nhc_train"):
            from deepfake_tpu.ops.pallas_window_attn import (
                pallas_window_attention_nhc, pallas_window_attention_nhc_train,
            )

            if ln is not None:
                x = _apply_layernorm(x, ln[0], ln[1], self.dtype)
            qkv = _apply_dense(x, qkv_w, qkv_b, self.dtype)
            q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
            attn_fn = (
                pallas_window_attention_nhc_train if route == "nhc_train"
                else pallas_window_attention_nhc
            )
            out = attn_fn(
                q, k, v, num_heads=H, bias=bias, mask=mask, scale=D ** -0.5,
            )
            out = _apply_dense(out, proj_w, proj_b, self.dtype)
        else:
            if ln is not None:
                x = _apply_layernorm(x, ln[0], ln[1], self.dtype)
            qkv = _apply_dense(x, qkv_w, qkv_b, self.dtype)
            qkv = qkv.reshape(B_, N, 3, H, D).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            # below the profitability gate the einsum path beats every hand
            # kernel at these window counts — never route use_pallas here
            out = scaled_window_attention(
                q, k, v, D ** -0.5, bias, mask, use_pallas=False,
                attn_dropout=self.attn_drop if not deterministic else 0.0,
                dropout_rng=self.make_rng("dropout")
                if (not deterministic and self.attn_drop > 0)
                else None,
            )
            out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
            out = _apply_dense(out, proj_w, proj_b, self.dtype)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class SwinBlock3D(nn.Module):
    """pre-norm 3D block (reference: :176-278)."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    use_pallas: bool = False
    # window-resident mode: x arrives as [B*nW, N, C] ALREADY in this
    # block's shifted window layout (the stage loop owns the permutations);
    # spatial_dims carries the (D, H, W) the tokens came from
    window_resident: bool = False
    spatial_dims: Optional[Tuple[int, int, int]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.window_resident:
            return self._resident(x, deterministic)
        B, D, H, W, C = x.shape
        ws, ss = get_window_size((D, H, W), self.window_size, list(self.shift_size))

        shortcut = x
        ln1_s, ln1_b = LNParams(C, name="norm1")()
        pad_d = (ws[0] - D % ws[0]) % ws[0]
        pad_h = (ws[1] - H % ws[1]) % ws[1]
        pad_w = (ws[2] - W % ws[2]) % ws[2]

        # pre-norm runs inside the fused kernel when the QKV-fused route is
        # taken and no padding exists (padded tokens must stay zero post-LN
        # for reference parity — reference norms BEFORE padding, :224-231)
        from deepfake_tpu.ops.pallas_window_attn import (
            kernel_backend_ok, nhc_route,
        )

        N_tok = ws[0] * ws[1] * ws[2]
        nW_all = ((D + pad_d) // ws[0]) * ((H + pad_h) // ws[1]) * (
            (W + pad_w) // ws[2])
        ln_in_kernel = (
            self.use_pallas and deterministic and kernel_backend_ok()
            and pad_d == 0 and pad_h == 0 and pad_w == 0
            and nhc_route(B * nW_all, self.num_heads, N_tok, C) == "qkv"
        )
        if not ln_in_kernel:
            x = _apply_layernorm(x, ln1_s, ln1_b, self.dtype)
        x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
        _, Dp, Hp, Wp, _ = x.shape

        import os

        shifted = any(s > 0 for s in ss)
        # >=2 shifted axes: fold the 3-axis cyclic roll + window partition
        # into ONE row-gather over flattened tokens (and its inverse after
        # attention) — the roll alone is 3 sequential HBM copies. Single-axis
        # shifts (stage 3: only D shifts) measure faster on the roll path,
        # as do small activations (b1: gather measured -2% — the roll copies
        # are short enough that gather index overhead wins out).
        # DEEPFAKE_TPU_NO_SHIFT_GATHER=1 is the measurement escape hatch.
        use_gather = (
            shifted and sum(s > 0 for s in ss) >= 2
            and B * D * H * W * C >= GATHER_MIN_ELEMENTS
            and os.environ.get("DEEPFAKE_TPU_NO_SHIFT_GATHER") != "1"
        )
        if shifted:
            mask = jnp.asarray(compute_mask_3d(Dp, Hp, Wp, ws, ss))
        else:
            mask = None
        if use_gather:
            N = ws[0] * ws[1] * ws[2]
            L = Dp * Hp * Wp
            perm = _token_permute_fn(("shift", Dp, Hp, Wp, tuple(ws), tuple(ss)))
            xw = perm(x.reshape(B, L, C)).reshape(-1, N, C)
        else:
            if shifted:
                x = jnp.roll(x, (-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
            xw = window_partition_3d(x, ws)
        attn = WindowAttention3D(
            dim=C, window_size=ws, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            table_window=tuple(self.window_size),
            use_pallas=self.use_pallas, dtype=self.dtype, name="attn",
        )(xw, mask, deterministic,
          ln=(ln1_s, ln1_b) if ln_in_kernel else None)
        if use_gather:
            unperm = _token_permute_fn(("inv", Dp, Hp, Wp, tuple(ws), tuple(ss)))
            x = unperm(attn.reshape(B, L, C)).reshape(B, Dp, Hp, Wp, C)
        else:
            x = window_reverse_3d(attn, ws, B, Dp, Hp, Wp)
            if shifted:
                x = jnp.roll(x, (ss[0], ss[1], ss[2]), axis=(1, 2, 3))
        if pad_d or pad_h or pad_w:
            x = x[:, :D, :H, :W, :]
        ln2_s, ln2_b = LNParams(C, name="norm2")()
        hidden = int(C * self.mlp_ratio)
        w1, b1, w2, b2 = MlpParams(hidden, C, name="mlp")(C)

        from deepfake_tpu.ops.pallas_mlp import (
            fused_mlp_tail, mlp_tail_supported,
        )

        if (self.use_pallas and deterministic and kernel_backend_ok()
                and mlp_tail_supported(B * D * H * W, C, hidden, self.dtype)):
            # both residual adds, LN2 and the MLP stream through one kernel
            # (the [L, 4C] hidden tensor never reaches HBM)
            return fused_mlp_tail(shortcut, x, ln2_s, ln2_b, w1, b1, w2, b2)

        x = shortcut + DropPath(self.drop_path)(x, deterministic)
        y = _apply_layernorm(x, ln2_s, ln2_b, self.dtype)
        y = _apply_dense(y, w1, b1, self.dtype)
        y = gelu_exact(y)
        y = nn.Dropout(self.drop, deterministic=deterministic)(y)
        y = _apply_dense(y, w2, b2, self.dtype)
        y = nn.Dropout(self.drop, deterministic=deterministic)(y)
        x = x + DropPath(self.drop_path)(y, deterministic)
        return x

    def _drop_path_tokens(self, y, deterministic):
        """DropPath over window-resident tokens: rows of [B*nW, N, C] are
        sample-major, so a contiguous (free) reshape to [B, nW*N, C] draws
        ONE keep-mask per ORIGINAL sample — the spatial path's per-sample
        stochastic-depth semantics; masking rows of [B*nW, ...] directly
        would drop per-window instead."""
        if self.drop_path == 0.0 or deterministic:
            return y
        Dd, Hh, Ww = self.spatial_dims
        ws, _ = get_window_size(
            (Dd, Hh, Ww), self.window_size, list(self.shift_size)
        )
        nW = (Dd // ws[0]) * (Hh // ws[1]) * (Ww // ws[2])
        B_, N, C = y.shape
        keep = 1.0 - self.drop_path
        # inlined DropPath (no submodule: this runs outside compact scope)
        mask = jax.random.bernoulli(
            self.make_rng("dropout"), keep, (B_ // nW, 1, 1, 1)
        )
        y = y.reshape(B_ // nW, nW, N, C)
        y = jnp.where(mask, y / keep, jnp.zeros_like(y))
        return y.reshape(B_, N, C)

    def _resident(self, x, deterministic):
        """Window-resident body: identical math to the spatial path, minus
        partition/reverse — every op here is token-wise, so the layout the
        tokens sit in is irrelevant; the stage loop re-windows between
        blocks with ONE composed-permutation gather. Requires (D, H, W)
        divisible by the window (the stage gate checks). Same parameter
        tree (norm1/attn/norm2/mlp) as the spatial path."""
        Dd, Hh, Ww = self.spatial_dims
        ws, ss = get_window_size(
            (Dd, Hh, Ww), self.window_size, list(self.shift_size)
        )
        B_, N, C = x.shape
        shortcut = x
        ln1_s, ln1_b = LNParams(C, name="norm1")()

        from deepfake_tpu.ops.pallas_window_attn import (
            kernel_backend_ok, nhc_route,
        )

        ln_in_kernel = (
            self.use_pallas and deterministic and kernel_backend_ok()
            and nhc_route(B_, self.num_heads, N, C) == "qkv"
        )
        xw = x if ln_in_kernel else _apply_layernorm(x, ln1_s, ln1_b, self.dtype)
        shifted = any(s > 0 for s in ss)
        mask = (
            jnp.asarray(compute_mask_3d(Dd, Hh, Ww, ws, ss)) if shifted
            else None
        )
        attn = WindowAttention3D(
            dim=C, window_size=ws, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, attn_drop=self.attn_drop,
            proj_drop=self.drop, table_window=tuple(self.window_size),
            use_pallas=self.use_pallas, dtype=self.dtype, name="attn",
        )(xw, mask, deterministic,
          ln=(ln1_s, ln1_b) if ln_in_kernel else None)
        ln2_s, ln2_b = LNParams(C, name="norm2")()
        hidden = int(C * self.mlp_ratio)
        w1, b1, w2, b2 = MlpParams(hidden, C, name="mlp")(C)

        from deepfake_tpu.ops.pallas_mlp import (
            fused_mlp_tail, mlp_tail_supported,
        )

        if (self.use_pallas and deterministic and kernel_backend_ok()
                and mlp_tail_supported(B_ * N, C, hidden, self.dtype)):
            return fused_mlp_tail(shortcut, attn, ln2_s, ln2_b, w1, b1, w2, b2)

        x = shortcut + self._drop_path_tokens(attn, deterministic)
        y = _apply_layernorm(x, ln2_s, ln2_b, self.dtype)
        y = _apply_dense(y, w1, b1, self.dtype)
        y = gelu_exact(y)
        y = nn.Dropout(self.drop, deterministic=deterministic)(y)
        y = _apply_dense(y, w2, b2, self.dtype)
        y = nn.Dropout(self.drop, deterministic=deterministic)(y)
        return x + self._drop_path_tokens(y, deterministic)


class PatchMerging3D(nn.Module):
    """spatial-only merge; norm THEN reduction (reference: :281-316)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.ndim == 3:
            # pre-merged tokens [B, L, 4C] (merged_window_indices gather +
            # reshape — same lane order as the concatenate below), straight
            # to norm+reduction with the identical parameter tree
            C = x.shape[-1] // 4
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
            return nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                            name="reduction")(x)
        B, D, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2], x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]],
            axis=-1,
        )
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x


class ConvParams(nn.Module):
    """Owns nn.Conv-shaped parameters ({kernel [*kszie, Cin, E], bias [E]},
    same names and initializers) but returns them raw — the patchify matmul
    consumes them while checkpoints/torch imports see an unchanged tree."""

    kernel_size: Tuple[int, ...]
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, in_features, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class PatchEmbed3D(nn.Module):
    """Conv3d patchify with pad-to-multiple (reference: :420-460). NTHWC in,
    or the channel-folded [B, D, H, W*in_chans] feed (see below)."""

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    patch_norm: bool = False
    in_chans: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pd, ph, pw = self.patch_size
        # Channel-folded fast path: a trailing dim of 3 is lane-padded 3->128
        # in TPU tiled layouts, so every op touching the raw NTHWC input reads
        # ~43x the bytes (traced: 5.8 ms cast + 2.3 ms transpose at config-4
        # scale). Callers fold W and C on the HOST (a free numpy reshape)
        # and pass [B, D, H, W*C]; the space-to-depth below peels patches
        # from the folded axis, whose (pw, C) order matches the kernel's
        # [pd, ph, pw, C] flatten exactly — same GEMM, dense lanes.
        # Pre-windowed fast path: [B, nd, nh, nw, N, Ct] tokens arrive
        # already patchified AND window-partitioned (window_feed_host) —
        # patch embed is ONE dense-lane GEMM, and stage 0 skips its
        # partition gather entirely.
        if x.ndim == 6:
            Ct = x.shape[-1]
            C = self.in_chans
            assert Ct == pd * ph * pw * C, (x.shape, self.patch_size)
            w, b = ConvParams(
                self.patch_size, self.embed_dim, name="proj",
            )(C)
            x = x.astype(self.dtype)
            x = x @ w.reshape(-1, self.embed_dim).astype(self.dtype)
            x = x + b.astype(self.dtype)
            if self.patch_norm:
                x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
            return x  # [B, nd, nh, nw, N, E]
        folded = x.ndim == 4
        if folded:
            B, D, H, WC = x.shape
            C = self.in_chans
            W = WC // C
        else:
            B, D, H, W, C = x.shape
        pad_d, pad_h, pad_w = (
            (pd - D % pd) % pd, (ph - H % ph) % ph, (pw - W % pw) % pw)
        if folded:
            x = jnp.pad(
                x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w * C)))
        else:
            x = jnp.pad(
                x,
                ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)),
            )
        # Stride==kernel conv == space-to-depth + matmul. XLA lowers the
        # C_in=3 conv to per-position K=3 matmuls (2.3 GF/s measured — at
        # 4.35 ms the single most expensive op in the traced b8 forward);
        # the explicit space-to-depth + [pd*ph*pw*C, E] GEMM contracts all
        # 96 taps on the MXU at once. Parameters keep nn.Conv's exact tree
        # ({kernel [pd,ph,pw,C,E], bias [E]} under "proj") so checkpoints
        # and the torch importer are unchanged.
        w, b = ConvParams(
            self.patch_size, self.embed_dim, name="proj",
        )(C)
        Dp, Hp, Wp = D + pad_d, H + pad_h, W + pad_w
        x = x.astype(self.dtype)
        if folded:
            x = x.reshape(B, Dp // pd, pd, Hp // ph, ph, Wp // pw, pw * C)
            x = x.transpose(0, 1, 3, 5, 2, 4, 6)
        else:
            x = x.reshape(B, Dp // pd, pd, Hp // ph, ph, Wp // pw, pw, C)
            x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(B, Dp // pd, Hp // ph, Wp // pw, pd * ph * pw * C)
        x = x @ w.reshape(-1, self.embed_dim).astype(self.dtype)
        x = x + b.astype(self.dtype)
        if self.patch_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x  # [B, D', H', W', C]


class SwinTransformer3D(nn.Module):
    """Backbone -> [B, D', H', W', num_features] (reference: :462-681;
    the reference returns NCDHW, we stay channels-last)."""

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (2, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    patch_norm: bool = False
    use_pallas: bool = False
    # activation checkpointing per block (reference: video_swin_transformer.py:267-276)
    remat: bool = False
    remat_policy: str = ""  # see layers.remat_wrap
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = PatchEmbed3D(
            self.patch_size, self.embed_dim, self.patch_norm, dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        num_layers = len(self.depths)
        shift = tuple(w // 2 for w in self.window_size)
        from deepfake_tpu.models.layers import remat_wrap, stage_policy

        import os

        from deepfake_tpu.ops.pallas_window_attn import kernel_backend_ok

        for i in range(num_layers):
            block_cls = remat_wrap(
                SwinBlock3D, *stage_policy(self.remat, self.remat_policy, i))
            dim = int(self.embed_dim * 2 ** i)
            win_feed = x.ndim == 6  # pre-windowed stage-0 tokens (i == 0)
            if win_feed:
                Bx, nd_, nh_, nw_, N_, Cx = x.shape
                wd_, wh_, ww_ = self.window_size
                Dx, Hx, Wx = nd_ * wd_, nh_ * wh_, nw_ * ww_
            else:
                Bx, Dx, Hx, Wx, Cx = x.shape
            ws_i, ss_i = get_window_size((Dx, Hx, Wx), self.window_size,
                                         list(shift))
            # window-resident stage: activations stay window-partitioned
            # across all blocks; blocks are re-windowed with one composed
            # gather instead of a reverse+partition pair (the traced b8
            # forward spent ~11 ms in those relayouts — and the pairs run
            # again, adjoint, in the backward). Training included: every op
            # in the resident body is token-wise (DropPath draws per-sample
            # masks via _drop_path_tokens), the permutations carry exact
            # custom_vjp adjoints, and remat wraps the block as usual.
            # Small activations keep the roll path (gathers lose below ~8M
            # elements, same gate as use_gather).
            resident = (
                self.use_pallas and kernel_backend_ok()
                and self.depths[i] >= 2
                and Dx % ws_i[0] == 0 and Hx % ws_i[1] == 0
                and Wx % ws_i[2] == 0
                and (Bx * Dx * Hx * Wx * Cx >= GATHER_MIN_ELEMENTS
                     or os.environ.get(
                         "DEEPFAKE_TPU_FORCE_WINDOW_RESIDENT") == "1")
                and os.environ.get("DEEPFAKE_TPU_NO_WINDOW_RESIDENT") != "1"
            )
            common = dict(
                dim=dim, num_heads=self.num_heads[i],
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, drop=self.drop_rate,
                attn_drop=self.attn_drop_rate, use_pallas=self.use_pallas,
                dtype=self.dtype,
            )
            if win_feed and not resident:
                # correctness fallback (no kernels / tiny shapes): one
                # inverse gather restores the spatial layout
                unperm0 = _token_permute_fn(
                    ("inv", Dx, Hx, Wx, tuple(ws_i), (0, 0, 0)))
                L = Dx * Hx * Wx
                x = unperm0(x.reshape(Bx, L, Cx)).reshape(
                    Bx, Dx, Hx, Wx, Cx)
                win_feed = False
            if resident:
                N = ws_i[0] * ws_i[1] * ws_i[2]
                L = Dx * Hx * Wx
                # partition via flat token gather: the 8-D reshape/transpose
                # window_partition_3d lowers to costs 4.4 ms at stage-0 scale
                # (traced; its adjoint again in the backward) vs ~0.4 ms for
                # the row gather — same >=8M-element regime as the stage gate
                big = Bx * L * Cx >= GATHER_MIN_ELEMENTS
                if win_feed:
                    # feed order IS the unshifted window partition
                    xw = x.reshape(-1, N, Cx)
                elif big:
                    part = _token_permute_fn(
                        ("shift", Dx, Hx, Wx, tuple(ws_i), (0, 0, 0)))
                    xw = part(x.reshape(Bx, L, Cx)).reshape(-1, N, Cx)
                else:
                    xw = window_partition_3d(x, ws_i)  # block 0 is unshifted
                prev_ss = (0, 0, 0)
                for j in range(self.depths[i]):
                    cur_ss = (0, 0, 0) if j % 2 == 0 else tuple(ss_i)
                    if j > 0 and cur_ss != prev_ss:  # equal shifts: identity
                        rewin = _token_permute_fn((
                            "composed", Dx, Hx, Wx, tuple(ws_i),
                            prev_ss, cur_ss))
                        xw = rewin(xw.reshape(Bx, L, Cx)).reshape(-1, N, Cx)
                    xw = block_cls(
                        shift_size=cur_ss,
                        drop_path=dpr[sum(self.depths[:i]) + j],
                        window_resident=True, spatial_dims=(Dx, Hx, Wx),
                        name=f"layers_{i}_blocks_{j}", **common,
                    )(xw, deterministic)
                    prev_ss = cur_ss
                # window-to-window patch merging (DEEPFAKE_TPU_FUSED_MERGE=1
                # — measured LOSS, default off): one permutation gather +
                # norm/reduction replaces [exit unperm -> strided-slice merge
                # -> next-stage partition], but the [B,L,C]->[B,L/4,4C]
                # retile after the gather costs more than the chain it saves
                # (config 4: 135.0 vs 140.3 clips/s; traced 1.56+0.61 ms
                # retile fused into the downsample LN converts — the big
                # videoSwinT-level gather/reshape aggregate is the
                # BETWEEN-BLOCK composed re-windows, which this path does
                # not touch). Bit-identical (tests); kept for re-evaluation
                # if XLA's retile lowering improves.
                fuse_merge = False
                if (os.environ.get("DEEPFAKE_TPU_FUSED_MERGE") == "1"
                        and i < num_layers - 1 and not (Hx % 2 or Wx % 2)):
                    D2, H2, W2 = Dx, Hx // 2, Wx // 2
                    ws_n = get_window_size((D2, H2, W2), self.window_size)
                    fuse_merge = (
                        tuple(ws_n) == tuple(self.window_size)
                        and self.depths[i + 1] >= 2
                        and D2 % ws_n[0] == 0 and H2 % ws_n[1] == 0
                        and W2 % ws_n[2] == 0
                        and (Bx * D2 * H2 * W2 * 2 * Cx >= GATHER_MIN_ELEMENTS
                             or os.environ.get(
                                 "DEEPFAKE_TPU_FORCE_WINDOW_RESIDENT") == "1")
                    )
                if fuse_merge:
                    mergep = _token_permute_fn((
                        "merge", Dx, Hx, Wx, tuple(ws_i), prev_ss,
                        tuple(self.window_size)))
                    y = mergep(xw.reshape(Bx, L, Cx)).reshape(
                        Bx, L // 4, 4 * Cx)
                    y = PatchMerging3D(
                        dim, dtype=self.dtype,
                        name=f"layers_{i}_downsample")(y)  # [B, L/4, 2C]
                    wd_, wh_, ww_ = self.window_size
                    x = y.reshape(
                        Bx, D2 // wd_, H2 // wh_, W2 // ww_,
                        wd_ * wh_ * ww_, 2 * Cx)  # next stage's 6-D feed
                    continue
                if prev_ss == (0, 0, 0) and not big:
                    x = window_reverse_3d(xw, ws_i, Bx, Dx, Hx, Wx)
                else:
                    unperm = _token_permute_fn(
                        ("inv", Dx, Hx, Wx, tuple(ws_i), prev_ss))
                    x = unperm(xw.reshape(Bx, L, Cx)).reshape(
                        Bx, Dx, Hx, Wx, Cx)
            else:
                for j in range(self.depths[i]):
                    x = block_cls(
                        shift_size=(0, 0, 0) if j % 2 == 0 else shift,
                        drop_path=dpr[sum(self.depths[:i]) + j],
                        name=f"layers_{i}_blocks_{j}", **common,
                    )(x, deterministic)
            if i < num_layers - 1:
                x = PatchMerging3D(dim, dtype=self.dtype, name=f"layers_{i}_downsample")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class PoolingMLP(nn.Module):
    """'mean' or 'Attention' pooling head (reference: :688-731).

    Axis fix (documented quirk departure): the reference feeds [B, 17, 512]
    tokens to a batch_first=False nn.TransformerEncoder, which reads
    (seq, batch, embed) — as written its CLS entry only ever attends to the
    other clips' identical CLS entries, so the classify logit is a CONSTANT
    independent of the video, and frame tokens leak across clips in `feat`
    (tests/test_swin3d.py::test_attention_pooling_head_parity demonstrates
    both). This head attends over the 17 tokens, the evident intent."""

    in_feature: int = 768
    num_hidden: int = 128
    num_classes: int = 1
    pool: str = "mean"
    classify_drop: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: [B, D, H, W, C]
        if self.pool == "Attention":
            B, D, H, W, C = x.shape
            h = x.reshape(B * D, H, W, C)
            h = nn.Conv(512, (3, 3), padding="VALID", dtype=self.dtype, name="down_conv1")(h)
            h = torch_batchnorm(512, dtype=self.dtype, name="down_bn1")(
                h, use_running_average=deterministic
            )
            h = nn.Conv(512, (5, 5), padding="VALID", dtype=self.dtype, name="down_conv2")(h)
            h = torch_batchnorm(512, dtype=self.dtype, name="down_bn2")(
                h, use_running_average=deterministic
            )
            h = gelu_exact(h)
            h = h.reshape(B, D, -1)  # spatial collapsed to 1x1 at 7x7 input
            cls = self.param("cls", nn.initializers.normal(1.0), (1, 1, 512), jnp.float32)
            pos = self.param(
                "pos_embedding", nn.initializers.normal(1.0), (1, D + 1, 512), jnp.float32
            )
            h = jnp.concatenate([jnp.tile(cls.astype(h.dtype), (B, 1, 1)), h], axis=1)
            h = h + pos.astype(h.dtype)
            for li in range(6):
                h = TransformerEncoderLayer(
                    512, 8, drop=self.classify_drop, dtype=self.dtype, name=f"enc_{li}"
                )(h, deterministic)
            classify = Mlp(256, self.num_classes, drop=self.classify_drop,
                           dtype=self.dtype, name="projection")(h[:, 0], deterministic)
            feat = h[:, 1:]
        else:
            feat = jnp.mean(x, axis=(2, 3))  # [B, D, C]
            classify = jnp.mean(x, axis=(1, 2, 3))  # [B, C]
            classify = Mlp(self.num_hidden, self.num_classes, drop=self.classify_drop,
                           dtype=self.dtype, name="mlp")(classify, deterministic)
        return jnp.squeeze(classify, -1) if self.num_classes == 1 else classify, feat


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer (post-norm, gelu) equivalent for the
    attention-pooling head."""

    d_model: int = 512
    nhead: int = 8
    dim_feedforward: int = 2048
    drop: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, L, C = x.shape
        H = self.nhead
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, H, C // H).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, H, C // H).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, C // H).transpose(0, 2, 1, 3)
        a = jnp.einsum("bhqd,bhkd->bhqk", q * ((C // H) ** -0.5), k)
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v).transpose(0, 2, 1, 3).reshape(B, L, C)
        o = nn.Dense(C, dtype=self.dtype, name="out_proj")(o)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            x + nn.Dropout(self.drop, deterministic=deterministic)(o)
        )
        f = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        f = gelu_exact(f)
        f = nn.Dropout(self.drop, deterministic=deterministic)(f)
        f = nn.Dense(C, dtype=self.dtype, name="linear2")(f)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            x + nn.Dropout(self.drop, deterministic=deterministic)(f)
        )
        return x


class VideoClassifier(nn.Module):
    """Video Swin backbone + PoolingMLP + sigmoid (reference: :734-793).
    Returns (probability, per-frame features) like the reference."""

    num_classes: int = 1
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    window_size: Tuple[int, int, int] = (8, 7, 7)
    drop_path_rate: float = 0.1
    num_hiddens: int = 128
    pool: str = "mean"
    classify_drop: float = 0.1
    use_pallas: bool = False
    remat: bool = False
    remat_policy: str = ""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_logits: bool = False):
        # x: [B, T, H, W, 3], or channel-folded [B, T, H, W*3] (dense-lane
        # device layout; see PatchEmbed3D — callers fold on the host)
        feats = SwinTransformer3D(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            depths=self.depths,
            num_heads=self.num_heads,
            window_size=self.window_size,
            drop_path_rate=self.drop_path_rate,
            patch_norm=True,
            use_pallas=self.use_pallas,
            remat=self.remat,
            remat_policy=self.remat_policy,
            dtype=self.dtype,
            name="videoSwinT",
        )(x, deterministic)
        logits, feat = PoolingMLP(
            in_feature=int(self.embed_dim * 2 ** (len(self.depths) - 1)),
            num_hidden=self.num_hiddens,
            num_classes=self.num_classes,
            pool=self.pool,
            classify_drop=self.classify_drop,
            dtype=self.dtype,
            name="classifier",
        )(feats, deterministic)
        if return_logits:
            return logits, feat
        return jax.nn.sigmoid(logits), feat
