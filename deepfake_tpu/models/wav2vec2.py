"""Native JAX wav2vec2-base encoder.

The reference delegates this entire model to HuggingFace transformers on
PyTorch/CUDA (reference: train.py:39-41, src/models/audioTransformer.py:22).
This is a from-scratch flax implementation of the same architecture, specified
by the shipped config (reference: checkpoints/wav2vec2-base-960h/config.json):
7-layer conv feature encoder (group-norm on layer 0 only,
feat_extract_norm="group"), feature projection to 768, grouped conv positional
embedding (k=128, 16 groups), and 12 post-norm transformer layers
(do_stable_layer_norm=False), hidden 768 / 12 heads / FFN 3072.

Weight import from the HF safetensors checkpoint lives in
deepfake_tpu.io.torch_import.import_wav2vec2.

TPU notes: the conv feature encoder runs as XLA 1-D convs (lowered onto the
MXU as implicit matmuls); attention is plain batched MXU attention — sequence
lengths here (~50 frames/sec of audio) are small enough that flash-style
tiling buys nothing.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepfake_tpu.models.layers import gelu_exact

Dtype = Any


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Mirrors checkpoints/wav2vec2-base-960h/config.json (reference)."""

    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    feat_proj_dropout: float = 0.1
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    layerdrop: float = 0.1
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    remat: bool = False  # activation checkpointing per transformer layer
    remat_policy: str = ""  # see layers.remat_wrap


class ConvFeatureEncoder(nn.Module):
    """7x strided Conv1d stack; GroupNorm(512 groups == per-channel instance
    norm over time) after layer 0 only; exact GELU.

    valid_samples (optional traced scalar): the batch-shared valid waveform
    length. VALID convs guarantee output frames below the running valid count
    never touch samples beyond it; the one cross-frame op — GroupNorm's
    over-time statistics — is mask-restricted to valid frames, making the
    encoder bit-equal to running on a valid_samples-long input."""

    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_samples=None):
        # x: [B, T] raw waveform -> [B, T', C]
        c = self.config
        h = x[..., None]  # [B, T, 1]
        valid = valid_samples
        for i, (dim, k, s) in enumerate(zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            h = nn.Conv(
                dim, (k,), strides=(s,), padding="VALID", use_bias=c.conv_bias,
                dtype=self.dtype, name=f"conv_{i}",
            )(h)
            if valid is not None:
                valid = (valid - k) // s + 1
            if i == 0:
                gn = nn.GroupNorm(
                    num_groups=dim, epsilon=c.layer_norm_eps, dtype=self.dtype,
                    name="group_norm",
                )
                if valid is not None:
                    fmask = (jnp.arange(h.shape[1]) < valid)[None, :, None]
                    h = gn(h, mask=jnp.broadcast_to(fmask, h.shape))
                else:
                    h = gn(h)
            h = gelu_exact(h)
        return h


class FeatureProjection(nn.Module):
    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.config
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm")(x)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="projection")(x)
        x = nn.Dropout(c.feat_proj_dropout, deterministic=deterministic)(x)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped Conv1d positional embedding, SAME-ish padding of k//2 with the
    trailing column cropped (k even), then exact GELU. The HF weight-norm
    reparameterisation is materialised into a plain kernel at import time."""

    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.config
        k = c.num_conv_pos_embeddings
        pad = k // 2
        h = nn.Conv(
            c.hidden_size, (k,), strides=(1,), padding=[(pad, pad)],
            feature_group_count=c.num_conv_pos_embedding_groups, use_bias=True,
            dtype=self.dtype, name="conv",
        )(x)
        if k % 2 == 0:
            h = h[:, :-1, :]
        return gelu_exact(h)


class SelfAttention(nn.Module):
    """Standard MHA with bias on q/k/v/out; q pre-scaled by head_dim**-0.5."""

    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, valid_frames=None):
        c = self.config
        B, T, C = x.shape
        H = c.num_attention_heads
        D = C // H
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(x) * (D ** -0.5)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        if valid_frames is not None:
            kmask = jnp.arange(T) < valid_frames
            attn = jnp.where(kmask[None, None, None, :], attn, -jnp.inf)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(c.attention_dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class FeedForward(nn.Module):
    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.config
        x = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate_dense")(x)
        x = gelu_exact(x)
        x = nn.Dropout(c.activation_dropout, deterministic=deterministic)(x)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="output_dense")(x)
        x = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)
        return x


class EncoderLayer(nn.Module):
    """Post-norm layer (do_stable_layer_norm=False):
    x = LN(x + drop(attn(x))); x = finalLN(x + FF(x))."""

    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, valid_frames=None):
        c = self.config
        a = SelfAttention(c, dtype=self.dtype, name="attention")(
            x, deterministic, valid_frames
        )
        a = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(a)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm")(x + a)
        f = FeedForward(c, dtype=self.dtype, name="feed_forward")(x, deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x + f)
        return x


class Encoder(nn.Module):
    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, valid_frames=None):
        c = self.config
        # zero frames beyond the valid count before the positional conv so its
        # window sees exactly the zero padding a valid_frames-long sequence
        # would (HF pads the conv with zeros past the sequence end)
        pos_in = x
        if valid_frames is not None:
            pos_in = x * (jnp.arange(x.shape[1]) < valid_frames)[None, :, None]
        x = x + PositionalConvEmbedding(c, dtype=self.dtype, name="pos_conv_embed")(pos_in)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm")(x)
        x = nn.Dropout(c.hidden_dropout, deterministic=deterministic)(x)
        from deepfake_tpu.models.layers import remat_wrap, stage_policy

        # the 12 encoder layers are homogeneous — a per-stage remat spec
        # (comma form, see layers.stage_policy) applies its FIRST entry here
        layer_cls = remat_wrap(
            EncoderLayer, *stage_policy(c.remat, c.remat_policy, 0))
        for i in range(c.num_hidden_layers):
            y = layer_cls(c, dtype=self.dtype, name=f"layers_{i}")(
                x, deterministic, valid_frames
            )
            if not deterministic and c.layerdrop > 0.0:
                # LayerDrop: randomly skip the whole layer per batch (training only).
                keep = jax.random.bernoulli(self.make_rng("dropout"), 1.0 - c.layerdrop)
                x = jnp.where(keep, y, x)
            else:
                x = y
        return x


class Wav2Vec2Model(nn.Module):
    """Returns last_hidden_state [B, T', 768] from raw waveform [B, T].

    Spec-augment time masking (training only) replaces masked frames with the
    learned masked_spec_embed, statistically matching HF's mask_time_prob /
    mask_time_length (exact mask-sampling differs; augmentation-only path).

    input_values may be a (wave [B, T], lengths [B]) pair: the model then
    emulates the reference's pad-to-batch-longest semantics (reference:
    src/trainer.py:251) inside a static bucket row — GroupNorm statistics,
    the positional conv's boundary, and attention are all restricted to the
    frames a max(lengths)-long input would produce, so frames below that
    count are bit-equal to running HF on the batch-longest padding. Frames
    beyond it are garbage; pool with the valid frame count (see Audio2D).
    """

    config: Wav2Vec2Config = Wav2Vec2Config()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_values, deterministic: bool = True):
        c = self.config
        valid_samples = None
        if isinstance(input_values, (tuple, list)):
            input_values, lengths = input_values
            valid_samples = jnp.max(lengths)
        feats = ConvFeatureEncoder(c, dtype=self.dtype, name="feature_encoder")(
            input_values, valid_samples
        )
        x = FeatureProjection(c, dtype=self.dtype, name="feature_projection")(
            feats, deterministic
        )
        masked_spec_embed = self.param(
            "masked_spec_embed",
            lambda rng: jax.random.uniform(rng, (c.hidden_size,), jnp.float32),
        )
        if not deterministic and c.apply_spec_augment and c.mask_time_prob > 0:
            B, T, _ = x.shape
            rng = self.make_rng("dropout")
            # Bernoulli span starts at rate p/len, dilated to len via windowed max.
            starts = jax.random.bernoulli(
                rng, c.mask_time_prob, (B, T)
            ).astype(jnp.float32)
            kernel = jnp.ones((c.mask_time_length,), jnp.float32)
            spans = jax.vmap(
                lambda s: jnp.convolve(s, kernel, mode="full")[: T]
            )(starts)
            mask = (spans > 0)[..., None]
            x = jnp.where(mask, masked_spec_embed.astype(x.dtype), x)
        valid_frames = (
            None if valid_samples is None
            else feature_extract_output_length(c, valid_samples)
        )
        x = Encoder(c, dtype=self.dtype, name="encoder")(x, deterministic, valid_frames)
        return x


def feature_extract_output_length(c: Wav2Vec2Config, input_length: int) -> int:
    """Number of encoder frames for a waveform of input_length samples."""
    t = input_length
    for k, s in zip(c.conv_kernel, c.conv_stride):
        t = (t - k) // s + 1
    return t


def wav2vec2_process(waves, max_length: Optional[int] = None):
    """Host-side equivalent of Wav2Vec2Processor for this checkpoint
    (do_normalize=True, return_attention_mask=False, zero-pad to longest;
    reference: src/trainer.py:251). HF quirk reproduced exactly: because this
    checkpoint returns no attention mask, normalisation happens AFTER padding
    over the full padded length — the padding zeros shift the statistics and
    end up non-zero themselves.

    Accepts a list of 1-D float arrays; returns [B, T] float32.
    """
    import numpy as np

    if max_length is None:
        max_length = max(int(w.shape[0]) for w in waves)
    out = np.zeros((len(waves), max_length), np.float32)
    for i, w in enumerate(waves):
        w = np.asarray(w, np.float32)[:max_length]
        out[i, : w.shape[0]] = w
    mean = out.mean(axis=1, keepdims=True)
    var = out.var(axis=1, keepdims=True)
    return (out - mean) / np.sqrt(var + 1e-7)
