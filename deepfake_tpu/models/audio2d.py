"""Raw-waveform audio branch head (paudio modality).

Counterpart of the reference's Audio2D wrapper over HF wav2vec2
(reference: src/models/audioTransformer.py:5-30): time-average-pool the
encoder's last_hidden_state to a 768-d clip embedding, then
MLP(768->512->512) + LayerNorm + GELU + Linear(512->num_classes) + sigmoid,
or return the raw 768-d feature when ``use_feat`` (fusion mode).

Faithful quirk: the reference calls F.dropout without training= gating, so
dropout stays active at inference (reference: audioTransformer.py:24,28).
That behaviour is reproduced only when ``parity_inference_dropout`` is set;
default is a corrected deterministic eval. Heads emit logits; ``__call__``
applies sigmoid for reference parity, ``logits`` skips it for training.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from deepfake_tpu.models.layers import Mlp, gelu_exact
from deepfake_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model

Dtype = Any


class Audio2D(nn.Module):
    num_classes: int = 1
    use_feat: bool = False
    model_drop: float = 0.1  # reference arg swin_drop (audioTransformer.py:14)
    classify_drop: float = 0.1
    wav_config: Wav2Vec2Config = Wav2Vec2Config()
    parity_inference_dropout: bool = False
    dtype: Dtype = jnp.float32

    def _drop(self, x, rate, deterministic):
        # F.dropout-without-gating quirk: active at inference only in parity mode.
        det = deterministic and not self.parity_inference_dropout
        return nn.Dropout(rate, deterministic=det)(x)

    @nn.compact
    def __call__(self, input_values, deterministic: bool = True, return_logits: bool = False):
        # (wave, lengths) pair: reference pad-to-batch-longest emulation —
        # the encoder masks itself to the batch-longest frame count and the
        # pool averages over exactly those frames (see Wav2Vec2Model)
        valid_frames = None
        if isinstance(input_values, (tuple, list)):
            from deepfake_tpu.models.wav2vec2 import feature_extract_output_length

            _, lengths = input_values
            valid_frames = feature_extract_output_length(
                self.wav_config, jnp.max(lengths)
            )
        hidden = Wav2Vec2Model(self.wav_config, dtype=self.dtype, name="wav_model")(
            input_values, deterministic=deterministic
        )
        if valid_frames is not None:
            fmask = (jnp.arange(hidden.shape[1]) < valid_frames)[None, :, None]
            feat = jnp.sum(hidden * fmask, axis=1) / valid_frames.astype(hidden.dtype)
        else:
            feat = jnp.mean(hidden, axis=1)  # AdaptiveAvgPool2d((1, 768)) over time
        feat = self._drop(feat, self.model_drop, deterministic)
        if self.use_feat:
            return feat
        x = Mlp(512, 512, drop=0.0, dtype=self.dtype, name="mlp")(feat, deterministic)
        x = gelu_exact(nn.LayerNorm(dtype=self.dtype, name="norm")(x))
        x = self._drop(x, self.classify_drop, deterministic)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)
        logits = jnp.squeeze(logits, -1) if self.num_classes == 1 else logits
        if return_logits:
            return logits
        return nn.sigmoid(logits)
