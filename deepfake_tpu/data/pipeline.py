"""Device feeding: on-device feature assembly + background prefetch.

Two jobs:

1. Feature assembly — raw host batches (uint8 frames, bucket-padded PCM with
   valid lengths) become model inputs ON DEVICE in one jitted program:
   frame normalisation/augmentation (ops.image), the mel-spectrogram image
   (ops.mel, replacing the reference's offline JPEG pass), and the wav2vec2
   processor normalisation computed over the *valid* region of padded
   waveforms (matching HF's ragged-then-pad behaviour, reference:
   src/trainer.py:251, with static shapes).

2. Prefetch — a daemon thread + bounded queue moving batches to the device
   ahead of consumption: the CudaDataLoader equivalent
   (reference: data/cuda_dataloader.py:5-74, queue_size=4 at :8), with
   jax.device_put replacing the dedicated CUDA stream.
"""

from __future__ import annotations

import functools
import queue
import threading
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from deepfake_tpu.config import Config
from deepfake_tpu.ops.image import preprocess_clip_batch
from deepfake_tpu.ops.mel import IMAGENET_MEAN, IMAGENET_STD, mel_filterbank


def hf_wave_normalize(wave: jnp.ndarray) -> jnp.ndarray:
    """Wav2Vec2Processor parity for base-960h (return_attention_mask=False):
    zero-mean/unit-variance over the FULL padded row — HF normalises after
    padding, so the zeros shift the statistics (reference: src/trainer.py:251
    feeds the processor ragged waveforms padded to the batch longest)."""
    mean = jnp.mean(wave, axis=1, keepdims=True)
    var = jnp.var(wave, axis=1, keepdims=True)
    return (wave - mean) / jnp.sqrt(var + 1e-7)


def batch_longest_wave_normalize(
    wave: jnp.ndarray, length: jnp.ndarray
) -> jnp.ndarray:
    """Exact reference processor semantics inside a static bucket row: the
    reference pads each batch to its LONGEST clip L and normalises over the
    L-length row (reference: src/trainer.py:251, padding='longest'). Here the
    row is bucket-padded (static T >= L), so statistics are computed as if
    the row were L long — the padding zeros between the valid length and L
    contribute exactly as in the reference, and every pad position takes the
    reference's padding value (0 - mean)/std. Positions beyond L only exist
    in the bucket; the model masks them out (Wav2Vec2Model pair input)."""
    L = jnp.max(length).astype(wave.dtype)
    T = wave.shape[1]
    mask = (jnp.arange(T)[None, :] < length[:, None]).astype(wave.dtype)
    n = length[:, None].astype(wave.dtype)
    mean = jnp.sum(wave * mask, axis=1, keepdims=True) / L
    sq = jnp.sum(mask * (wave - mean) ** 2, axis=1, keepdims=True) + (L - n) * mean ** 2
    var = sq / L
    return (wave - mean) / jnp.sqrt(var + 1e-7)


def masked_wave_normalize(wave: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """Corrected variant: statistics over the valid prefix only, zeros beyond
    (what the HF processor does when a checkpoint ships attention masks)."""
    B, T = wave.shape
    mask = (jnp.arange(T)[None, :] < length[:, None]).astype(wave.dtype)
    n = jnp.maximum(length.astype(wave.dtype), 1.0)[:, None]
    mean = jnp.sum(wave * mask, axis=1, keepdims=True) / n
    var = jnp.sum(mask * (wave - mean) ** 2, axis=1, keepdims=True) / n
    return mask * (wave - mean) / jnp.sqrt(var + 1e-7)


def _resize_axis_dynamic(img: jnp.ndarray, valid: jnp.ndarray, out_len: int, axis: int):
    """Bilinear resize of img's [0:valid) region along `axis` to out_len, with
    `valid` a traced scalar (static shapes, dynamic content)."""
    n = img.shape[axis]
    scale = valid.astype(jnp.float32) / out_len
    src = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, valid.astype(jnp.float32) - 1.0)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    w = (src - lo.astype(jnp.float32))
    a = jnp.take(img, lo, axis=axis)
    b = jnp.take(img, hi, axis=axis)
    shape = [1] * img.ndim
    shape[axis] = out_len
    w = w.reshape(shape)
    return a * (1 - w) + b * w


@functools.partial(
    jax.jit, static_argnames=("sr", "n_fft", "hop", "n_mels", "size", "wave_sr",
                              "raw_uint8")
)
def mel_image_masked(
    wave: jnp.ndarray, length: jnp.ndarray, sr: int = 22050, n_fft: int = 2048,
    hop: int = 512, n_mels: int = 128, size: int = 224,
    wave_sr: Optional[int] = None, raw_uint8: bool = False,
) -> jnp.ndarray:
    """[B, T] padded PCM + valid lengths -> [B, size, size, 3] mel images,
    computed over the valid region only (parity with the reference's
    whole-clip mel, src/utils.py:63-87, under static shapes).

    wave_sr: sample rate of the incoming PCM. When it differs from `sr`, the
    batch is resampled on device first — replicating the reference's chain
    where 16 kHz PCM passes through librosa.load's default 22.05 kHz
    resampler before the mel (reference: src/utils.py:66-70).
    raw_uint8: stop after the minmax-uint8 resize (one grayscale [size, size]
    plane, the reference's pre-JPEG image) instead of the normalised
    3-channel model input."""
    from deepfake_tpu.ops.mel import stft_power
    from deepfake_tpu.ops.resample import resample, resampled_length

    if wave_sr is not None and wave_sr != sr:
        length = resampled_length(length, wave_sr, sr)
        wave = resample(wave, wave_sr, sr)

    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))

    def one(y, ln):
        # center=True reflect padding around the *valid* region: gather with
        # dynamically reflected indices so the edge frames match the
        # exact-length computation (left pad is static; the right reflection
        # bounces at ln-1, valid while ln > n_fft//2)
        T = y.shape[0]
        pad = n_fft // 2
        pos = jnp.arange(T + 2 * pad) - pad
        idx = jnp.abs(pos)
        idx = jnp.where(idx >= ln, jnp.maximum(2 * ln - 2 - idx, 0), idx)
        ypad = y[jnp.clip(idx, 0, T - 1)]
        n_fr = 1 + (T + 2 * pad - n_fft) // hop
        widx = (
            np.arange(n_fft)[None, :]
            + hop * np.arange(n_fr)[:, None]
        )
        spec = stft_power(ypad[widx], n_fft)  # GEMM-native windowed DFT
        S = jnp.einsum("mf,tf->mt", fb, spec, preferred_element_type=jnp.float32)
        n_frames = 1 + ln // hop  # librosa center=True frame count
        fmask = (jnp.arange(S.shape[1])[None, :] < n_frames).astype(S.dtype)
        # power_to_db(ref=max over valid)
        amin = 1e-10
        ref = jnp.maximum(jnp.max(S * fmask), amin)
        db = 10.0 * jnp.log10(jnp.maximum(S, amin)) - 10.0 * jnp.log10(ref)
        db_valid = jnp.where(fmask > 0, db, -jnp.inf)
        top = jnp.max(db_valid)
        db = jnp.maximum(db, top - 80.0)
        # minmax over valid region -> uint8 scale
        lo = jnp.min(jnp.where(fmask > 0, db, jnp.inf))
        hi = top
        img = jnp.clip(jnp.round((db - lo) * (255.0 / jnp.maximum(hi - lo, 1e-12))),
                       0, 255)
        # resize: mel axis static, time axis dynamic-valid
        img = jax.image.resize(img, (size, img.shape[1]), method="linear")
        img = _resize_axis_dynamic(img, n_frames, size, axis=1)
        img = jnp.clip(jnp.round(img), 0, 255)
        if raw_uint8:
            return img.astype(jnp.uint8)
        img = img / 255.0
        img = jnp.repeat(img[..., None], 3, axis=-1)
        return (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    return jax.vmap(one)(wave, length)


class FeatureAssembler:
    """Raw host batch dict -> model inputs (device arrays)."""

    def __init__(self, cfg: Config, train: bool):
        self.cfg = cfg
        self.train = train
        self.modality = cfg.data.modality
        self.rng = jax.random.PRNGKey(cfg.random_seed + (1 if train else 2))

    def __call__(self, feats, labels) -> Tuple:
        cfg = self.cfg
        out = []
        if "video" in feats:
            self.rng, k = jax.random.split(self.rng)
            video = feats["video"]
            # Swin3D consumes the channel-folded [B,T,H,W*3] layout (dense
            # device lanes; see models/swin3d.PatchEmbed3D). Eval folds the
            # uint8 on the HOST (free numpy reshape — no padded tensor ever
            # exists on device); train needs the spatial layout for
            # augmentation, so the fold rides inside the preprocess jit.
            fold = self.modality == "video_swin"
            if fold and not self.train and hasattr(video, "reshape"):
                import numpy as np

                from deepfake_tpu.models.swin3d import maybe_window_feed

                b, t, h, w, c = video.shape
                # pre-windowed feed when profitable: the patchify+window-
                # partition permutation runs HERE on host uint8 (cheap
                # strided copy) instead of as ~11 ms of lane-padded device
                # relayouts per b8 batch (models/swin3d.maybe_window_feed
                # owns the gates, shared with bench.py)
                wf = maybe_window_feed(
                    np.asarray(video), cfg.model.swin3d_patch,
                    cfg.model.swin3d_window,
                    embed_dim=cfg.model.swin3d_embed_dim,
                    use_pallas=cfg.model.swin3d_pallas_attn)
                video = wf if wf is not None else video.reshape(
                    b, t, h, w * c)
            out.append(
                preprocess_clip_batch(
                    k, jnp.asarray(video), train=self.train, fold=fold,
                )
            )
        if "audio_image" in feats:
            # JPEG parity path: uint8 image -> ImageNet normalisation only
            from deepfake_tpu.ops.image import normalize_imagenet

            out.append(normalize_imagenet(jnp.asarray(feats["audio_image"])))
        if "audio_wave" in feats:
            out.append(
                mel_image_masked(
                    jnp.asarray(feats["audio_wave"]),
                    jnp.asarray(feats["audio_len"]),
                    sr=cfg.mel.sample_rate, n_fft=cfg.mel.n_fft,
                    hop=cfg.mel.hop_length, n_mels=cfg.mel.n_mels,
                    size=cfg.data.audio_size,
                    wave_sr=cfg.data.wave_sample_rate,
                )
            )
        if "paudio_wave" in feats:
            wave = jnp.asarray(feats["paudio_wave"])
            if cfg.data.wave_norm == "masked":
                out.append(
                    masked_wave_normalize(wave, jnp.asarray(feats["paudio_len"]))
                )
            elif cfg.data.wave_norm == "batch_longest":
                # exact reference semantics: stats over the batch-longest
                # length; the (wave, lengths) pair tells the model to mask
                # itself to the batch-longest frame count. The reference
                # normalises per DataLoader batch == per accumulation
                # micro-batch (src/trainer.py:251), so under accumulation the
                # "batch" for longest-stats is each micro-batch slice — the
                # same slices the trainer's scan will hand the model.
                lengths = jnp.asarray(feats["paudio_len"])
                accum = max(1, cfg.optim.accum_step) if self.train else 1
                B = wave.shape[0]
                if accum > 1 and B % accum == 0:
                    w = wave.reshape(accum, B // accum, wave.shape[1])
                    l = lengths.reshape(accum, B // accum)
                    normed = jax.vmap(batch_longest_wave_normalize)(w, l)
                    out.append((normed.reshape(B, wave.shape[1]), lengths))
                else:
                    out.append((batch_longest_wave_normalize(wave, lengths), lengths))
            else:  # "hf": post-padding statistics over the full bucket row
                out.append(hf_wave_normalize(wave))
        inputs = tuple(out) if self.modality == "fused" else out[0]
        return inputs, jnp.asarray(labels)


class DevicePrefetcher:
    """Background-thread prefetch queue (reference: data/cuda_dataloader.py).
    Wraps an iterable of raw batches; yields assembled device batches."""

    def __init__(self, loader: Iterable, assemble, depth: int = 4):
        self.loader = loader
        self.assemble = assemble
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = object()

        def producer():
            try:
                for batch in self.loader:
                    feats, labels, names = batch
                    q.put((self.assemble(feats, labels), names))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


class ModelFeedLoader:
    """Adapter: DeepFakeDataModule loader -> Trainer's (inputs, labels)
    iterable, with assembly + prefetch."""

    def __init__(self, raw_loader, cfg: Config, train: bool, depth: Optional[int] = None):
        self.raw = raw_loader
        self.assembler = FeatureAssembler(cfg, train)
        self.depth = depth if depth is not None else cfg.data.prefetch_depth

    def __len__(self):
        return len(self.raw)

    def __iter__(self):
        for (inputs, labels), _names in DevicePrefetcher(
            self.raw, self.assembler, self.depth
        ):
            yield inputs, labels
