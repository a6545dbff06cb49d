"""Typed configuration tree + CLI.

Replaces the reference's flat argparse namespace (reference: config.py:3-45)
and the hyperparameter shell scripts (reference: train_model.sh:14-38,
test_model.sh:14-39). Every reference flag has an equivalent here; canonical
per-modality presets live in :data:`PRESETS`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass
class DataConfig:
    """Dataset discovery + host ingest. (reference: config.py:7-11, data/data_process.py)"""

    data_root: str = "/data/deepfake/full_data"
    modality: str = "audio"  # video | audio | paudio | fused
    num_frames: int = 32  # fixed per-clip frame count (reference: config.py:9)
    frame_size: int = 224
    audio_size: int = 224  # mel-spectrogram image side (reference: utils.py:85)
    num_workers: int = 4  # host decode worker threads
    decode_method: str = "seek"  # seek (reference semantics) | sequential (faster on short clips)
    # C++ worker-pool ring-buffer decode (native/ingest.cpp) feeding batches
    # while the previous batch is on device; auto-falls back to the Python
    # threaded loader when the .so is not built
    use_native_ingest: bool = True
    force_generate: bool = False  # re-run offline audio feature pass
    prefetch_depth: int = 4  # device prefetch queue (reference: cuda_dataloader.py:8 queue_size=4)
    # Ragged waveforms are padded to fixed buckets to keep XLA shapes static
    # (the reference pads 'longest' per batch — dynamic shapes, src/trainer.py:251).
    wave_seconds_buckets: Tuple[float, ...] = (4.0, 8.0, 16.0)
    wave_sample_rate: int = 16000
    # waveform normalisation: "batch_longest" = exact Wav2Vec2Processor
    # parity (stats over the batch-longest padded length; the model masks
    # itself to the matching frame count — reference: src/trainer.py:251);
    # "hf" = post-padding stats over the full static bucket row (diverges
    # from the reference whenever bucket != batch longest);
    # "masked" = corrected stats over the valid prefix only
    wave_norm: str = "batch_longest"
    # parity path: consume pre-rendered mel-spectrogram JPEGs from the
    # reference's {train,Val,Test}AudioImgs dirs instead of on-device mel
    # (reference: data_process.py:70-97,150-153)
    audio_from_images: bool = False
    # long-video sliding-window chunking (north-star reading of data/long_data_split.py)
    chunk_frames: int = 32
    chunk_stride: int = 16


@dataclass
class MelConfig:
    """On-device log-mel spectrogram (replaces the JPEG round trip,
    reference: src/utils.py:63-87)."""

    sample_rate: int = 22050  # librosa.load default used by the reference (src/utils.py:70)
    n_fft: int = 2048
    hop_length: int = 512
    n_mels: int = 128
    fmin: float = 0.0
    fmax: Optional[float] = None  # librosa default: sr/2
    top_db: float = 80.0
    target_size: int = 224


@dataclass
class ModelConfig:
    """Model hyperparameters (reference: train.py:31-49 constructor args)."""

    num_classes: int = 1
    classify_drop: float = 0.1  # MLP dropout (reference: config.py:16)
    swin_drop: float = 0.1  # backbone dropout (reference: config.py:17)
    bn_momentum: float = 0.1  # PyTorch semantics; converted to 1-x for flax
    num_hiddens: int = 128  # classifier hidden (reference: config.py:19)
    soft: float = 0.01  # InfoNCE temperature (reference: config.py:18)
    video_pool: str = "mean"  # VST pooling method (reference: config.py:20)
    # SwinV2-B audio branch (reference: train.py:35)
    swin2d_embed_dim: int = 128
    swin2d_depths: Tuple[int, ...] = (2, 2, 18, 2)
    swin2d_heads: Tuple[int, ...] = (4, 8, 16, 32)
    swin2d_window: int = 7
    swin2d_pretrained_windows: Tuple[int, ...] = (16, 16, 16, 16)
    # Video Swin 3D (reference: video_swin_transformer.py:773-780)
    swin3d_embed_dim: int = 96
    swin3d_depths: Tuple[int, ...] = (2, 2, 18, 2)
    swin3d_heads: Tuple[int, ...] = (3, 6, 12, 24)
    swin3d_patch: Tuple[int, ...] = (2, 4, 4)
    swin3d_window: Tuple[int, ...] = (8, 7, 7)
    swin3d_drop_path: float = 0.1
    # Token-major Pallas attention for the 3D (8,7,7)=392-token windows:
    # [N,N] f32 logits stay in VMEM and head split/merge transposes vanish.
    # Measured 2.1x on Swin-B 3D 32f b8 (BASELINE_MEASURED.md), bit-identical
    # output. Inference only (training falls back to the einsum path).
    swin3d_pallas_attn: bool = True
    # Token-major packed-window Pallas attention for the 2D stack's small
    # (7x7=49-token) windows: heads in lane slices + multi-window sublane
    # packing (block-diagonal gate). A/B flag — default per measurement in
    # BASELINE_MEASURED.md ("SwinV2-2D packed-NHC A/B").
    swin2d_pallas_attn: bool = False
    # wav2vec2 topology (defaults mirror wav2vec2-base-960h; reduced in the
    # multi-chip CPU dryrun)
    wav_layers: int = 12
    wav_hidden: int = 768
    wav_heads: int = 12
    wav_intermediate: int = 3072
    wav_conv_dim: int = 512
    # checkpoint paths (reference: config.py:14-24)
    video_pretrained_dir: Optional[str] = None
    audio_pretrained_dir: Optional[str] = None
    audio_ckpt_path: Optional[str] = None
    video_ckpt_path: Optional[str] = None
    paudio_ckpt_path: Optional[str] = None
    fused_ckpt_path: Optional[str] = None
    wav2vec2_dir: Optional[str] = None  # HF-format dir with model.safetensors
    resume: bool = False
    # Fused Pallas kernels for the Inception-ResNet-v2 B/C residual blocks at
    # inference (VMEM-resident block, folded BatchNorm; ops/pallas_inception.py).
    # Training always uses the XLA path.
    irv2_pallas_blocks: bool = False
    # int8-quantized IRv2 conv trunk at inference ('none' | 'int8'): folds the
    # BatchNorm affine into each conv, quantizes weights per-output-channel
    # and activations per-tensor (dynamic), and runs the convolutions
    # int8 x int8 -> int32 on the MXU's double-rate 8-bit path. Training
    # paths ignore it. Accuracy: quantization noise only (see
    # tests/test_quantize.py parity bounds); checkpoints are unchanged.
    irv2_quant: str = "none"
    # Faithful-quirk switch: the reference applies F.dropout without
    # training= gating, i.e. dropout is active at inference
    # (reference: audioTransformer.py:24,28, IResNet.py:372, InceptionResV2.py:189).
    # parity_inference_dropout=False gives the corrected deterministic eval.
    parity_inference_dropout: bool = False


@dataclass
class OptimConfig:
    """Learning configuration (reference: config.py:28-39, trainer.py:79-88)."""

    learning_rate: float = 1e-4
    momentum: float = 0.9
    weight_decay: float = 0.05  # reference flag l2_decacy (config.py:34)
    batch_size: int = 8
    accum_step: int = 4  # gradient accumulation (reference: config.py:31)
    epochs: int = 50
    align_loss_rate: float = 0.4  # InfoNCE mixing (reference: config.py:33, disabled in ref)
    use_align_loss: bool = False  # the reference computes-but-disables it (ModalFusion.py:41-43)
    schedule: str = "cosine"  # CosineAnnealingLR equivalent (reference: trainer.py:85)
    grad_clip: Optional[float] = None
    skip_learning: bool = False
    val_model: bool = False


@dataclass
class ParallelConfig:
    """Device mesh + dtype policy (replaces torch DataParallel,
    reference: src/trainer.py:74-75)."""

    data_axis: int = -1  # -1: all devices on the data axis
    model_axis: int = 1
    axis_names: Tuple[str, str] = ("data", "model")
    compute_dtype: str = "bfloat16"  # bf16 on MXU; use float32 for parity runs
    param_dtype: str = "float32"
    # Inference-only: store weights in compute_dtype instead of casting f32
    # masters inside each forward. MEASURED SLOWER on v5e (163 vs 178 fused
    # clips/s, BASELINE_MEASURED.md "bf16 weight storage A/B") — XLA lays out
    # f32 weights optimally when it fuses the cast, while raw bf16 weight
    # inputs hit per-use relayouts. Kept as an option; default off.
    infer_cast_params: bool = False
    # Inference-only: precompute every window-attention relative-position
    # bias ([H,N,N], param-only) once at weight-load time instead of
    # re-expanding the table each forward — the table gathers cost 2.5 ms of
    # the 5.5 ms config-2 b1 forward (round-4 trace). Serving paths
    # (Predictor/SubmitCtl) apply it after weights are final.
    infer_bias_cache: bool = True
    remat: bool = False  # activation checkpointing (reference plumbed it, default off)
    # remat save policy: '' = save nothing (flax default), 'dots' = save
    # matmul outputs / recompute elementwise (usually the best trade),
    # 'dots_all', 'nothing'. See models/layers.py remat_wrap.
    remat_policy: str = ""
    # multi-host: call jax.distributed.initialize() at startup so the mesh
    # spans hosts over DCN (the reference is strictly single-node,
    # SURVEY.md §2c). Coordinator/process env follows JAX conventions.
    multihost: bool = False
    # PRNG implementation for every jax.random stream (dropout/drop-path/
    # init). 'auto' = hardware 'rbg' on TPU, 'threefry2x32' elsewhere:
    # threefry synthesizes random bits on the VPU and measurably taxes wide
    # train steps (fused b8: 37.2 -> 39.1% MFU with rbg, round-5 A/B in
    # docs/sweeps/round5_train.jsonl). Set 'threefry2x32' for bit-stream
    # stability across XLA releases. See utils/seeding.py::apply_prng_impl.
    prng_impl: str = "auto"


@dataclass
class LogConfig:
    """Observability (reference: config.py:37,42-43, src/utils.py:203-240)."""

    log_step: int = 10
    log_dir: Optional[str] = None
    model_save: int = 5  # checkpoint every N optimizer steps
    ckpt_dir: str = "./checkpoints"
    curve_dir: str = "./checkpoints"
    profile_dir: Optional[str] = None  # jax.profiler trace output
    hbm_track_step: int = 500  # HBM live-buffer census cadence (ref: gpu_mem_track.py 500 steps)
    step_deadline_s: float = 600.0  # watchdog: warn when one step stalls this long


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    mel: MelConfig = field(default_factory=MelConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    log: LogConfig = field(default_factory=LogConfig)
    random_seed: int = 42

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=4, default=str)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# Canonical per-modality presets — the reference's "real" configs live in its
# launch scripts (train_model.sh:14-38). These mirror those values.
PRESETS: Dict[str, Dict[str, Any]] = {
    "video": {"data.modality": "video", "optim.batch_size": 8, "optim.accum_step": 4},
    "audio": {"data.modality": "audio", "optim.batch_size": 48, "optim.epochs": 12},
    "paudio": {"data.modality": "paudio", "optim.batch_size": 8},
    "fused": {
        "data.modality": "fused",
        "optim.batch_size": 8,
        "optim.accum_step": 4,
        "optim.learning_rate": 1e-4,
        "optim.epochs": 4,
    },
    # The reference's original video path (switched off at its entry point
    # but kept in-tree — train.py:8-9,32-33): Video Swin 3D, Swin-S topology
    # (video_swin_transformer.py:773-780), shell-script hyperparameters
    # (train_model.sh:15,22-31: 32 frames, batch 8 x accum 4, mean pool,
    # num_hiddens 256). Model topology fields keep their defaults — they
    # already match the reference construction.
    "video_swin": {
        "data.modality": "video_swin",
        "data.num_frames": 32,
        "optim.batch_size": 8,
        "optim.accum_step": 4,
        "optim.learning_rate": 1e-4,
        "optim.epochs": 4,
        "model.video_pool": "mean",
        "model.num_hiddens": 256,
    },
}


def _str2bool(v: str) -> bool:
    """argparse `type=bool` treats any non-empty string as True, so the
    reference-compat invocation `-cuda False` would silently store True;
    parse the usual spellings instead."""
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("1", "true", "t", "yes", "y"):
        return True
    if s in ("0", "false", "f", "no", "n", ""):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def _apply_dotted(cfg: Config, key: str, value: Any) -> None:
    parts = key.split(".")
    obj = cfg
    for p in parts[:-1]:
        obj = getattr(obj, p)
    cur = getattr(obj, parts[-1])
    if cur is not None and not isinstance(cur, (tuple, list)) and value is not None:
        value = type(cur)(value)
    object.__setattr__(obj, parts[-1], value)


def get_config(argv: Optional[list] = None) -> Config:
    """CLI front end. Mirrors the reference flag surface (config.py:3-45)
    but writes into the typed tree; `--set a.b.c=v` reaches any field."""
    p = argparse.ArgumentParser(description="deepfake_tpu")
    p.add_argument("--preset", type=str, default=None, choices=list(PRESETS))
    # DATA
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--modality", type=str, default=None)
    p.add_argument("--num_frames", type=int, default=None)
    p.add_argument("--force_generate", action="store_true")
    p.add_argument("-nu", "--num_workers", type=int, default=None)
    # Model
    p.add_argument("--classify_drop", type=float, default=None)
    p.add_argument("--swin_drop", type=float, default=None)
    p.add_argument("--soft", type=float, default=None)
    p.add_argument("--num_hiddens", type=int, default=None)
    p.add_argument("--video_pool", type=str, default=None)
    p.add_argument("--audio_ckpt_path", type=str, default=None)
    p.add_argument("--video_ckpt_path", type=str, default=None)
    p.add_argument("--paudio_ckpt_path", type=str, default=None)
    p.add_argument("--fused_ckpt_path", type=str, default=None)
    p.add_argument("--wav2vec2_dir", type=str, default=None)
    # external pretrained backbones (reference: config.py:14-15; loaded with
    # strict=False-style grafting, src/utils.py:294-380)
    p.add_argument("--video_pretrained_dir", type=str, default=None)
    p.add_argument("--audio_pretrained_dir", type=str, default=None)
    p.add_argument("--bn_momentum", type=float, default=None)
    p.add_argument("--Resume", action="store_true")
    # accepted for reference-CLI compatibility; device selection is JAX's
    p.add_argument("-cuda", "--use_cuda", type=_str2bool, default=None)
    # Learning
    p.add_argument("--random_seed", type=int, default=None)
    p.add_argument("-b", "--batch_size", type=int, default=None)
    p.add_argument("--accum_step", type=int, default=None)
    p.add_argument("--align_loss_rate", type=float, default=None)
    p.add_argument("--l2_decacy", type=float, default=None)  # reference spelling kept
    p.add_argument("-e", "--epochs", type=int, default=None)
    p.add_argument("-lr", "--learning_rate", type=float, default=None)
    p.add_argument("--model_save", type=int, default=None)
    p.add_argument("--skip_learning", action="store_true")
    p.add_argument("--val_model", action="store_true")
    # Log
    p.add_argument("--log_step", type=int, default=None)
    p.add_argument("--log_dir", type=str, default=None)
    # escape hatch into the full tree
    p.add_argument("--set", action="append", default=[], metavar="a.b=v")
    args = p.parse_args(argv)

    cfg = Config()
    if args.preset:
        for k, v in PRESETS[args.preset].items():
            _apply_dotted(cfg, k, v)

    direct = {
        "data_root": "data.data_root",
        "modality": "data.modality",
        "num_frames": "data.num_frames",
        "num_workers": "data.num_workers",
        "classify_drop": "model.classify_drop",
        "swin_drop": "model.swin_drop",
        "soft": "model.soft",
        "num_hiddens": "model.num_hiddens",
        "video_pool": "model.video_pool",
        "audio_ckpt_path": "model.audio_ckpt_path",
        "video_ckpt_path": "model.video_ckpt_path",
        "paudio_ckpt_path": "model.paudio_ckpt_path",
        "fused_ckpt_path": "model.fused_ckpt_path",
        "wav2vec2_dir": "model.wav2vec2_dir",
        "video_pretrained_dir": "model.video_pretrained_dir",
        "audio_pretrained_dir": "model.audio_pretrained_dir",
        "bn_momentum": "model.bn_momentum",
        "random_seed": "random_seed",
        "batch_size": "optim.batch_size",
        "accum_step": "optim.accum_step",
        "align_loss_rate": "optim.align_loss_rate",
        "l2_decacy": "optim.weight_decay",
        "epochs": "optim.epochs",
        "learning_rate": "optim.learning_rate",
        "model_save": "log.model_save",
        "log_step": "log.log_step",
        "log_dir": "log.log_dir",
    }
    for arg_name, dotted in direct.items():
        v = getattr(args, arg_name)
        if v is not None:
            _apply_dotted(cfg, dotted, v)
    if args.force_generate:
        cfg.data.force_generate = True
    if args.Resume:
        cfg.model.resume = True
    if args.skip_learning:
        cfg.optim.skip_learning = True
    if args.val_model:
        cfg.optim.val_model = True
    for kv in args.set:
        k, _, v = kv.partition("=")
        try:
            parsed = json.loads(v)
        except (json.JSONDecodeError, ValueError):
            parsed = v
        _apply_dotted(cfg, k, parsed)
    return cfg
