"""Dataset discovery + per-modality sample loading + data module.

Counterpart of the reference's DeepFake(Dataset)/DeepFakeSet
(reference: data/data_process.py:16-235):

* split layout: <root>/phase1/trainset + <root>/train_label.txt,
  <root>/phase1/valset + <root>/val_label.txt,
  <root>/phase2/testset1seen + <root>/phase2/prediction.txt.csv
  (reference: data_process.py:22-31);
* test-time crash resume: videos already present in ./prediction.csv are
  skipped (reference: data_process.py:42-50);
* per-modality features: video -> uint8 frame clip; audio -> 16 kHz PCM for
  the on-device mel pipeline (replacing the offline mel-JPEG pass,
  data_process.py:70-97); paudio -> bucket-padded PCM; fused -> all three.

Host work stops at decode + static-shape padding: normalisation,
augmentation, and the mel transform run on device. Batches are dicts of
fixed-shape numpy arrays; the data module wires bucketing, shuffling, and
the device prefetcher.
"""

from __future__ import annotations

import csv
import os
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from deepfake_tpu.config import Config
from deepfake_tpu.data.audio_io import extract_wav, pad_to_bucket
from deepfake_tpu.data.video_decode import extract_frames


def read_label_csv(path: str) -> Dict[str, float]:
    """video_name,target csv -> {name: label} (reference: data_process.py:35-41)."""
    out: Dict[str, float] = {}
    with open(path) as f:
        reader = csv.DictReader(f)
        for row in reader:
            name = row.get("video_name")
            if name is None:
                continue
            target = row.get("target")
            out[name] = float(target) if target not in (None, "") else float("nan")
    return out


def predicted_names(prediction_csv: str) -> List[str]:
    """Names already scored in a (possibly header-less) prediction.csv
    (reference: data_process.py:44-50 reads it with pandas)."""
    if not os.path.exists(prediction_csv):
        return []
    names = []
    with open(prediction_csv) as f:
        for i, line in enumerate(f):
            parts = line.strip().split(",")
            if not parts or not parts[0]:
                continue
            if i == 0 and parts[0] == "video_name":
                continue
            names.append(parts[0])
    return names


class DeepFakeDataset:
    """Index of one split; __getitem__ returns (features dict, label, name)."""

    def __init__(
        self,
        cfg: Config,
        split: str = "train",  # train | val | test
        prediction_csv: str = "./prediction.csv",
        resume: bool = True,
    ):
        self.cfg = cfg
        self.split = split
        root = cfg.data.data_root
        if split == "train":
            self.dataset_path = os.path.join(root, "phase1", "trainset")
            label_path = os.path.join(root, "train_label.txt")
        elif split == "val":
            self.dataset_path = os.path.join(root, "phase1", "valset")
            label_path = os.path.join(root, "val_label.txt")
        else:
            self.dataset_path = os.path.join(root, "phase2", "testset1seen")
            label_path = os.path.join(root, "phase2", "prediction.txt.csv")

        self.labels = read_label_csv(label_path) if os.path.exists(label_path) else {}
        video_exts = (".mp4", ".avi", ".mov", ".mkv", ".webm")
        listing = sorted(
            n for n in os.listdir(self.dataset_path)
            if n.lower().endswith(video_exts)
        )
        if split == "test":
            names = list(self.labels) or listing
            skip = set(predicted_names(prediction_csv)) if resume else set()
            names = [n for n in names if n not in skip]
        else:
            names = listing
        self.names = names

        # Lazy AudioImgs generation at init, honouring --force_generate
        # (reference: data/data_process.py:70-97, config.py:10): when the
        # JPEG parity path is active, any missing mel JPEGs are produced
        # before the first epoch; force_generate regenerates all of them.
        if (
            cfg.data.audio_from_images
            and cfg.data.modality in ("audio", "fused")
        ):
            from deepfake_tpu.data.audio_images import ensure_audio_images

            ensure_audio_images(cfg, self.split, self.dataset_path,
                                listing or names)

    def __len__(self) -> int:
        return len(self.names)

    def _load_audio_image(self, name: str) -> np.ndarray:
        """Reference JPEG parity path: load <split>AudioImgs/<name>.jpg as
        uint8 RGB [S, S, 3] (reference: data_process.py:70-97,150-153)."""
        import cv2

        img_dir = {
            "train": "trainAudioImgs", "val": "ValAudioImgs", "test": "TestAudioImgs",
        }[self.split]
        img_path = os.path.join(
            self.cfg.data.data_root, img_dir, os.path.splitext(name)[0] + ".jpg"
        )
        img = cv2.imread(img_path)
        if img is None:
            raise FileNotFoundError(img_path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        s = self.cfg.data.audio_size
        if img.shape[:2] != (s, s):
            img = cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
        return img

    def assemble(self, name: str, frames: Optional[np.ndarray] = None,
                 wave: Optional[np.ndarray] = None):
        """Build (feats, label, name) for one clip. `frames`/`wave` given
        (e.g. by the native ingest loader) are used as-is; None means decode
        on the host here. Single source of truth for modality keys, bucket
        padding, and the JPEG parity path — __getitem__ and _IngestLoader
        both route through it, so the loaders cannot drift apart."""
        cfg = self.cfg
        path = os.path.join(self.dataset_path, name)
        modality = cfg.data.modality
        feats: Dict[str, np.ndarray] = {}
        buckets = [
            int(s * cfg.data.wave_sample_rate) for s in cfg.data.wave_seconds_buckets
        ]
        if modality in ("video", "video_swin", "fused"):
            if frames is None:
                frames = extract_frames(
                    path, cfg.data.num_frames, cfg.data.frame_size,
                    method=cfg.data.decode_method,
                )
            feats["video"] = frames
        need_audio_img = modality in ("audio", "fused") and cfg.data.audio_from_images
        if need_audio_img:
            feats["audio_image"] = self._load_audio_image(name)
        if modality in ("audio", "paudio", "fused"):
            if modality == "audio" and need_audio_img:
                pass  # JPEG parity path covers the audio branch
            else:
                if wave is None:
                    wave = extract_wav(path, cfg.data.wave_sample_rate)
                padded = pad_to_bucket(wave, buckets)
                valid = np.int32(min(len(wave), len(padded)))
                if modality in ("audio", "fused") and not need_audio_img:
                    feats["audio_wave"] = padded
                    feats["audio_len"] = valid
                if modality in ("paudio", "fused"):
                    feats["paudio_wave"] = padded
                    feats["paudio_len"] = valid
        if name not in self.labels and self.split in ("train", "val"):
            # the reference KeyErrors here (data_process.py:143); a silent
            # NaN label poisons the loss while accuracy stays finite-looking
            # (NaN >= 0.5 is False), which is far harder to diagnose
            raise KeyError(
                f"no label for {name!r} in {self.split} split — expected it in "
                f"{os.path.join(self.cfg.data.data_root, self.split + '_label.txt')} "
                "(label files live at the data root, not under phase1/)"
            )
        label = np.float32(self.labels.get(name, np.nan))
        return feats, label, name

    def __getitem__(self, index: int):
        return self.assemble(self.names[index])


class _Loader:
    """Threaded batch loader with static shapes. `decode_workers` threads run
    __getitem__ concurrently (cv2/ffmpeg release the GIL during decode)."""

    def __init__(self, dataset: DeepFakeDataset, batch_size: int, shuffle: bool,
                 num_workers: int, seed: int = 0, drop_last: bool = False):
        self.ds = dataset
        self.batch = batch_size
        self.shuffle = shuffle
        self.workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self):
        n = len(self.ds)
        return n // self.batch if self.drop_last else (n + self.batch - 1) // self.batch

    def __iter__(self) -> Iterator:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
            self.epoch += 1
        for s in range(0, len(order), self.batch):
            idx = order[s:s + self.batch]
            if self.drop_last and len(idx) < self.batch:
                break
            samples: List = [None] * len(idx)

            def work(j, i):
                samples[j] = self.ds[int(i)]

            if self.workers > 1 and len(idx) > 1:
                threads = [
                    threading.Thread(target=work, args=(j, i))
                    for j, i in enumerate(idx)
                ]
                [t.start() for t in threads]
                [t.join() for t in threads]
            else:
                for j, i in enumerate(idx):
                    work(j, i)
            yield collate(samples)


class _IngestLoader(_Loader):
    """_Loader backed by the native C++ ingest service (ingest.cpp): video
    decode + audio demux run in a worker-pool ring buffer, and the NEXT
    batches' paths are already submitted while the current batch is being
    consumed — decode overlaps device compute across batch boundaries (the
    reference's CudaDataLoader capability, data/cuda_dataloader.py:5-74,
    without a Python thread per sample). Completion order is arbitrary;
    results re-assemble by tag so batch composition and order match _Loader
    exactly. Audio falls back to the host path (sidecar .wav/.npy) when the
    container has no audio track."""

    AHEAD_BATCHES = 2

    def _service(self):
        from deepfake_tpu import native

        cfg = self.ds.cfg
        modality = cfg.data.modality
        want_video = modality in ("video", "video_swin", "fused")
        need_audio_img = (
            modality in ("audio", "fused") and cfg.data.audio_from_images
        )
        want_audio = (
            modality in ("paudio", "fused")
            or (modality == "audio" and not need_audio_img)
        )
        buckets = [
            int(s * cfg.data.wave_sample_rate) for s in cfg.data.wave_seconds_buckets
        ]
        slots = max(2 * self.batch, 2 * self.workers)
        return (
            native.IngestService(
                workers=self.workers,
                slots=slots,
                num_frames=cfg.data.num_frames,
                size=cfg.data.frame_size,
                sample_rate=cfg.data.wave_sample_rate,
                max_samples=max(buckets),
                want_video=want_video,
                want_audio=want_audio,
            ),
            want_video,
            want_audio,
            need_audio_img,
            buckets,
        )

    def _sample(self, i, frames, audio, alen, want_video, want_audio):
        """Choose what the native service provided and hand assembly to the
        dataset (single source of truth): frames=None means the native decode
        failed and the host decodes instead; sidecar PCM wins over the native
        demux output (the offline pass exists so the hot loop never demuxes —
        and extract_wav prefers it, keeping the loaders drop-in equivalent)."""
        from deepfake_tpu.data.audio_io import has_sidecar

        name = self.ds.names[int(i)]
        path = os.path.join(self.ds.dataset_path, name)
        wave = None
        if want_audio and alen > 0 and not has_sidecar(path):
            wave = audio[:alen]
        return self.ds.assemble(name, frames=frames if want_video else None,
                                wave=wave)

    def __iter__(self) -> Iterator:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
            self.epoch += 1
        svc, want_video, want_audio, need_audio_img, buckets = self._service()
        try:
            ahead = self.batch * self.AHEAD_BATCHES
            submitted = 0

            from deepfake_tpu.data.audio_io import has_sidecar

            def submit_upto(k):
                nonlocal submitted
                while submitted < min(k, len(order)):
                    path = os.path.join(
                        self.ds.dataset_path, self.ds.names[int(order[submitted])]
                    )
                    # sidecar PCM wins over the native demux (see _sample) —
                    # don't pay a libav demux whose output gets discarded
                    svc.submit(path, submitted,
                               want_audio=want_audio and not has_sidecar(path))
                    submitted += 1

            results: Dict[int, Tuple] = {}
            for s in range(0, len(order), self.batch):
                idx = order[s:s + self.batch]
                if self.drop_last and len(idx) < self.batch:
                    break
                # keep the ring buffer fed AHEAD_BATCHES past this batch
                submit_upto(s + len(idx) + ahead)
                while any(t not in results for t in range(s, s + len(idx))):
                    r = svc.next()
                    if r is None:
                        raise RuntimeError("ingest service drained early")
                    tag, frames, audio, alen = r
                    results[tag] = (frames, audio, alen)
                samples = [
                    self._sample(order[t], *results.pop(t), want_video,
                                 want_audio)
                    for t in range(s, s + len(idx))
                ]
                yield collate(samples)
        finally:
            svc.close()


def collate(samples: Sequence) -> Tuple[Dict[str, np.ndarray], np.ndarray, List[str]]:
    """Stack feature dicts (replaces the reference's three collate variants,
    src/utils.py:121-165). Waveforms are bucket-padded per sample; within a
    batch they pad up to the largest bucket present, so batch shapes stay in
    the small static-bucket set (bounded XLA compilations)."""
    feats, labels, names = zip(*samples)
    out: Dict[str, np.ndarray] = {}
    for k in feats[0]:
        vals = [f[k] for f in feats]
        if k.endswith("_wave"):
            m = max(v.shape[0] for v in vals)
            vals = [
                np.pad(v, (0, m - v.shape[0])) if v.shape[0] < m else v for v in vals
            ]
        out[k] = np.stack(vals)
    return out, np.asarray(labels, np.float32), list(names)


class DeepFakeDataModule:
    """Facade producing train/val/test loaders
    (reference: data/data_process.py:179-235 DeepFakeSet)."""

    def __init__(self, cfg: Config, prediction_csv: str = "./prediction.csv"):
        self.cfg = cfg
        self.prediction_csv = prediction_csv
        self.trainset: Optional[DeepFakeDataset] = None
        self.valset: Optional[DeepFakeDataset] = None
        self.testset: Optional[DeepFakeDataset] = None

    def setup(self, stage: Optional[str] = None):
        if stage in (None, "fit"):
            self.trainset = DeepFakeDataset(self.cfg, "train")
            self.valset = DeepFakeDataset(self.cfg, "val")
        if stage in (None, "test"):
            self.testset = DeepFakeDataset(self.cfg, "test", self.prediction_csv)
        return self

    def _loader_cls(self):
        from deepfake_tpu import native

        if self.cfg.data.modality == "audio" and self.cfg.data.audio_from_images:
            return _Loader  # pure host-JPEG path: nothing for ingest to decode
        if self.cfg.data.use_native_ingest and native.available():
            return _IngestLoader
        return _Loader

    def train_dataloader(self):
        # One yield = one OPTIMIZER step's rows: micro-batch (batch_size) x
        # accum_step, matching the reference's effective batch where the
        # DataLoader yields micro-batches and the optimizer steps every
        # accum_step iterations (reference: src/trainer.py:286-297). The
        # Trainer's lax.scan splits the yield back into accum micro-batches.
        step_rows = self.cfg.optim.batch_size * max(1, self.cfg.optim.accum_step)
        return self._loader_cls()(self.trainset, step_rows, True,
                                  self.cfg.data.num_workers, self.cfg.random_seed,
                                  drop_last=True)

    def val_dataloader(self):
        return self._loader_cls()(self.valset, self.cfg.optim.batch_size, False,
                                  self.cfg.data.num_workers)

    def test_dataloader(self):
        return self._loader_cls()(self.testset, self.cfg.optim.batch_size, False,
                                  self.cfg.data.num_workers)
