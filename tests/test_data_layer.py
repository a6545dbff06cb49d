"""Data-layer tests: on-device mel DSP vs an independent numpy reference,
video decode on synthetic mp4s, dataset discovery/labels/resume, bucketing,
augmentation invariants, chunking, prefetcher, and the submission controller's
crash-resume round trip."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_tpu.config import Config


# ---------------------------------------------------------------- mel DSP

def _numpy_mel_reference(y, sr, n_fft, hop, n_mels):
    """Independent numpy STFT+mel (different code path from ops.mel)."""
    from deepfake_tpu.ops.mel import hann_window, mel_filterbank

    pad = n_fft // 2
    yp = np.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (len(yp) - n_fft) // hop
    win = hann_window(n_fft)
    S = np.empty((n_fft // 2 + 1, n_frames), np.float64)
    for t in range(n_frames):
        seg = yp[t * hop: t * hop + n_fft] * win
        S[:, t] = np.abs(np.fft.rfft(seg)) ** 2
    return mel_filterbank(sr, n_fft, n_mels).astype(np.float64) @ S


def test_mel_power_matches_numpy():
    from deepfake_tpu.ops.mel import mel_power

    rng = np.random.default_rng(0)
    y = rng.standard_normal(22050).astype(np.float32)
    got = np.asarray(mel_power(jnp.asarray(y)))
    want = _numpy_mel_reference(y, 22050, 2048, 512, 128)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_mel_filterbank_properties():
    from deepfake_tpu.ops.mel import mel_filterbank, mel_frequencies

    fb = mel_filterbank(22050, 2048, 128)
    assert fb.shape == (128, 1025)
    assert (fb >= 0).all()
    # slaney scale: linear below 1 kHz
    f = mel_frequencies(5, 0.0, 1000.0)
    np.testing.assert_allclose(np.diff(f), np.diff(f)[0], rtol=1e-6)


def test_mel_image_shape_and_range():
    from deepfake_tpu.ops.mel import mel_image

    y = jnp.asarray(np.sin(np.linspace(0, 800 * np.pi, 44100)).astype(np.float32))
    img = mel_image(y, normalize=False)
    assert img.shape == (224, 224, 3)
    v = np.asarray(img)
    assert v.min() >= 0.0 and v.max() <= 1.0
    assert np.allclose(v[..., 0], v[..., 1])  # grayscale replicated


def test_mel_image_masked_matches_unpadded():
    """mel over a padded waveform with valid-length masking == mel over the
    exact-length waveform."""
    from deepfake_tpu.data.pipeline import mel_image_masked
    from deepfake_tpu.ops.mel import mel_image

    rng = np.random.default_rng(1)
    n = 20000
    y = rng.standard_normal(n).astype(np.float32)
    padded = np.zeros(32000, np.float32)
    padded[:n] = y
    got = np.asarray(
        mel_image_masked(jnp.asarray(padded)[None], jnp.asarray([n]))
    )[0]
    want = np.asarray(mel_image(jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=0.08, rtol=0.05)
    # and the bulk agrees tightly (interpolation edges differ by design)
    assert np.mean(np.abs(got - want)) < 5e-3


def test_resample_matches_scipy():
    """On-device polyphase resampler == scipy.signal.resample_poly (whose
    kaiser filter design it reuses) — the reference's librosa.load 22.05 kHz
    stage (src/utils.py:70) stand-in."""
    from scipy.signal import resample_poly

    from deepfake_tpu.ops.resample import resample, resampled_length

    rng = np.random.default_rng(3)
    for T, si, so in [(16000, 16000, 22050), (7001, 22050, 16000)]:
        x = rng.standard_normal(T).astype(np.float32)
        g = np.gcd(si, so)
        want = resample_poly(x.astype(np.float64), so // g, si // g)
        got = np.asarray(resample(jnp.asarray(x), si, so))
        assert got.shape == want.shape
        assert int(resampled_length(T, si, so)) == len(want)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_mel_image_masked_resamples_wave_sr():
    """wave_sr=16000 + sr=22050 == resampling first, then the exact-length
    mel — the reference's 16 kHz PCM -> librosa.load(22050) -> mel chain."""
    from scipy.signal import resample_poly

    from deepfake_tpu.data.pipeline import mel_image_masked
    from deepfake_tpu.ops.mel import mel_image

    rng = np.random.default_rng(4)
    n = 14000
    y = rng.standard_normal(n).astype(np.float32)
    padded = np.zeros(16000, np.float32)
    padded[:n] = y
    got = np.asarray(
        mel_image_masked(jnp.asarray(padded)[None], jnp.asarray([n]),
                         sr=22050, wave_sr=16000)
    )[0]
    y_rs = resample_poly(
        np.pad(y, (0, 16000 - n)).astype(np.float64), 441, 320
    )[: int(np.ceil(n * 441 / 320))].astype(np.float32)
    want = np.asarray(mel_image(jnp.asarray(y_rs), sr=22050))
    assert np.mean(np.abs(got - want)) < 5e-3


def test_audio_preprocess_jpeg_writer(fake_dataset):
    """--format jpeg writes the reference AudioImgs layout and the dataset's
    JPEG parity path consumes it (reference: data_process.py:70-97,150-153)."""
    import audio_preprocess as ap

    from deepfake_tpu.data.dataset import DeepFakeDataset

    ap.main(["--data_root", str(fake_dataset), "--split", "train",
             "--format", "jpeg"])
    img_dir = os.path.join(str(fake_dataset), "trainAudioImgs")
    files = sorted(os.listdir(img_dir))
    assert files == [f"trainset_{i}.jpg" for i in range(4)]

    cfg = _cfg(fake_dataset, "audio")
    cfg.data.audio_from_images = True
    ds = DeepFakeDataset(cfg, "train")
    feats, _label, _name = ds[0]
    img = feats["audio_image"]
    assert img.shape == (cfg.data.audio_size, cfg.data.audio_size, 3)
    assert img.dtype == np.uint8
    assert img.std() > 1.0  # a real spectrogram, not a constant plane


def test_wave_normalize_modes():
    from deepfake_tpu.data.pipeline import hf_wave_normalize, masked_wave_normalize
    from deepfake_tpu.models.wav2vec2 import wav2vec2_process

    rng = np.random.default_rng(2)
    raw = [rng.standard_normal(5000).astype(np.float32) * 2 + 1,
           rng.standard_normal(8000).astype(np.float32)]
    padded = np.zeros((2, 8000), np.float32)
    padded[0, :5000] = raw[0]
    padded[1] = raw[1]

    # hf mode == Wav2Vec2Processor (stats over the padded row)
    want = wav2vec2_process(raw)
    got = np.asarray(hf_wave_normalize(jnp.asarray(padded)))
    np.testing.assert_allclose(got, want, atol=1e-4)

    # masked mode: valid prefix is standardised, padding stays zero
    m = np.asarray(
        masked_wave_normalize(jnp.asarray(padded), jnp.asarray([5000, 8000]))
    )
    assert abs(m[0, :5000].mean()) < 1e-4 and abs(m[0, :5000].std() - 1) < 1e-3
    assert np.all(m[0, 5000:] == 0)


# ------------------------------------------------------------ dataset layer

@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    """Synthetic multi-ffdv layout: mp4 videos (cv2-written) + wav sidecars."""
    import cv2
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("data_root")
    (root / "phase1" / "trainset").mkdir(parents=True)
    (root / "phase1" / "valset").mkdir(parents=True)
    (root / "phase2" / "testset1seen").mkdir(parents=True)

    rng = np.random.default_rng(0)

    def write_video(path, n_frames=12, value=None):
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
        for i in range(n_frames):
            frame = rng.integers(0, 255, (64, 64, 3), np.uint8) if value is None \
                else np.full((64, 64, 3), value, np.uint8)
            w.write(frame)
        w.release()
        wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        wavfile.write(str(path)[:-4] + ".wav", 16000, (wav * 32767).astype(np.int16))

    labels = {}
    for split, n in (("trainset", 4), ("valset", 2)):
        for i in range(n):
            name = f"{split}_{i}.mp4"
            write_video(root / "phase1" / split / name)
            labels[name] = i % 2
    with open(root / "train_label.txt", "w") as f:
        f.write("video_name,target\n")
        for k, v in labels.items():
            if k.startswith("trainset"):
                f.write(f"{k},{v}\n")
    with open(root / "val_label.txt", "w") as f:
        f.write("video_name,target\n")
        for k, v in labels.items():
            if k.startswith("valset"):
                f.write(f"{k},{v}\n")
    test_names = []
    for i in range(3):
        name = f"test_{i}.mp4"
        write_video(root / "phase2" / "testset1seen" / name)
        test_names.append(name)
    with open(root / "phase2" / "prediction.txt.csv", "w") as f:
        f.write("video_name,y_pred\n")
        for n in test_names:
            f.write(f"{n},0.5\n")
    return root


def _cfg(root, modality="video"):
    cfg = Config()
    cfg.data.data_root = str(root)
    cfg.data.modality = modality
    cfg.data.num_frames = 4
    cfg.data.frame_size = 64
    cfg.data.audio_size = 56
    cfg.data.wave_seconds_buckets = (0.5, 1.0)
    cfg.optim.batch_size = 2
    cfg.optim.accum_step = 1  # train loader yields batch_size*accum rows
    return cfg


def test_dataset_discovery_and_labels(fake_dataset):
    from deepfake_tpu.data.dataset import DeepFakeDataset

    ds = DeepFakeDataset(_cfg(fake_dataset), "train")
    assert len(ds) == 4
    feats, label, name = ds[0]
    assert feats["video"].shape == (4, 64, 64, 3)
    assert feats["video"].dtype == np.uint8
    assert label in (0.0, 1.0)


def test_missing_train_label_raises(fake_dataset, tmp_path):
    """A train-split video with no row in train_label.txt must raise, not
    yield a silent NaN label (the reference KeyErrors, data_process.py:143;
    a NaN label poisons the loss while accuracy stays finite-looking)."""
    import shutil

    from deepfake_tpu.data.dataset import DeepFakeDataset

    root = tmp_path / "data_root"
    shutil.copytree(fake_dataset, root)
    # common mistake: label files under phase1/ instead of the data root
    (root / "phase1" / "train_label.txt").write_text(
        (root / "train_label.txt").read_text()
    )
    (root / "train_label.txt").unlink()
    ds = DeepFakeDataset(_cfg(root), "train")
    with pytest.raises(KeyError, match="train_label.txt"):
        ds[0]


def test_fused_sample_and_collate(fake_dataset):
    from deepfake_tpu.data.dataset import DeepFakeDataModule

    cfg = _cfg(fake_dataset, "fused")
    dm = DeepFakeDataModule(cfg).setup("fit")
    loader = dm.train_dataloader()
    feats, labels, names = next(iter(loader))
    assert feats["video"].shape == (2, 4, 64, 64, 3)
    assert feats["audio_wave"].shape[0] == 2
    assert feats["paudio_len"].shape == (2,)
    assert labels.shape == (2,)


def test_test_resume_skips_predicted(fake_dataset, tmp_path):
    from deepfake_tpu.data.dataset import DeepFakeDataset

    pred = tmp_path / "prediction.csv"
    pred.write_text("test_0.mp4,0.7\n")
    ds = DeepFakeDataset(_cfg(fake_dataset), "test", str(pred))
    assert "test_0.mp4" not in ds.names
    assert len(ds.names) == 2


def test_model_feed_loader_video(fake_dataset):
    from deepfake_tpu.data.dataset import DeepFakeDataModule
    from deepfake_tpu.data.pipeline import ModelFeedLoader

    cfg = _cfg(fake_dataset, "video")
    dm = DeepFakeDataModule(cfg).setup("fit")
    feed = ModelFeedLoader(dm.train_dataloader(), cfg, train=True)
    inputs, labels = next(iter(feed))
    assert inputs.shape == (2, 4, 64, 64, 3)
    assert inputs.dtype == jnp.float32
    assert labels.shape == (2,)


def test_submit_resume_roundtrip(fake_dataset, tmp_path, monkeypatch):
    """Streamed prediction.csv + resume: second run scores only the rest
    (reference behaviour: src/submit.py:87-111 + data_process.py:42-50)."""
    from deepfake_tpu.data.dataset import DeepFakeDataModule
    from deepfake_tpu.models.nextvlad import InceptionVideoClassifier
    from deepfake_tpu.train.submit import SubmitCtl
    from deepfake_tpu.utils.logging import Logger

    cfg = _cfg(fake_dataset, "video")
    cfg.data.frame_size = 96  # IRv2 minimum
    pred = str(tmp_path / "prediction.csv")

    model = InceptionVideoClassifier(num_classes=1, drop_rate=0.0, classify_drop=0.0)
    dm = DeepFakeDataModule(cfg, prediction_csv=pred).setup("test")
    ctl = SubmitCtl(model, cfg, dm, logger=Logger(None), prediction_csv=pred)
    r1 = ctl.submit()
    assert len(r1) == 3

    # resume: everything scored -> nothing left
    dm2 = DeepFakeDataModule(cfg, prediction_csv=pred).setup("test")
    assert len(dm2.testset) == 0

    ctl.write_full(r1, str(tmp_path / "prediction_full.csv"))
    lines = (tmp_path / "prediction_full.csv").read_text().strip().split("\n")
    assert lines[0] == "video_name,y_pred"
    assert len(lines) == 4


def test_chunking():
    from deepfake_tpu.data.chunking import (
        aggregate_window_scores,
        chunk_frames,
        sliding_windows,
    )

    assert sliding_windows(100, 32, 16) == [(0, 32), (16, 32), (32, 32), (48, 32),
                                            (64, 32), (68, 32)]
    assert sliding_windows(10, 32, 16) == [(0, 10)]
    frames = np.arange(10)[:, None, None, None] * np.ones((1, 4, 4, 3))
    chunks = chunk_frames(frames.astype(np.uint8), 4, 2)
    assert chunks.shape == (4, 4, 4, 4, 3)
    assert chunks[0, 0, 0, 0, 0] == 0 and chunks[1, 0, 0, 0, 0] == 2
    assert aggregate_window_scores([0.2, 0.4, 0.9], "max") == pytest.approx(0.9)
    assert aggregate_window_scores([0.2, 0.4, 0.9]) == pytest.approx(0.5)


def test_reshard_directory(tmp_path):
    from deepfake_tpu.data.chunking import iter_sharded_files, reshard_directory

    d = tmp_path / "trainset"
    d.mkdir()
    for i in range(7):
        (d / f"v{i}.mp4").write_text("x")
    shards = reshard_directory(str(d), files_per_shard=3)
    assert len(shards) == 3
    files = list(iter_sharded_files(str(d)))
    assert len(files) == 7
    assert all("sub_dir" in f for f in files)


def test_augmentation_invariants():
    from deepfake_tpu.ops.image import preprocess_clip_batch, rotate_nearest

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 3, 32, 32, 3), np.uint8)
    eval_out = preprocess_clip_batch(jax.random.PRNGKey(0), jnp.asarray(frames),
                                     train=False)
    # eval is deterministic normalisation only
    manual = (frames.astype(np.float32) / 255.0 - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    np.testing.assert_allclose(np.asarray(eval_out), manual, atol=1e-5)

    # train differs across keys, same under the same key
    a = preprocess_clip_batch(jax.random.PRNGKey(1), jnp.asarray(frames), train=True)
    b = preprocess_clip_batch(jax.random.PRNGKey(1), jnp.asarray(frames), train=True)
    c = preprocess_clip_batch(jax.random.PRNGKey(2), jnp.asarray(frames), train=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))

    # rotation by 0 degrees is identity
    img = jnp.asarray(rng.standard_normal((16, 16, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(rotate_nearest(img, jnp.float32(0.0))), np.asarray(img), atol=1e-6
    )


def test_submit_sharded_matches_single_device(fake_dataset, tmp_path):
    """Sharded submission == single-device submission, same prediction.csv
    rows in the same order (VERDICT round 1, next #4)."""
    import jax

    from deepfake_tpu.data.dataset import DeepFakeDataModule
    from deepfake_tpu.models.nextvlad import InceptionVideoClassifier
    from deepfake_tpu.parallel.mesh import make_mesh
    from deepfake_tpu.train.submit import SubmitCtl
    from deepfake_tpu.utils.logging import Logger

    cfg = _cfg(fake_dataset, "video")
    cfg.data.frame_size = 96  # IRv2 minimum
    model = InceptionVideoClassifier(num_classes=1, drop_rate=0.0, classify_drop=0.0)

    pred1 = str(tmp_path / "pred_1dev.csv")
    dm1 = DeepFakeDataModule(cfg, prediction_csv=pred1).setup("test")
    ctl1 = SubmitCtl(
        model, cfg, dm1, logger=Logger(None), prediction_csv=pred1,
        mesh=make_mesh(data=1, model=1, devices=jax.devices()[:1]),
    )
    r1 = ctl1.submit()

    predN = str(tmp_path / "pred_8dev.csv")
    dmN = DeepFakeDataModule(cfg, prediction_csv=predN).setup("test")
    ctlN = SubmitCtl(
        model, cfg, dmN, logger=Logger(None), prediction_csv=predN,
        variables=ctl1.variables,  # same weights, no second init
    )
    rN = ctlN.submit()

    assert list(rN.keys()) == list(r1.keys())  # row order preserved
    for name in r1:
        np.testing.assert_allclose(rN[name], r1[name], rtol=1e-5, atol=1e-6)
    rows1 = [l.split(",")[0] for l in open(pred1)]
    rowsN = [l.split(",")[0] for l in open(predN)]
    assert rows1 == rowsN


def test_submit_chunked_long_video(fake_dataset, tmp_path):
    """Long-video sliding-window scoring (BASELINE config #4)."""
    from deepfake_tpu.data.dataset import DeepFakeDataModule
    from deepfake_tpu.models.nextvlad import InceptionVideoClassifier
    from deepfake_tpu.train.submit import SubmitCtl
    from deepfake_tpu.utils.logging import Logger

    cfg = _cfg(fake_dataset, "video")
    cfg.data.frame_size = 96
    cfg.data.num_frames = 4
    cfg.data.chunk_frames = 4
    cfg.data.chunk_stride = 4
    pred = str(tmp_path / "prediction.csv")

    model = InceptionVideoClassifier(num_classes=1, drop_rate=0.0, classify_drop=0.0)
    dm = DeepFakeDataModule(cfg, prediction_csv=pred).setup("test")
    # limit to one clip for test speed
    dm.testset.names = dm.testset.names[:1]
    ctl = SubmitCtl(model, cfg, dm, logger=Logger(None), prediction_csv=pred)
    result = ctl.submit_chunked()
    assert len(result) == 1
    score = next(iter(result.values()))
    assert 0.0 <= score <= 1.0


def test_audio_from_images_parity_path(fake_dataset):
    """JPEG parity path (reference: data_process.py:70-97,150-153)."""
    import cv2

    cfg = _cfg(fake_dataset, "audio")
    cfg.data.audio_from_images = True
    img_dir = fake_dataset / "trainAudioImgs"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(4):
        cv2.imwrite(str(img_dir / f"trainset_{i}.jpg"),
                    rng.integers(0, 255, (56, 56, 3), np.uint8))

    from deepfake_tpu.data.dataset import DeepFakeDataset
    from deepfake_tpu.data.pipeline import FeatureAssembler

    ds = DeepFakeDataset(cfg, "train")
    feats, label, name = ds[0]
    assert feats["audio_image"].shape == (56, 56, 3)
    inputs, labels = FeatureAssembler(cfg, train=False)(
        {"audio_image": feats["audio_image"][None]}, np.asarray([label])
    )
    assert inputs.shape == (1, 56, 56, 3)


def test_gemm_dft_matches_fft():
    """GEMM-native windowed DFT (MXU path) == rFFT within fp32 noise."""
    from deepfake_tpu.ops.mel import mel_power

    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.standard_normal(22050).astype(np.float32))
    a = np.asarray(mel_power(y, method="gemm"))
    b = np.asarray(mel_power(y, method="fft"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_overlong_wave_truncation(fake_dataset):
    """Clips longer than the largest static bucket are truncated with a
    once-per-process warning (documented parity bound vs the reference's
    uncapped padding='longest', src/trainer.py:251); a larger tail bucket
    restores coverage. See PARITY.md."""
    import warnings

    from deepfake_tpu.data import audio_io
    from deepfake_tpu.data.dataset import DeepFakeDataset

    y = np.arange(24000, dtype=np.float32)
    audio_io._warned_truncate = False
    with pytest.warns(UserWarning, match="TRUNCATING"):
        out = audio_io.pad_to_bucket(y, [8000, 16000])
    assert out.shape == (16000,)
    np.testing.assert_array_equal(out, y[:16000])

    # a configurable tail bucket covers the clip: padded, no warning
    audio_io._warned_truncate = False
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out2 = audio_io.pad_to_bucket(y, [8000, 16000, 32000])
    assert out2.shape == (32000,)
    np.testing.assert_array_equal(out2[:24000], y)
    assert np.all(out2[24000:] == 0)

    # end-to-end: a real clip longer than the largest bucket flows through
    # the dataset truncated to the bucket, with paudio_len == bucket size
    cfg = _cfg(fake_dataset, "paudio")
    cfg.data.wave_seconds_buckets = (0.25, 0.5)  # sidecar wavs are 1.0 s
    ds = DeepFakeDataset(cfg, "train")
    audio_io._warned_truncate = False
    with pytest.warns(UserWarning, match="TRUNCATING"):
        feats, _label, _name = ds[0]
    assert feats["paudio_wave"].shape == (8000,)
    assert int(feats["paudio_len"]) == 8000


def test_force_generate_lazy_audio_images(fake_dataset):
    """Missing AudioImgs are generated lazily at dataset init, and
    cfg.data.force_generate regenerates existing ones (reference:
    data/data_process.py:70-97, config.py:10 — the flag was previously
    parsed but consumed nowhere)."""
    import cv2

    from deepfake_tpu.data.dataset import DeepFakeDataset

    cfg = _cfg(fake_dataset, "audio")
    cfg.data.audio_from_images = True
    img_dir = fake_dataset / "ValAudioImgs"
    if img_dir.exists():
        for f in img_dir.iterdir():
            f.unlink()

    # init generates the missing JPEGs for the split
    ds = DeepFakeDataset(cfg, "val")
    files = sorted(os.listdir(img_dir))
    assert files == ["valset_0.jpg", "valset_1.jpg"]
    feats, _l, _n = ds[0]
    assert feats["audio_image"].shape == (56, 56, 3)

    # overwrite one with a sentinel; without force_generate it is kept
    sentinel = np.zeros((56, 56, 3), np.uint8)
    cv2.imwrite(str(img_dir / "valset_0.jpg"), sentinel)
    DeepFakeDataset(cfg, "val")
    kept = cv2.imread(str(img_dir / "valset_0.jpg"))
    assert kept.std() < 1e-6  # sentinel untouched

    # with force_generate the sentinel is regenerated from audio
    cfg.data.force_generate = True
    DeepFakeDataset(cfg, "val")
    regen = cv2.imread(str(img_dir / "valset_0.jpg"))
    assert regen.std() > 1.0  # a real spectrogram again


def test_submit_chunked_video_swin_tuple_output(fake_dataset, tmp_path):
    """submit/chunked scoring through a model that returns (prob, feat) —
    VideoClassifier, the long-video config-4 model — must consume the
    probability (regression: the tuple crashed score_frames)."""
    from deepfake_tpu.data.dataset import DeepFakeDataModule
    from deepfake_tpu.models.swin3d import VideoClassifier
    from deepfake_tpu.train.submit import SubmitCtl
    from deepfake_tpu.utils.logging import Logger

    cfg = _cfg(fake_dataset, "video_swin")
    cfg.data.frame_size = 64
    cfg.data.num_frames = 4
    cfg.data.chunk_frames = 4
    cfg.data.chunk_stride = 4
    pred = str(tmp_path / "prediction.csv")

    model = VideoClassifier(
        num_classes=1, embed_dim=16, depths=(1, 1), num_heads=(2, 4),
        window_size=(2, 4, 4), classify_drop=0.0,
    )
    dm = DeepFakeDataModule(cfg, prediction_csv=pred).setup("test")
    dm.testset.names = dm.testset.names[:2]
    ctl = SubmitCtl(model, cfg, dm, logger=Logger(None), prediction_csv=pred)
    result = ctl.submit_chunked(decode_ahead=2)
    assert len(result) == 2
    assert all(0.0 <= s <= 1.0 for s in result.values())
