"""Integration test: the real train.py CLI on a tiny synthetic dataset
(video modality, one epoch) — entry point, config, data module, feeds,
trainer, checkpointing all wired together."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path, monkeypatch):
    import cv2

    root = tmp_path / "data"
    (root / "phase1" / "trainset").mkdir(parents=True)
    (root / "phase1" / "valset").mkdir(parents=True)
    rng = np.random.default_rng(0)

    def write_video(path):
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 96))
        for _ in range(6):
            w.write(rng.integers(0, 255, (96, 96, 3), np.uint8))
        w.release()

    rows_train, rows_val = [], []
    for i in range(4):
        name = f"t{i}.mp4"
        write_video(root / "phase1" / "trainset" / name)
        rows_train.append(f"{name},{i % 2}")
    for i in range(2):
        name = f"v{i}.mp4"
        write_video(root / "phase1" / "valset" / name)
        rows_val.append(f"{name},{i % 2}")
    (root / "train_label.txt").write_text("video_name,target\n" + "\n".join(rows_train))
    (root / "val_label.txt").write_text("video_name,target\n" + "\n".join(rows_val))

    monkeypatch.chdir(tmp_path)
    os.makedirs("checkpoints", exist_ok=True)

    # load OUR train.py explicitly (the reference's train.py shares the name)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "df_train_entry", "/root/repo/train.py"
    )
    train_entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_entry)

    train_entry.main([
        "--modality", "video",
        "--data_root", str(root),
        "-b", "2", "--accum_step", "1", "-e", "1",
        "--num_frames", "2",
        "--set", "data.frame_size=96",
        "--set", "log.model_save=1000000",
        "--set", "model.swin_drop=0.0",
        "--log_dir", str(tmp_path / "train.log"),
    ])
    log = (tmp_path / "train.log").read_text()
    assert "Train Loss Avg" in log or "Phase:val" in log
