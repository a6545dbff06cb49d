"""Inference / submission entry point (reference: test.py:28-74).

    python test.py --preset fused --data_root /data/multi-ffdv --Resume \
        --fused_ckpt_path checkpoints/...

Runs SubmitCtl over phase2/testset1seen, streaming prediction.csv
(crash-resumable) and writing prediction_full.csv (with the header the
reference intended; its own version crashes on an undefined variable at
test.py:61).
"""

from __future__ import annotations

import os
import signal
import sys


def main(argv=None):
    from deepfake_tpu.config import get_config
    from deepfake_tpu.data.dataset import DeepFakeDataModule
    from deepfake_tpu.models.registry import build_model
    from deepfake_tpu.train.submit import SubmitCtl
    from deepfake_tpu.utils.logging import Logger
    from deepfake_tpu.utils.seeding import seed_everything

    cfg = get_config(argv)
    logger = Logger(cfg.log.log_dir)
    logger(f"processId: {os.getpid()}")
    logger(cfg.to_json())

    def handle_exit(*_a):
        print("Program Killed by signal")
        sys.exit(0)

    signal.signal(signal.SIGTERM, handle_exit)
    signal.signal(signal.SIGINT, handle_exit)
    seed_everything(cfg.random_seed)

    model = build_model(cfg)
    dm = DeepFakeDataModule(cfg).setup("test")
    ctl = SubmitCtl(model, cfg, dm, logger=logger)

    if cfg.model.resume:
        ckpt = {
            "audio": cfg.model.audio_ckpt_path,
            "video": cfg.model.video_ckpt_path,
            "paudio": cfg.model.paudio_ckpt_path,
            "fused": cfg.model.fused_ckpt_path,
        }.get(cfg.data.modality)
        if ckpt:
            if ckpt.endswith(".pth") or ckpt.endswith(".safetensors"):
                ctl.load_reference_pth(ckpt)
            else:
                ctl.load_checkpoint(ckpt)

    result = ctl.submit()
    ctl.write_full(result)


if __name__ == "__main__":
    main()
