"""Training entry point (reference: train.py:29-75).

    python train.py --preset fused --data_root /data/multi-ffdv [...]

Builds the configured model, the data module, and the Trainer; runs training
(or eval-only with --val_model). SIGTERM/SIGINT are handled so data workers
stop cleanly (reference: train.py:23-27,71-73).
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import sys


def main(argv=None):
    from deepfake_tpu.config import get_config
    from deepfake_tpu.data.dataset import DeepFakeDataModule
    from deepfake_tpu.data.pipeline import ModelFeedLoader
    from deepfake_tpu.models.registry import build_model
    from deepfake_tpu.train.trainer import Trainer
    from deepfake_tpu.utils.logging import Logger
    from deepfake_tpu.utils.seeding import seed_everything

    cfg = get_config(argv)
    if cfg.parallel.multihost:
        import jax

        jax.distributed.initialize()  # mesh spans hosts over DCN
    logger = Logger(cfg.log.log_dir)
    logger(f"processId: {os.getpid()}")
    logger(f"parent processId: {os.getppid()}")
    logger(cfg.to_json())

    def handle_exit(*_a):
        print("Program Killed by signal")
        sys.exit(0)

    atexit.register(lambda: None)
    signal.signal(signal.SIGTERM, handle_exit)
    signal.signal(signal.SIGINT, handle_exit)
    # must precede the first PRNGKey creation (seed_everything below)
    from deepfake_tpu.utils.seeding import apply_prng_impl

    apply_prng_impl(cfg.parallel.prng_impl)
    rng = seed_everything(cfg.random_seed)

    model = build_model(cfg)
    dm = DeepFakeDataModule(cfg).setup("fit")

    class Feeds:
        # loaders are created once and reused: the underlying _Loader advances
        # its shuffle epoch per iteration pass
        _train = ModelFeedLoader(dm.train_dataloader(), cfg, train=True)
        _val = ModelFeedLoader(dm.val_dataloader(), cfg, train=False)

        def train_loader(self):
            return self._train

        def val_loader(self):
            return self._val

    trainer = Trainer(model, cfg, Feeds(), logger=logger, init_rng=rng)

    # external pretrained backbones first (reference loads them at model
    # build, train.py:37); --Resume checkpoints below override
    if cfg.model.audio_pretrained_dir or cfg.model.video_pretrained_dir:
        trainer.load_pretrained_backbones()
    if cfg.model.resume:
        ckpt = {
            "audio": cfg.model.audio_ckpt_path,
            "video": cfg.model.video_ckpt_path,
            "paudio": cfg.model.paudio_ckpt_path,
            "fused": cfg.model.fused_ckpt_path,
        }.get(cfg.data.modality)
        if ckpt:
            if ckpt.endswith(".pth") or ckpt.endswith(".safetensors"):
                trainer.load_reference_pth(ckpt)
            else:
                trainer.load_ckpt(ckpt)
    if cfg.optim.val_model:
        res = trainer.eval(Feeds().val_loader())
        logger(f"val: {json.dumps(res)}")
    elif not cfg.optim.skip_learning:
        trainer.train()


if __name__ == "__main__":
    main()
