from deepfake_tpu.train.trainer import Trainer, TrainState  # noqa: F401
