from deepfake_tpu.data.dataset import DeepFakeDataModule, DeepFakeDataset  # noqa: F401
