"""deepfake_tpu — a TPU-native multimodal audio/video deepfake detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch system (Polarisjame/DeepFake): four selectable detection pipelines
(video / audio / paudio / fused) over Inception-ResNet-v2 + NeXtVLAD,
Swin Transformer V2 (2D), wav2vec2-base, Video Swin Transformer (3D), and a
3-token cross-modal attention fusion head — plus the training, inference,
data-ingest, checkpointing, and observability subsystems around them.

Design notes
------------
* Compute path is pure JAX/XLA with Pallas kernels for windowed attention and
  the on-device audio DSP; layouts are NHWC / NTHWC (TPU-native).
* Models are flax.linen modules that emit logits; sigmoid heads are applied in
  ``predict``-style wrappers for parity with the reference
  (reference: src/trainer.py:88 trains BCELoss on sigmoid probabilities).
* Parallelism is jax.sharding over a device Mesh (data/model axes); gradients
  all-reduce over ICI via pjit-inserted collectives (replacing the reference's
  torch.nn.DataParallel, src/trainer.py:74-75).
"""

__version__ = "0.1.0"

from deepfake_tpu.config import Config, get_config  # noqa: F401
