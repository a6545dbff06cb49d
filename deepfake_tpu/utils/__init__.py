from deepfake_tpu.utils.logging import AverageMeter, Drawer, Logger, StepTimer  # noqa: F401
from deepfake_tpu.utils.seeding import seed_everything  # noqa: F401
