"""Logging + scalar observability.

TPU-native counterparts of the reference's hand-rolled observability stack
(reference: src/utils.py:167-240 — Logger, AverageMeter, Drawer,
GpuInfoTracker/Monitor). GPU utilization polling becomes HBM live-buffer
stats (see deepfake_tpu.utils.profiling).
"""

from __future__ import annotations

import sys
import time
from datetime import datetime
from typing import List, Optional


class Logger:
    """Timestamped line logger writing to a file (or stdout if no path).

    Matches the reference's truncate-on-open, flush-per-line behaviour
    (reference: src/utils.py:203-214)."""

    def __init__(self, log_dir: Optional[str] = None):
        self.log_dir = log_dir
        if log_dir:
            self.f = open(log_dir, "a")
            self.f.truncate(0)
        else:
            self.f = sys.stdout

    def __call__(self, string) -> None:
        print(datetime.now(), string, file=self.f, flush=True)

    def close(self) -> None:
        if self.f is not sys.stdout:
            self.f.close()


class AverageMeter:
    """Running mean of a scalar (reference: src/utils.py:185-201)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        if self.count > 0:
            self.avg = self.sum / self.count


class Drawer:
    """Accumulates scalars and dumps a loss-curve PNG per epoch
    (reference: src/utils.py:167-183). matplotlib is imported lazily so the
    hot path never pays for it."""

    def __init__(self, modality: str, phase: str, out_dir: str = "./checkpoints"):
        self.modality = modality
        self.phase = phase
        self.out_dir = out_dir
        self.reset()

    def reset(self):
        self.log_list: List[float] = []

    def update(self, val, n: int = 1):
        self.log_list.append(float(val))

    def draw(self, epoch: int) -> Optional[str]:
        if not self.log_list:
            return None
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        path = f"{self.out_dir}/Modality:{self.modality}_Phase:{self.phase}_Epoch{epoch}.png"
        fig = plt.figure()
        plt.plot(range(len(self.log_list)), self.log_list)
        fig.savefig(path)
        plt.close(fig)
        return path


class DutyCycle:
    """Per-step device-duty breakdown — the utilization view the reference
    gets from GpuInfoTracker/GPUtil (reference: src/utils.py:216-240), recast
    for a TPU host loop: every wall-clock second is attributed to input-wait
    (loader + host feature prep + H2D put) or step (device compute +
    dispatch), and the rolling shares are logged every `log_step` steps. An
    input_wait share near zero means the accelerator is the bottleneck; near
    one means the pipeline is host-bound (add ingest workers)."""

    def __init__(self, logger: Optional["Logger"] = None, log_step: int = 10):
        self.logger = logger
        self.log_step = log_step
        self.totals: dict = {}
        self._count = 0

    def add(self, phase: str, seconds: float):
        self.totals[phase] = self.totals.get(phase, 0.0) + seconds

    def step(self):
        self._count += 1
        if self.logger and self._count % self.log_step == 0:
            total = sum(self.totals.values()) or 1.0
            parts = " | ".join(
                f"{k} {100.0 * v / total:.1f}%" for k, v in sorted(self.totals.items())
            )
            self.logger(f"duty | {parts} (over {self._count} steps)")

    def share(self, phase: str) -> float:
        total = sum(self.totals.values())
        return self.totals.get(phase, 0.0) / total if total else 0.0


class StepTimer:
    """Wall-clock phase timing around dataload/step/checkpoint, replacing the
    reference's inline time.time() pairs (reference: src/trainer.py:243-299)."""

    def __init__(self, logger: Optional[Logger] = None, log_step: int = 10):
        self.logger = logger
        self.log_step = log_step
        self._marks = {}
        self._count = 0

    def mark(self, name: str):
        self._marks[name] = time.perf_counter()

    def elapsed(self, name: str) -> float:
        return time.perf_counter() - self._marks.get(name, time.perf_counter())

    def report(self, name: str):
        dt = self.elapsed(name)
        self._count += 1
        if self.logger and self._count % self.log_step == 0:
            self.logger(f"{name} : elapse {dt:.4f} secs")
        return dt
