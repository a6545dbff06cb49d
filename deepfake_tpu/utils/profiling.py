"""Tracing / profiling / memory accounting.

TPU-native replacements for the reference's observability stack:

* trace()/StepAnnotation — jax.profiler traces viewable in xprof/TensorBoard,
  replacing ad-hoc wall-clock prints (reference: src/trainer.py:243-299).
* hbm_stats()/HbmTracker — live-buffer census from the runtime's memory
  stats + jax.live_arrays(), replacing the GC-walking CUDA tensor tracker
  (reference: gpu_mem_track.py:37-119, hooked every 500 steps).
* model_size() — parameter/buffer census (reference: src/trainer.py:15-28
  getModelSize).
* activation_memory_estimate() — sums intermediate value sizes from the
  jaxpr, replacing the module-walking estimator
  (reference: modelsize_estimate.py:6-37).
* xla_flops() — compiled-program FLOPs from XLA cost analysis, replacing the
  hand-maintained per-module flops() methods
  (reference: swin_transformer2d.py:185-196,312-324,636-643).
"""

from __future__ import annotations

import contextlib
import os
import time
from datetime import datetime
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def StepAnnotation(name: str, step: int):
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


def hbm_stats(device=None) -> Dict[str, int]:
    """Bytes in use / limit for one device (empty dict if unsupported)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


def live_buffer_census() -> Dict[str, Any]:
    """Census of live jax arrays grouped by (shape, dtype):
    the HBM analogue of the reference's GC tensor walk."""
    groups: Dict[str, Dict[str, Any]] = {}
    total = 0
    for arr in jax.live_arrays():
        key = f"{arr.dtype}{list(arr.shape)}"
        size = arr.size * arr.dtype.itemsize
        g = groups.setdefault(key, {"count": 0, "bytes": 0})
        g["count"] += 1
        g["bytes"] += size
        total += size
    return {"total_bytes": total, "groups": groups}


class HbmTracker:
    """Periodic live-buffer diff appended to a track file
    (reference: gpu_mem_track.py — '+'/'-' lines every 500 steps)."""

    def __init__(self, path: str = "./hbm_track/", every: int = 500):
        os.makedirs(path, exist_ok=True)
        ts = datetime.now().strftime("%d-%b-%y-%H:%M:%S")
        self.file = os.path.join(path, f"{ts}-hbm_track.txt")
        self.every = every
        self._count = 0
        self._last: Dict[str, Dict[str, Any]] = {}

    def step(self):
        self._count += 1

    def track(self):
        if self._count % self.every:
            return
        census = live_buffer_census()
        cur = census["groups"]
        lines = [f"\nAt step {self._count} Total HBM bytes: {census['total_bytes']}"]
        for k, v in cur.items():
            prev = self._last.get(k)
            if prev is None:
                lines.append(f"+ {v['count']} x {k} ({v['bytes']} B)")
            elif prev["count"] != v["count"]:
                lines.append(f"~ {prev['count']} -> {v['count']} x {k}")
        for k, v in self._last.items():
            if k not in cur:
                lines.append(f"- {v['count']} x {k} ({v['bytes']} B)")
        self._last = cur
        with open(self.file, "a") as f:
            f.write("\n".join(lines) + "\n")


def model_size(params) -> Dict[str, float]:
    """{'params': count, 'mb': size} (reference: src/trainer.py:15-28)."""
    leaves = jax.tree_util.tree_leaves(params)
    count = sum(x.size for x in leaves)
    size = sum(x.size * x.dtype.itemsize for x in leaves)
    return {"params": count, "mb": size / 1024 / 1024}


def activation_memory_estimate(fn: Callable, *args, **kwargs) -> int:
    """Sum of intermediate value sizes (x2 for the backward's residuals, like
    the reference estimator), from the traced jaxpr."""
    jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    total = 0
    for eqn in jaxpr.jaxpr.eqns:
        for var in eqn.outvars:
            aval = var.aval
            if hasattr(aval, "shape"):
                n = 1
                for d in aval.shape:
                    n *= d
                total += n * aval.dtype.itemsize
    return 2 * total


def xla_flops(fn: Callable, *args) -> Optional[float]:
    """FLOPs of the compiled program per XLA cost analysis."""
    compiled = jax.jit(fn).lower(*args).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


class Monitor:
    """Rate-limited HBM utilisation print-through (reference: src/utils.py:230-240)."""

    def __init__(self, log_step: int = 10, printer=print):
        self.log_step = log_step
        self.printer = printer
        self._count = 0

    def __call__(self, *a):
        if (self._count + 1) % self.log_step == 0:
            stats = hbm_stats()
            used = stats.get("bytes_in_use", 0)
            limit = stats.get("bytes_limit", 0)
            pct = 100.0 * used / limit if limit else float("nan")
            self.printer(f"HBM: {used / 2 ** 20:.1f} MiB in use ({pct:.1f}%)")

    def step(self):
        self._count += 1
