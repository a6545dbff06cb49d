"""Step watchdog — lightweight failure detection.

The reference's failure handling is limited to signal handlers and
inference-resume (SURVEY.md §5.3). This adds an actual health check: a daemon
thread that fires a callback (default: log) when the monitored section runs
longer than `deadline_s` — catching wedged device tunnels, stuck collectives,
or stalled input pipelines instead of hanging silently.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Optional


class StepWatchdog:
    """Usage:
        wd = StepWatchdog(deadline_s=300, on_stall=logger)
        with wd.watch("train_step"):
            ... device work ...
    Nested/concurrent sections are not supported (one active section)."""

    def __init__(
        self,
        deadline_s: float = 300.0,
        on_stall: Optional[Callable[[str], None]] = None,
        poll_s: float = 5.0,
    ):
        self.deadline_s = deadline_s
        self.on_stall = on_stall or (lambda msg: print(msg, flush=True))
        self.poll_s = poll_s
        self._lock = threading.Lock()
        self._section: Optional[str] = None
        self._start = 0.0
        self._fired = False
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        self.stall_count = 0

    def _run(self):
        while not self._stop.wait(self.poll_s):
            with self._lock:
                if self._section is None or self._fired:
                    continue
                elapsed = time.monotonic() - self._start
                if elapsed > self.deadline_s:
                    self._fired = True
                    self.stall_count += 1
                    section, el = self._section, elapsed
                else:
                    continue
            self.on_stall(
                f"[watchdog] section '{section}' exceeded {self.deadline_s:.0f}s "
                f"deadline ({el:.0f}s elapsed) — device or input pipeline may be stuck"
            )

    class _Section:
        def __init__(self, wd: "StepWatchdog", name: str):
            self.wd, self.name = wd, name

        def __enter__(self):
            with self.wd._lock:
                self.wd._section = self.name
                self.wd._start = time.monotonic()
                self.wd._fired = False
            return self

        def __exit__(self, *exc):
            with self.wd._lock:
                self.wd._section = None
            return False

    def watch(self, name: str) -> "StepWatchdog._Section":
        return StepWatchdog._Section(self, name)

    def close(self):
        self._stop.set()
