"""Cross-process global-step tracker.

Parity target: /root/reference/ggrt/misc/step_tracker.py — a shared step
counter visible to dataloader worker processes (used for curriculum-style
view selection). Implemented with multiprocessing shared memory + lock.
"""
from __future__ import annotations

from multiprocessing import Manager, Value


class StepTracker:
    def __init__(self):
        self.lock = Manager().RLock()
        self.step = Value("i", 0, lock=False)

    def set_step(self, step: int) -> None:
        with self.lock:
            self.step.value = int(step)

    def get_step(self) -> int:
        with self.lock:
            return int(self.step.value)
