"""Wall-clock + device-memory benchmarking (host-side).

Parity target: /root/reference/ggrt/misc/benchmarker.py:11-37 — tagged
contextmanager timing with JSON dump and peak-memory reporting; the CUDA
memory_stats dump becomes jax device memory_stats.
"""
from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path


class Benchmarker:
    def __init__(self):
        self.execution_times = defaultdict(list)

    @contextmanager
    def time(self, tag: str, num_calls: int = 1):
        try:
            start_time = time.time()
            yield
        finally:
            end_time = time.time()
            for _ in range(num_calls):
                self.execution_times[tag].append((end_time - start_time) / num_calls)

    def dump(self, path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        with path.open("w") as f:
            json.dump(dict(self.execution_times), f)

    def dump_memory(self, path) -> None:
        import jax

        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        stats = {}
        for i, d in enumerate(jax.devices()):
            ms = getattr(d, "memory_stats", lambda: None)()
            if ms:
                stats[f"device_{i}"] = {k: int(v) for k, v in ms.items()}
        with path.open("w") as f:
            json.dump(stats, f)

    def summarize(self) -> None:
        for tag, times in self.execution_times.items():
            print(f"{tag}: {len(times)} calls, avg. {sum(times) / len(times):.3f} s/call")
