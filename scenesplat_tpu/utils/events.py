"""Event storage and writers (reference: pointcept/utils/events.py:27-602).

``EventStorage`` accumulates scalar histories during training; writers render
them to the console / JSON lines / TensorBoard (if tensorboardX is present —
it is optional and gated).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

_CURRENT_STORAGE = []


def get_event_storage() -> "EventStorage":
    assert _CURRENT_STORAGE, "no EventStorage is active; use `with EventStorage():`"
    return _CURRENT_STORAGE[-1]


class HistoryBuffer:
    def __init__(self, max_length: int = 1000000):
        self._data = []
        self._max_length = max_length
        self._count = 0
        self._global_avg = 0.0

    def update(self, value: float, iteration: Optional[int] = None):
        if iteration is None:
            iteration = self._count
        if len(self._data) == self._max_length:
            self._data.pop(0)
        self._data.append((value, iteration))
        self._count += 1
        self._global_avg += (value - self._global_avg) / self._count

    def latest(self):
        return self._data[-1][0]

    def median(self, window: int = 20):
        import numpy as np

        return float(np.median([x[0] for x in self._data[-window:]]))

    def avg(self, window: int = 20):
        import numpy as np

        return float(np.mean([x[0] for x in self._data[-window:]]))

    def global_avg(self):
        return self._global_avg


class EventStorage:
    def __init__(self, start_iter: int = 0):
        self._history: Dict[str, HistoryBuffer] = defaultdict(HistoryBuffer)
        self._iter = start_iter
        self._latest: Dict[str, float] = {}

    def put_scalar_at(self, name: str, value: float, iteration: int):
        """Record a scalar for a past iteration (deferred device-metric
        flushes: the trainer batches host fetches instead of syncing every
        step — see Trainer.flush_metrics)."""
        value = float(value)
        self._history[name].update(value, iteration)
        self._latest[name] = value

    def put_scalar(self, name: str, value: float):
        value = float(value)
        self._history[name].update(value, self._iter)
        self._latest[name] = value

    def put_scalars(self, **kwargs):
        for k, v in kwargs.items():
            self.put_scalar(k, v)

    @property
    def iter(self):
        return self._iter

    @iter.setter
    def iter(self, value):
        self._iter = int(value)

    def step(self):
        self._iter += 1

    @property
    def latest(self):
        return self._latest

    def history(self, name):
        return self._history[name]

    def histories(self):
        return self._history

    def __enter__(self):
        _CURRENT_STORAGE.append(self)
        return self

    def __exit__(self, *args):
        assert _CURRENT_STORAGE[-1] is self
        _CURRENT_STORAGE.pop()


class JSONWriter:
    def __init__(self, json_file: str, window_size: int = 20):
        os.makedirs(os.path.dirname(os.path.abspath(json_file)), exist_ok=True)
        self._file = open(json_file, "a")
        self._window = window_size

    def write(self, storage: EventStorage):
        record = {"iteration": storage.iter}
        record.update(storage.latest)
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()

    def close(self):
        self._file.close()


class TensorboardWriter:
    """Optional tensorboardX writer; silently disabled when unavailable."""

    def __init__(self, log_dir: str):
        try:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(log_dir)
        except Exception:
            self._writer = None

    def write_scalar(self, name: str, value: float, step: int):
        if self._writer is not None:
            self._writer.add_scalar(name, value, step)

    def write(self, storage: EventStorage):
        if self._writer is None:
            return
        for name, value in storage.latest.items():
            self._writer.add_scalar(name, value, storage.iter)

    def close(self):
        if self._writer is not None:
            self._writer.close()


class CommonMetricPrinter:
    def __init__(self, logger, max_iter: Optional[int] = None, window: int = 20):
        self.logger = logger
        self.max_iter = max_iter
        self.window = window
        self._start = time.time()

    def write(self, storage: EventStorage):
        parts = [f"iter {storage.iter}"]
        for name, value in sorted(storage.latest.items()):
            parts.append(f"{name}: {value:.4g}")
        if self.max_iter and "batch_time" in storage._history:
            bt = storage.history("batch_time").median(self.window)
            eta = bt * (self.max_iter - storage.iter)
            parts.append(f"eta: {eta / 3600:.2f}h")
        self.logger.info("  ".join(parts))
