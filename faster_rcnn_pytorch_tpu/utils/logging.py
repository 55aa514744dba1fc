"""Metrics, logging, observability.

Replaces the reference's observability stack (SURVEY.md §2.31):

* console step logs with smoothed losses + ETA  -> :class:`MetricLogger`
  (the DETR-lineage logger the reference carries but never wires,
  util/misc.py:27-246 — here it is actually used),
* visdom live plots (train.py:63-72)          -> TensorBoard scalars,
* openpyxl XLSX (epoch, mAP) sheet (log.py:5-43) -> CSV with the same
  columns (openpyxl is not in this image),
* rank-0-only printing (utils/__init__.py:28-40) -> :func:`is_main` gate.

Profiling: :func:`trace_context` wraps ``jax.profiler`` traces — the
tracing capability the reference lacks entirely (SURVEY.md §5).
"""

from __future__ import annotations

import collections
import contextlib
import csv
import datetime
import os
import time

import jax
import numpy as np


def is_main() -> bool:
    return jax.process_index() == 0


def print0(*args, **kwargs) -> None:
    if is_main():
        print(*args, **kwargs)


class SmoothedValue:
    """Windowed + global average of a scalar series."""

    def __init__(self, window: int = 20):
        self.deque: collections.deque = collections.deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.total += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    def __str__(self):
        return f"{self.avg:.4f} ({self.global_avg:.4f})"


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: dict[str, SmoothedValue] = collections.defaultdict(
            SmoothedValue
        )
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def log_every(self, iterable, print_freq: int, header: str = ""):
        """Yield items, printing smoothed meters + ETA every
        ``print_freq`` steps (the reference's per-vis_step console log,
        train.py:44-61, plus the ETA of util/misc.py:194-246)."""
        start = time.time()
        iter_time = SmoothedValue()
        n = len(iterable) if hasattr(iterable, "__len__") else None
        last = time.time()
        for i, obj in enumerate(iterable):
            yield i, obj
            iter_time.update(time.time() - last)
            last = time.time()
            if is_main() and (i % print_freq == 0 or (n and i == n - 1)):
                eta = ""
                if n:
                    eta_sec = iter_time.global_avg * (n - i - 1)
                    eta = f" eta: {datetime.timedelta(seconds=int(eta_sec))}"
                total = f"/{n}" if n else ""
                print(
                    f"{header} [{i}{total}]{eta} {self} "
                    f"time: {iter_time.avg:.3f}s"
                )
        print0(f"{header} total: {datetime.timedelta(seconds=int(time.time() - start))}")


class ScalarWriter:
    """TensorBoard + CSV scalar sink (visdom/XLSX replacement)."""

    def __init__(self, log_dir: str, name: str, backend: str = "tensorboard"):
        self.dir = os.path.join(log_dir, name)
        self.csv_path = os.path.join(self.dir, f"{name}_log.csv")
        self._tb = None
        self._csv_rows: dict[str, dict] = {}
        if not is_main():
            return
        os.makedirs(self.dir, exist_ok=True)
        if backend == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(self.dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if not is_main():
            return
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))
        row = self._csv_rows.setdefault(str(step), {"step": step})
        row[tag] = float(value)
        # The CSV is rewritten whole (column set can grow mid-run), so
        # throttle flushes: every 2s of scalars, plus close(). Keeps the
        # flush O(rows) per interval instead of per scalar (a 26-epoch
        # COCO run logs ~1e5 scalars).
        now = time.time()
        if now - getattr(self, "_last_flush", 0.0) >= 2.0:
            self._flush_csv()

    def _flush_csv(self) -> None:
        self._last_flush = time.time()
        rows = sorted(self._csv_rows.values(), key=lambda r: r["step"])
        cols: list[str] = ["step"]
        for r in rows:
            for k in r:
                if k not in cols:
                    cols.append(k)
        with open(self.csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols)
            w.writeheader()
            w.writerows(rows)

    def close(self) -> None:
        if is_main() and self._csv_rows:
            self._flush_csv()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def trace_context(log_dir: str, enabled: bool = False):
    """jax.profiler trace around a block (view with TensorBoard)."""
    if not enabled or not is_main():
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """images/sec + p50 latency counters (the perf observability the
    reference only approximates with ad-hoc time.time() prints,
    SURVEY.md §5)."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def p50(self) -> float:
        return float(np.percentile(self.times, 50)) if self.times else 0.0

    def throughput(self, items_per_step: int) -> float:
        if not self.times:
            return 0.0
        return items_per_step / float(np.mean(self.times))
