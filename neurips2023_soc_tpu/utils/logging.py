"""Metric logging + profiling helpers (reference misc.py:231-379, upgraded
with first-class jax.profiler traces per SURVEY.md §5)."""
from __future__ import annotations

import contextlib
import datetime
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

import numpy as np


class SmoothedValue:
    """Track a series of values with window-smoothed statistics."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if hasattr(v, "item"):
                v = float(v)
            self.meters[k].update(v)

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "", total: Optional[int] = None):
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                tot = f"/{total}" if total else ""
                print(f"{header} [{i}{tot}] {self} "
                      f"iter_t: {iter_time} data_t: {data_time}", flush=True)
            i += 1
            end = time.time()
        print(f"{header} total: "
              f"{datetime.timedelta(seconds=int(time.time() - start))}")


def setup_for_distributed(is_main: Optional[bool] = None):
    """Suppress print on non-main hosts (reference misc.py:163-175)."""
    import builtins

    if is_main is None:
        import jax

        is_main = jax.process_index() == 0
    if is_main:
        return
    orig_print = builtins.print

    def print_main_only(*args, force: bool = False, **kwargs):
        if force:
            orig_print(*args, **kwargs)

    builtins.print = print_main_only


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str], enabled: bool = True):
    """jax.profiler trace context; no-op when disabled or unsupported."""
    if not enabled or not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # axon may not support profiling
        print(f"profiler unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def step_timer(metrics: MetricLogger, name: str = "step_time"):
    t0 = time.perf_counter()
    yield
    metrics.update(**{name: time.perf_counter() - t0})
