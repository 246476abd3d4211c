"""Tracing/profiling + metrics logging (SURVEY.md section 5).

The reference has no profiling at all (stdout prints only). TPU-native
observability here:
  * `profile_trace`: jax.profiler trace context writing a TensorBoard-
    compatible profile (xplane) for a window of steps.
  * `StepTimer`: lightweight wall-clock per-step timing with warmup skip.
  * `ScalarWriter`: optional TensorBoard scalars (tensorboardX if present),
    falling back to a CSV so the contract holds without the dependency.
"""

from __future__ import annotations

import contextlib
import csv
import os
import time
from typing import Dict, Optional


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace if a logdir is given; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._n = 0
        self._t = 0.0
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._n += 1
            if self._n > self.warmup:
                self._t += now - self._last
        self._last = now

    @property
    def mean_step_s(self) -> float:
        steps = self._n - self.warmup
        return self._t / steps if steps > 0 else float("nan")


class ScalarWriter:
    """TensorBoard scalars when available; always mirrors to CSV."""

    def __init__(self, logdir: Optional[str]):
        self.logdir = logdir
        self._tb = None
        self._csv_path = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            self._csv_path = os.path.join(logdir, "scalars.csv")
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        if not self.logdir:
            return
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        new = not os.path.exists(self._csv_path)
        with open(self._csv_path, "a", newline="") as f:
            w = csv.writer(f)
            if new:
                w.writerow(["step", *scalars.keys()])
            w.writerow([step, *[f"{v:.6g}" for v in scalars.values()]])

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
