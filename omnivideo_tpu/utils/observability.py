"""Observability: profiling, walltime/preemption guards, metrics, logging.

The reference has *no* first-party tracing/profiling (SURVEY.md §5); its only
fault handling is v1's SLURM AutoResume + walltime callbacks
(`.../llava/train/callbacks/autoresume_callback.py:37-60`,
`.../llava/train/slurm_utils.py:68`). This module provides the TPU-native
equivalents as first-class features:

- `profile_trace`: context manager around `jax.profiler` emitting a
  TensorBoard-loadable trace (xplane) for any region (denoise scan, train
  step) — inspect MXU utilization per-op;
- `annotate`: named TraceAnnotation for grouping ops in the profile;
- `TimeoutGuard`: stop-before-walltime (role of TimeoutTerminateCallback);
- `PreemptionGuard`: SIGTERM-aware checkpoint-and-exit hook (role of
  AutoResumeCallback, generalized beyond SLURM);
- `MetricsLogger`: JSONL metrics + optional TensorBoard scalars (role of the
  reference's TensorBoard logging, finetune_model.py:738-741).
"""

from __future__ import annotations

import contextlib
import json
import logging
import signal
import time
from pathlib import Path
from typing import Optional

import jax

log = logging.getLogger(__name__)


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """Capture a jax.profiler trace into `logdir` (view with TensorBoard or
    xprof). Usage: `with profile_trace("traces/denoise"): run(...)`."""
    if not enabled:
        yield
        return
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", logdir)


def annotate(name: str):
    """Named trace annotation (shows as a block in the profile timeline)."""
    return jax.profiler.TraceAnnotation(name)


class TimeoutGuard:
    """Graceful stop before a walltime limit (role of reference
    TimeoutTerminateCallback, slurm_utils.py:68)."""

    def __init__(self, walltime_s: Optional[float], safety_margin_s: float = 300.0):
        self.deadline = time.monotonic() + walltime_s - safety_margin_s if walltime_s else None

    def should_stop(self) -> bool:
        return self.deadline is not None and time.monotonic() >= self.deadline


class PreemptionGuard:
    """SIGTERM/SIGINT-aware stop flag: on preemption signal the training loop
    checkpoints and exits cleanly (role of AutoResumeCallback's requeue
    request, autoresume_callback.py:37-60 — generalized: any scheduler that
    preempts with SIGTERM)."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._stop = False
        for s in signals:
            try:
                signal.signal(s, self._handler)
            except ValueError:  # not in main thread
                pass

    def _handler(self, signum, frame):
        log.warning("received signal %s — requesting graceful stop", signum)
        self._stop = True

    def should_stop(self) -> bool:
        return self._stop


class MetricsLogger:
    """JSONL metrics with optional TensorBoard mirroring."""

    def __init__(self, directory: str, use_tensorboard: bool = True):
        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        self._f = open(d / "metrics.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(d / "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, **scalars):
        rec = {"step": step, "time": time.time(), **{k: float(v) for k, v in scalars.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
