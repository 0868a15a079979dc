"""Rank-0 logging + step metrics + profiler hooks.

Behavioral spec: reference train/train_utils.py:5-33 (rank-0 stdlib logger to
file+stdout, latest-ckpt finder) plus the observability the reference lacks
(SURVEY §5): jax.profiler traces and simple step timing."""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Dict, Optional


def create_logger(log_dir: Optional[str] = None, rank: int = 0) -> logging.Logger:
    logger = logging.getLogger("g2vlm_tpu")
    logger.handlers.clear()
    if rank == 0:
        logger.setLevel(logging.INFO)
        fmt = logging.Formatter(
            "[%(asctime)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
        )
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.setLevel(logging.ERROR)
    return logger


class StepTimer:
    """Wall-clock + tokens/sec tracking across train steps."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last = None

    def tick(self) -> float:
        now = time.perf_counter()
        dt = 0.0 if self._last is None else now - self._last
        self._last = now
        if dt > 0:
            self._times.append(dt)
            self._times = self._times[-self.window :]
        return dt

    @property
    def avg_step_time(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str], step: int, start: int, num: int):
    """Capture a jax.profiler trace for steps [start, start+num)."""
    import jax

    active = trace_dir is not None and start <= step < start + num
    if active and step == start:
        jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        if active and step == start + num - 1:
            jax.profiler.stop_trace()


def format_metrics(step: int, metrics: Dict, step_time: float) -> str:
    parts = [f"step {step}"]
    for k in ("loss", "ce", "dl", "grad_norm"):
        if k in metrics:
            parts.append(f"{k}={float(metrics[k]):.4f}")
    extras = [
        f"{k}={float(v):.4f}"
        for k, v in metrics.items()
        if k not in ("loss", "ce", "dl", "grad_norm")
    ]
    if step_time:
        parts.append(f"{step_time*1000:.0f}ms/step")
    return " ".join(parts + extras)
