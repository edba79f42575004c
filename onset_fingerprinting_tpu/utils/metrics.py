"""Structured metrics, tracing and TensorBoard logging.

The reference had no tracing/metrics subsystem — ad-hoc ``time.time()``
deltas and prints (SURVEY.md §5.1/§5.5).  This module provides the planned
TPU-native replacements:

- :func:`trace` / :func:`trace_span` — ``jax.profiler`` annotations around
  pipeline stages (visible in TPU profiler traces) that double as wall-clock
  span timers.
- :class:`Metrics` — a process-local registry of counters and latency
  histograms (detections/s, per-stage p50/p99, localization error, …) with
  one-line summaries.
- :class:`TBWriter` — thin TensorBoard writer (scalars + matplotlib figures),
  replacing the reference's Lightning logger usage (model.py:126-143); falls
  back to JSONL event logging when tensorboard isn't importable.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Optional

import numpy as np

try:
    import jax.profiler as _profiler
except Exception:  # pragma: no cover
    _profiler = None


@contextlib.contextmanager
def trace(name: str, metrics: Optional["Metrics"] = None):
    """Profiler-annotated, timed span."""
    t0 = time.perf_counter()
    ctx = (
        _profiler.TraceAnnotation(name)
        if _profiler is not None
        else contextlib.nullcontext()
    )
    with ctx:
        yield
    if metrics is not None:
        metrics.observe(name, (time.perf_counter() - t0) * 1e3)


trace_span = trace


@contextlib.contextmanager
def profile_trace(logdir: str | Path):
    """Capture a full device profiler trace (TensorBoard-viewable) around a
    region — the planned replacement for the reference's ad-hoc
    ``time.time()`` probing (SURVEY §5.1)."""
    if _profiler is None:  # pragma: no cover
        yield
        return
    _profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        _profiler.stop_trace()


class Metrics:
    """Counters + latency observations with percentile summaries."""

    def __init__(self):
        self.counters: dict[str, float] = defaultdict(float)
        self.observations: dict[str, list[float]] = defaultdict(list)
        self._t0 = time.perf_counter()

    def count(self, name: str, n: float = 1.0) -> None:
        self.counters[name] += n

    def observe(self, name: str, value_ms: float) -> None:
        self.observations[name].append(value_ms)

    def observe_deadline(
        self, name: str, value_ms: float, budget_ms: float
    ) -> None:
        """Observe a latency and count ``<name>.miss`` when it exceeds the
        budget (the serve loop's hard per-block deadline,
        reference realtime/config.py:33-36)."""
        self.observe(name, value_ms)
        if value_ms > budget_ms:
            self.count(name + ".miss")

    def misses(self, name: str) -> int:
        return int(self.counters.get(name + ".miss", 0))

    def rate(self, name: str) -> float:
        """Counter per wall-clock second since creation."""
        dt = time.perf_counter() - self._t0
        return self.counters[name] / dt if dt > 0 else 0.0

    def summary(self) -> dict:
        out: dict = {"counters": dict(self.counters)}
        lat = {}
        for name, vals in self.observations.items():
            v = np.asarray(vals)
            lat[name] = {
                "count": int(v.size),
                "p50_ms": float(np.percentile(v, 50)),
                "p99_ms": float(np.percentile(v, 99)),
                "max_ms": float(v.max()),
            }
        out["latency"] = lat
        return out

    def report(self) -> str:
        s = self.summary()
        lines = [
            *(f"{k}: {v:g} ({self.rate(k):.1f}/s)" for k, v in
              s["counters"].items()),
            *(
                f"{k}: p50 {d['p50_ms']:.3f}ms p99 {d['p99_ms']:.3f}ms "
                f"max {d['max_ms']:.3f}ms (n={d['count']})"
                for k, d in s["latency"].items()
            ),
        ]
        return "\n".join(lines)


class TBWriter:
    """TensorBoard scalar/figure writer with a JSONL fallback."""

    def __init__(self, logdir: str | Path):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(str(self.logdir))
        except Exception:  # pragma: no cover
            self._tb = None
            self._jsonl = open(self.logdir / "events.jsonl", "a")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        else:  # pragma: no cover
            self._jsonl.write(
                json.dumps({"tag": tag, "value": float(value), "step": step})
                + "\n"
            )
            self._jsonl.flush()

    def add_figure(self, tag: str, figure, step: int) -> None:
        if self._tb is not None:
            self._tb.add_figure(tag, figure, step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        else:  # pragma: no cover
            self._jsonl.close()
