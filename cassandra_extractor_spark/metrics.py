"""Metrics registry + Prometheus text exposition (reference M1:
``metrics.py:5-35``, ``management.py:36-54``).

The reference tracks processed/ignored/total counters and fetch/task/
write latency histograms per extractor.  Here counters are fed from
Spark's own instrumentation (job-level row counts via observable
metrics — ``df.observe`` — and ``StreamingQuery.lastProgress``), then
rendered in Prometheus exposition format without external deps.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class MetricsRegistry:
    """Thread-safe counter/gauge/histogram registry."""

    namespace: str = "cassandra_extractor_spark"
    _counters: dict[tuple[str, tuple], float] = field(default_factory=lambda: defaultdict(float))
    _gauges: dict[tuple[str, tuple], float] = field(default_factory=dict)
    _histograms: dict[tuple[str, tuple], list[float]] = field(default_factory=lambda: defaultdict(list))
    _lock: threading.Lock = field(default_factory=threading.Lock)

    @staticmethod
    def _key(name: str, labels: dict[str, str] | None) -> tuple[str, tuple]:
        return name, tuple(sorted((labels or {}).items()))

    def inc(self, name: str, value: float = 1.0, **labels: str) -> None:
        with self._lock:
            self._counters[self._key(name, labels)] += value

    def set_gauge(self, name: str, value: float, **labels: str) -> None:
        with self._lock:
            self._gauges[self._key(name, labels)] = value

    def observe(self, name: str, value: float, **labels: str) -> None:
        with self._lock:
            self._histograms[self._key(name, labels)].append(value)

    def time(self, name: str, **labels: str):
        """Context manager recording elapsed seconds into a histogram."""
        registry = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *exc):
                registry.observe(name, time.time() - self.t0, **labels)
                return False

        return _Timer()

    @staticmethod
    def _fmt_labels(labels: tuple) -> str:
        if not labels:
            return ""
        return "{" + ",".join(f'{k}="{v}"' for k, v in labels) + "}"

    def exposition(self) -> str:
        """Prometheus text format (the reference's GET /metrics body)."""
        lines: list[str] = []
        with self._lock:
            for (name, labels), v in sorted(self._counters.items()):
                lines.append(f"# TYPE {self.namespace}_{name} counter")
                lines.append(f"{self.namespace}_{name}{self._fmt_labels(labels)} {v}")
            for (name, labels), v in sorted(self._gauges.items()):
                lines.append(f"# TYPE {self.namespace}_{name} gauge")
                lines.append(f"{self.namespace}_{name}{self._fmt_labels(labels)} {v}")
            for (name, labels), vals in sorted(self._histograms.items()):
                lines.append(f"# TYPE {self.namespace}_{name} summary")
                lab = self._fmt_labels(labels)
                lines.append(f"{self.namespace}_{name}_count{lab} {len(vals)}")
                lines.append(f"{self.namespace}_{name}_sum{lab} {sum(vals)}")
        return "\n".join(lines) + "\n"
