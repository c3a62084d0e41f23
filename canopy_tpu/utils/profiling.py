"""Observability: phase timers and per-kernel roofline accounting.

The reference stripped all its logging/timing during the SCRAM port
(SURVEY.md §5: ``//CLOCK``/``//LOG`` remnants). This module restores it
TPU-style: structured phase timers (feeding ``RiskAnalysis`` timings and
the report's ``<performance>`` section), a roofline accountant that turns
(bytes moved, elements processed, elapsed) into achieved-fraction
numbers, and an optional `jax.profiler` trace context for TensorBoard.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["PhaseTimer", "RooflineAccountant", "trace"]


class PhaseTimer:
    """Accumulating named phase timers."""

    def __init__(self):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self.times[name] = self.times.get(name, 0.0) + elapsed
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict[str, float]:
        return dict(self.times)


#: Per-chip HBM bandwidth (bytes/s) by TPU generation.
HBM_BANDWIDTH = {"v4": 1.228e12, "v5e": 8.19e11, "v5p": 2.765e12,
                 "v6e": 1.64e12}


class RooflineAccountant:
    """Tracks kernel throughput against the HBM roofline."""

    def __init__(self, generation: str = "v5e"):
        self.bandwidth = HBM_BANDWIDTH.get(generation, 8.19e11)
        self.records: list[dict] = []

    def record(self, name: str, elements: int, bytes_per_element: float,
               seconds: float) -> dict:
        ideal = elements * bytes_per_element / self.bandwidth
        entry = {
            "kernel": name,
            "elements": elements,
            "seconds": seconds,
            "elements_per_s": elements / seconds if seconds else 0.0,
            "hbm_fraction": ideal / seconds if seconds else 0.0,
        }
        self.records.append(entry)
        return entry

    def report(self) -> list[dict]:
        return list(self.records)


@contextlib.contextmanager
def trace(log_dir: str | None):
    """`jax.profiler` trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
