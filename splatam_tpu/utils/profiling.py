"""Timing telemetry + device tracing.

Parity with the reference's wall-clock accumulators (tracking/mapping x
iter/frame averages, `scripts/splatam.py:615-622,959-979`), upgraded with
`jax.profiler` device traces (SURVEY.md §5 tracing note). On the tunneled
single-chip setup every host sync costs ~35 ms, so phase timers should wrap
whole jitted programs, not per-op sections.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List

import jax


class PhaseTimers:
    """Accumulates per-phase wall-clock samples; prints reference-style
    averages."""

    def __init__(self):
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.samples[name].append(time.perf_counter() - t0)

    def mean_ms(self, name: str) -> float:
        vals = self.samples.get(name, [])
        return 1000.0 * sum(vals) / len(vals) if vals else float("nan")

    def report(self) -> Dict[str, float]:
        """The reference's four headline averages plus anything recorded."""
        out = {name: self.mean_ms(name) for name in self.samples}
        for name, ms in sorted(out.items()):
            unit = "ms"
            print(f"Average {name} time: {ms:.2f} {unit}")
        return out


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
