"""Tracing / profiling hooks.

The reference has no tracer — only ad-hoc wall-clock prints
(CompVTime::nowMillis around loops, tests/image/feature_orb.cxx:59-65) and
runtime perf-smell warnings (COMPV_DEBUG_INFO_CODE_NOT_OPTIMIZED). SURVEY §5
calls for real tracing on TPU: these helpers wrap `jax.profiler` (XLA
device traces viewable in TensorBoard/Perfetto) and add a lightweight
wall-clock timer registry for quick per-op tables without a trace viewer.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple

import jax

_timings: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def span(name: str) -> Iterator[None]:
    """Named region: shows up in jax.profiler traces AND the timer table.
    Blocks on completion so the wall time covers device work."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            _timings[name].append(time.perf_counter() - t0)


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture an XLA device trace (open with TensorBoard's profile plugin
    or Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def table() -> List[Tuple[str, int, float, float]]:
    """[(name, calls, total_s, mean_ms)] sorted by total time."""
    rows = [(k, len(v), sum(v), 1e3 * sum(v) / max(len(v), 1))
            for k, v in _timings.items()]
    return sorted(rows, key=lambda r: -r[2])


def report() -> str:
    lines = [f"{'span':<32}{'calls':>8}{'total s':>12}{'mean ms':>12}"]
    for name, calls, tot, mean in table():
        lines.append(f"{name:<32}{calls:>8}{tot:>12.4f}{mean:>12.3f}")
    return "\n".join(lines)


def reset() -> None:
    _timings.clear()
