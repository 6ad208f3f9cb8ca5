"""Tracing / profiling / observability.

The reference has none of this — three println! progress lines are the
whole story (reference: src/bin/sample/main.rs:85-103, SURVEY.md §5).
sdtpu provides:

- `phase(name)`: wall-clock phase spans collected into a global registry
  (encode / denoise / decode / png ...), reported as a structured
  per-run summary
- `trace(dir)`: context manager around jax.profiler for XLA-level traces
  viewable in TensorBoard/Perfetto
- enabled summary printing via SDTPU_PROFILE=1
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import OrderedDict
from typing import Dict, Iterator, Optional


class PhaseRegistry:
    def __init__(self):
        self.spans: "OrderedDict[str, float]" = OrderedDict()
        self.counts: Dict[str, int] = {}

    def add(self, name: str, seconds: float) -> None:
        self.spans[name] = self.spans.get(name, 0.0) + seconds
        self.counts[name] = self.counts.get(name, 0) + 1

    def reset(self) -> None:
        self.spans.clear()
        self.counts.clear()

    def summary(self) -> dict:
        total = sum(self.spans.values())
        return {
            "phases": {k: round(v, 4) for k, v in self.spans.items()},
            "counts": dict(self.counts),
            "total_s": round(total, 4),
        }

    def report(self, extra: Optional[dict] = None) -> str:
        s = self.summary()
        if extra:
            s.update(extra)
        return json.dumps(s)


REGISTRY = PhaseRegistry()


def enabled() -> bool:
    return os.environ.get("SDTPU_PROFILE", "0") not in ("0", "", "false")


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        REGISTRY.add(name, time.perf_counter() - t0)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """XLA-level profiler trace (TensorBoard / xprof format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
