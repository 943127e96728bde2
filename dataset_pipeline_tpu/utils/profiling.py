"""Stage timing + device tracing.

The reference has no tracing at all (SURVEY.md §5 — only LOG(INFO) progress
lines); here per-stage wall time and optional ``jax.profiler`` traces are
first-class so pipeline hot spots are visible from day one.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Accumulates wall time per named stage; prints/dumps a summary."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """Time a stage; pass ``sync=arr`` to block on a device value first."""
        t0 = time.time()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            lines.append(
                f"{name}: {self.totals[name]:.3f}s total, {self.counts[name]} calls, "
                f"{self.totals[name] / max(self.counts[name], 1) * 1000:.1f}ms avg"
            )
        return "\n".join(lines)

    def dump_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({n: {"total_s": self.totals[n], "count": self.counts[n]}
                       for n in self.totals}, f, indent=1)


GLOBAL_TIMER = StageTimer()


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str] = None):
    """Capture a jax.profiler trace (view with xprof/TensorBoard).

    Enabled by passing a dir or setting ``DPT_TRACE_DIR``.
    """
    trace_dir = trace_dir or os.environ.get("DPT_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
