"""Profiling hooks (SURVEY.md §5.1 — absent in the reference; new here).

Wraps jax.profiler for one-line tracing of training rounds, plus a simple
wall-clock section timer.  Per-round wall-clock is also always recorded in
the history (``log_rounds.wall_time_seconds``).

    with tpinn.profiling.trace("/tmp/trace"):
        ns.minimize(pb, "jax", "L-BFGS", 1000)
    # -> view in TensorBoard / xprof
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """jax.profiler.trace context (device + host timelines)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulating named wall-clock sections.

    Blocks on async dispatch when ``sync`` so device time is attributed to
    the section that launched it.
    """

    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self.sync = sync

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    import jax

                    jax.effects_barrier()
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        return "\n".join(
            f"{name}: {total:.3f}s over {self.counts[name]} calls"
            for name, total in rows
        )
