"""Stage timing + optional jax profiler hooks.

The reference has no tracing at all (SURVEY.md §5); this fills the gap so
the pipeline can report per-stage wall-clock and frames/sec/chip, and wrap
hot regions in jax.profiler traces when requested.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Dict, Optional

_STAGE_TOTALS: "OrderedDict[str, float]" = OrderedDict()
_STAGE_COUNTS: Dict[str, int] = {}


class StageTimer:
    """Accumulating named wall-clock timer."""

    def __init__(self, name: str):
        self.name = name
        self.elapsed = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.elapsed += dt
        _STAGE_TOTALS[self.name] = _STAGE_TOTALS.get(self.name, 0.0) + dt
        _STAGE_COUNTS[self.name] = _STAGE_COUNTS.get(self.name, 0) + 1
        return False


@contextlib.contextmanager
def trace_stage(name: str, profile: bool = False):
    """Time a pipeline stage; optionally wrap it in a jax profiler annotation."""
    if profile:
        import jax

        with jax.profiler.TraceAnnotation(name):
            with StageTimer(name):
                yield
    else:
        with StageTimer(name):
            yield


def get_stage_report(reset: bool = False) -> Dict[str, dict]:
    """Return {stage: {total_s, calls, mean_s}} accumulated so far."""
    report = {
        name: {
            "total_s": total,
            "calls": _STAGE_COUNTS[name],
            "mean_s": total / _STAGE_COUNTS[name],
        }
        for name, total in _STAGE_TOTALS.items()
    }
    if reset:
        _STAGE_TOTALS.clear()
        _STAGE_COUNTS.clear()
    return report
