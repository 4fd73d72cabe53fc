"""Duration formatting / simple stage timing (reference format_duration,
/root/reference/src/performance.jl:9-19)."""

from __future__ import annotations

import time
from contextlib import contextmanager


def format_duration(seconds: float) -> str:
    """Human-readable duration, reference-style."""
    if seconds < 1:
        return f"{seconds * 1000:.0f}ms"
    if seconds < 60:
        return f"{seconds:.2f}s"
    m, s = divmod(seconds, 60.0)
    if m < 60:
        return f"{int(m)}m{s:.0f}s"
    h, m = divmod(m, 60.0)
    return f"{int(h)}h{int(m)}m{s:.0f}s"


@contextmanager
def timed(label: str, sink: dict | None = None):
    """Context manager recording a stage wall time into ``sink`` (the
    engine's analogue of the reference's @showprogress/duration logs)."""
    t0 = time.monotonic()
    yield
    dt = time.monotonic() - t0
    if sink is not None:
        sink[label] = round(dt, 4)
