"""Opt-in phase timing for the apply/commit hot path.

Enabled by ``SPARK_GRAFT_PROFILE=1``; otherwise :func:`phase` is a zero-cost
no-op. Phase wall times accumulate in :data:`PHASES` (driver-side only) so a
profiling run can attribute replay wall time to scan/aggregate vs write vs
driver-side commit bookkeeping — the serial components that Amdahl-cap
scaling efficiency at high core counts.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

PHASES: dict[str, float] = {}
_ENABLED = os.environ.get("SPARK_GRAFT_PROFILE", "") == "1"


@contextmanager
def phase(name: str):
    if not _ENABLED:
        yield
        return
    t0 = time.monotonic()
    try:
        yield
    finally:
        PHASES[name] = PHASES.get(name, 0.0) + (time.monotonic() - t0)


def record(name: str, seconds: float) -> None:
    """Accumulate an externally-timed span (for regions where a ``with``
    block would force awkward reindentation around early returns)."""
    if _ENABLED:
        PHASES[name] = PHASES.get(name, 0.0) + seconds


def reset() -> None:
    PHASES.clear()


def snapshot() -> dict[str, float]:
    return {k: round(v, 3) for k, v in sorted(PHASES.items())}
