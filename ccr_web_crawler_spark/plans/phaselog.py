"""Opt-in per-phase wall-clock logging for the crawl round.

``SPARK_GRAFT_PHASE_LOG=1`` makes every instrumented barrier (the
driver-blocking points: eager checkpoints, collects, commit writes)
print ``[phase] <name>: <sec>`` to stderr. Zero cost when off; exists
to decompose the per-round fixed floor (driver latency + job scheduling
that scales with rounds, not rows) from row-proportional compute — the
Amdahl split that decides N→4N scaling efficiency (BASELINE.md).
"""

from __future__ import annotations

import os
import sys
import time


class phase:
    """``with phase("name"): ...`` — logs elapsed wall when enabled."""

    __slots__ = ("name", "t0")

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        if os.environ.get("SPARK_GRAFT_PHASE_LOG") == "1":
            print(
                f"[phase] {self.name}: {time.time() - self.t0:.2f}s",
                file=sys.stderr,
                flush=True,
            )
        return False
