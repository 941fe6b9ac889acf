"""Phase timers (TIME: line protocol parity).

The reference hand-rolls two-tier chrono timers (SURVEY.md §5.1): driver
phase timers (read/partition/createA/setup/iterations) plus 23 per-phase PC
timers reduced with max over ranks.  On TPU a single process hosts all
domains, so the per-rank max reduction is the identity; timers wrap
jit-compiled phases with block_until_ready for honest walls.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

import jax


@dataclass
class Timers:
    phases: dict = field(default_factory=dict)

    @contextmanager
    def phase(self, name: str, sync: bool = False, result=None):
        start = time.perf_counter()
        yield
        if sync and result is not None:
            jax.block_until_ready(result)
        self.phases[name] = self.phases.get(name, 0.0) + (
            time.perf_counter() - start)

    def add(self, name: str, seconds: float) -> None:
        self.phases[name] = self.phases.get(name, 0.0) + seconds

    def get(self, name: str) -> float:
        return self.phases.get(name, 0.0)
