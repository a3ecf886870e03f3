"""Hierarchical tic/toc profiler.

Counterpart of ``rv::Stopwatch`` (``/root/reference/src/rv/Stopwatch.{h,cpp}``,
the tic/toc stack wrapped around every pipeline stage) with the additions a
JAX engine needs: an optional ``block_until_ready`` on scope exit so device
work is attributed to the right stage, running mean/max statistics per
label, and context-manager ergonomics.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class StageStats:
    count: int = 0
    total: float = 0.0
    max: float = 0.0
    last: float = 0.0

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


class Stopwatch:
    """tic()/toc() stack + named scopes with aggregated statistics."""

    def __init__(self):
        self._stack: List[float] = []
        self.stats: Dict[str, StageStats] = defaultdict(StageStats)

    def tic(self) -> None:
        self._stack.append(time.perf_counter())

    def record(self, label: str, elapsed: float) -> None:
        """Attribute an externally-measured duration to ``label`` (for
        stages whose timing is produced elsewhere, e.g. the loop-closure
        state machine's own phase timer)."""
        self._record(label, elapsed)

    def toc(self, label: Optional[str] = None) -> float:
        elapsed = time.perf_counter() - self._stack.pop()
        if label is not None:
            self._record(label, elapsed)
        return elapsed

    def _record(self, label: str, elapsed: float) -> None:
        s = self.stats[label]
        s.count += 1
        s.total += elapsed
        s.max = max(s.max, elapsed)
        s.last = elapsed

    @contextmanager
    def scope(self, label: str, sync: Any = None):
        """Timed scope; pass a jax array/pytree as ``sync`` to block on it
        before stopping the clock (attributing async device work here)."""
        self.tic()
        try:
            yield
        finally:
            if sync is not None:
                import jax
                jax.block_until_ready(sync)
            self.toc(label)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"mean_ms": v.mean * 1e3, "max_ms": v.max * 1e3,
                    "last_ms": v.last * 1e3, "count": v.count}
                for k, v in self.stats.items()}

    def report(self) -> str:
        lines = [f"{'stage':<28}{'mean ms':>10}{'max ms':>10}{'count':>8}"]
        for k, v in sorted(self.stats.items()):
            lines.append(f"{k:<28}{v.mean * 1e3:>10.2f}{v.max * 1e3:>10.2f}"
                         f"{v.count:>8}")
        return "\n".join(lines)

    def reset(self) -> None:
        self.stats.clear()
        self._stack.clear()


GLOBAL = Stopwatch()
tic = GLOBAL.tic
toc = GLOBAL.toc
scope = GLOBAL.scope
