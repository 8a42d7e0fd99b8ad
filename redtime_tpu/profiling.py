"""Structured stage timing + profiler hooks.

The reference has no in-code tracing — only shell-level `date +%s` around
CAMB/redTime invocations (scripts/runRedTime:154-226) and compile-time debug
print switches (redTime.cc:59-61).  Here: a lightweight stage timer usable
as a context manager, and an optional wrapper around `jax.profiler.trace`
for device-level traces viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Dict, Optional


class StageTimer:
    """Accumulates wall-clock per named stage; blocks on jax arrays so
    device work is attributed to its stage."""

    def __init__(self, enabled: bool = True, stream=None):
        self.enabled = enabled
        self.stream = stream if stream is not None else sys.stderr
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            if self.enabled:
                print(f"# [timing] {name}: {dt:.3f}s", file=self.stream)

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"# [timing] {k}: {v:.3f}s ({v / total * 100:.0f}%)"
                 for k, v in sorted(self.times.items(),
                                    key=lambda kv: -kv[1])]
        lines.append(f"# [timing] total: {total:.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace context when log_dir is given, no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
