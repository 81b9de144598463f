"""Profiling hooks: named pass scopes, device trace capture, pass timers.

The reference instruments every phase with Superluminal markers
(yuki/src/app/window.rs:212-244, yuki/src/bvh.rs:44-111, profiling
feature gates in Cargo.toml).  The TPU-native equivalents:

  * ``pass_scope(name)`` — ``jax.named_scope``: zero-cost HLO metadata so
    ops inside jitted graphs are attributed to render passes in XLA/
    jax.profiler traces (trace -> shade -> occlusion show up by name in
    the trace viewer instead of one opaque fusion soup).
  * ``device_trace(dir)`` — ``jax.profiler.trace`` capture around a
    region; view with tensorboard or xprof.  Wired to the headless CLI's
    ``--profile=DIR`` flag.
  * ``PassTimer`` — host-side wall-clock aggregation per named phase
    (scene load, BVH build, per-wave dispatch), the moral equivalent of
    the reference's scoped timers (bvh.rs:91-109 logs build+flatten).

All three are always-on-cheap: named scopes are trace-time only, the
timer is two ``time.monotonic`` calls, and device traces only run when a
directory is given.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Iterator

_log = logging.getLogger("yuki")


def pass_scope(name: str):
    """Name a render pass inside a jitted graph (profiler attribution)."""
    import jax

    return jax.named_scope(name)


@contextlib.contextmanager
def device_trace(trace_dir: str | None) -> Iterator[None]:
    """Capture a jax.profiler device trace into trace_dir (no-op when
    None).  View with `tensorboard --logdir trace_dir` or xprof."""
    if not trace_dir:
        yield
        return
    import jax

    _log.info("profiler: capturing device trace to %s", trace_dir)
    with jax.profiler.trace(trace_dir):
        yield
    _log.info("profiler: trace written to %s", trace_dir)


class PassTimer:
    """Accumulates wall time per named phase; logs a summary on demand.

    >>> t = PassTimer()
    >>> with t.phase("bvh build"): build()
    >>> t.summary()  # 'bvh build: 1 call, 12.3 ms total'
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = [
            f"{name}: {self.counts[name]} call(s), "
            f"{self.totals[name] * 1e3:.1f} ms total"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "\n".join(lines)

    def log_summary(self, header: str = "pass timings"):
        if self.totals:
            _log.info("%s:\n%s", header, self.summary())
