"""Named accumulating timers.

TPU-native re-design of the reference's dual host/CUDA-event timer library
(pygcn/perf/dmk.py:6-117). The reference offers ``.h`` (host perf counter),
``.c`` (CUDA events) and ``.hc`` (both) context managers per named timer. On
TPU there is no user-visible event API; instead, device time is measured by
fencing with ``jax.block_until_ready`` around the host clock. So:

  * ``timers('name').h``  — raw host time (includes async dispatch only).
  * ``timers('name').d``  — device-fenced time: blocks on the provided
    output(s) before stopping the clock (the honest ms/iter number).

Reports mirror the reference's per-op table (gcn6.py:401-410).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax


class Timer:
    """Accumulating timer (ns resolution), like dmk.Timer (dmk.py:44-68)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.total_ns = 0
        self.count = 0
        self._t0: Optional[int] = None
        self._fence = None

    # context-manager protocol ------------------------------------------------
    def __enter__(self):
        self._t0 = time.perf_counter_ns()
        return self

    def __exit__(self, *exc):
        if self._fence is not None:
            jax.block_until_ready(self._fence)
            self._fence = None
        self.total_ns += time.perf_counter_ns() - self._t0
        self.count += 1
        self._t0 = None
        return False

    def fence(self, value):
        """Register output(s) to block on before the timer stops."""
        self._fence = value
        return value

    # accessors ---------------------------------------------------------------
    @property
    def total_ms(self) -> float:
        return self.total_ns / 1e6

    @property
    def avg_ms(self) -> float:
        return self.total_ms / self.count if self.count else 0.0

    def reset(self):
        self.total_ns = 0
        self.count = 0


class _Named:
    """Accessor returned by Timers(name): pick host vs device-fenced timing."""

    def __init__(self, host: Timer, dev: Timer):
        self.h = host
        self.d = dev


class Timers:
    """Dict of named host/device timer pairs (cf. dmk.Timers, dmk.py:6-42)."""

    def __init__(self):
        self._host: Dict[str, Timer] = {}
        self._dev: Dict[str, Timer] = {}

    def __call__(self, name: str) -> _Named:
        if name not in self._host:
            self._host[name] = Timer(name + ".h")
            self._dev[name] = Timer(name + ".d")
        return _Named(self._host[name], self._dev[name])

    def names(self):
        return list(self._host.keys())

    def reset(self, name: Optional[str] = None):
        if name is None:
            for t in self._host.values():
                t.reset()
            for t in self._dev.values():
                t.reset()
        else:
            self._host[name].reset()
            self._dev[name].reset()

    def report(self) -> str:
        lines = [f"{'timer':<16}{'calls':>8}{'host ms':>12}{'avg ms':>10}"
                 f"{'dev ms':>12}{'avg ms':>10}"]
        for name in self.names():
            h, d = self._host[name], self._dev[name]
            lines.append(
                f"{name:<16}{max(h.count, d.count):>8}{h.total_ms:>12.3f}"
                f"{h.avg_ms:>10.4f}{d.total_ms:>12.3f}{d.avg_ms:>10.4f}"
            )
        return "\n".join(lines)
