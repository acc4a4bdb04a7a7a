"""Logging + statistics counters.

Parity with the reference's Logger (logger.h, five levels ETrace..EError,
formatter.h:28) and StatsCounter registry (statistics.h:55-351). On TPU the
per-thread atomic counter slots become plain host-side counters updated
around device calls (device-side statistics ride in integrator AOVs).
"""
from __future__ import annotations

import logging
import sys
import time
from collections import defaultdict
from dataclasses import dataclass, field

TRACE = 5
logging.addLevelName(TRACE, "TRACE")

_logger = logging.getLogger("mitsuba_tpu")
if not _logger.handlers:
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s mitsuba_tpu: %(message)s", "%H:%M:%S")
    )
    _logger.addHandler(h)
    _logger.setLevel(logging.INFO)


def get_logger() -> logging.Logger:
    return _logger


def set_log_level(level) -> None:
    _logger.setLevel(level)


# --- statistics (statistics.h analog) --------------------------------------

E_NUMBER = 0
E_BYTES = 1
E_PERCENTAGE = 2
E_AVERAGE = 3
E_MINMAX = 4


@dataclass
class StatsCounter:
    name: str
    category: str
    kind: int = E_NUMBER
    value: float = 0.0
    base: float = 0.0
    vmin: float = float("inf")
    vmax: float = float("-inf")

    def incr(self, amount: float = 1.0, base: float = 0.0) -> None:
        self.value += amount
        self.base += base
        self.vmin = min(self.vmin, amount)
        self.vmax = max(self.vmax, amount)


class Statistics:
    """Global registry (Statistics::getInstance analog)."""

    _counters: dict = {}

    @classmethod
    def counter(cls, category: str, name: str, kind: int = E_NUMBER) -> StatsCounter:
        key = (category, name)
        if key not in cls._counters:
            cls._counters[key] = StatsCounter(name=name, category=category, kind=kind)
        return cls._counters[key]

    @classmethod
    def reset(cls) -> None:
        cls._counters.clear()

    @classmethod
    def print_stats(cls, out=None) -> str:
        """statistics.h:351 printStats analog."""
        out = out or sys.stderr
        by_cat = defaultdict(list)
        for (cat, _), c in sorted(cls._counters.items()):
            by_cat[cat].append(c)
        lines = ["  * Statistics:"]
        for cat, cs in by_cat.items():
            lines.append(f"    - {cat}:")
            for c in cs:
                if c.kind == E_PERCENTAGE and c.base > 0:
                    lines.append(f"        {c.name}: {100.0 * c.value / c.base:.2f}%")
                elif c.kind == E_AVERAGE and c.base > 0:
                    lines.append(f"        {c.name}: {c.value / c.base:.4g} avg")
                elif c.kind == E_BYTES:
                    lines.append(f"        {c.name}: {c.value / 1e6:.2f} MB")
                else:
                    lines.append(f"        {c.name}: {c.value:.6g}")
        text = "\n".join(lines)
        print(text, file=out)
        return text


class ProgressReporter:
    """Console progress with ETA (ProgressReporter, statistics.h)."""

    def __init__(self, title: str, total: int, quiet: bool = False):
        self.title = title
        self.total = max(total, 1)
        self.done = 0
        self.t0 = time.time()
        self.quiet = quiet

    def update(self, done: int) -> None:
        self.done = done
        if self.quiet:
            return
        frac = self.done / self.total
        elapsed = time.time() - self.t0
        eta = elapsed / max(frac, 1e-9) * (1 - frac)
        bar = "#" * int(32 * frac)
        sys.stderr.write(
            f"\r{self.title}: [{bar:<32}] {100 * frac:5.1f}% "
            f"({elapsed:.1f}s, ETA {eta:.1f}s)"
        )
        if self.done >= self.total:
            sys.stderr.write("\n")
        sys.stderr.flush()
