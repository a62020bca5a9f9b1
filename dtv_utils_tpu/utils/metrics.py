"""Structured metrics with human/machine duality.

The reference's only machine-readable mode is ``papr -g`` bare numbers
(papr.c:163-190) and ``xport -s`` suppressing rate spam for piping
(xport.c:86).  This module generalizes the pattern: every metric goes to a
JSON-lines sink (stdout by default) AND, unless suppressed, a human line on
stderr — so output stays pipeable while stays readable.
"""

from __future__ import annotations

import json
import sys
import time
import typing
from dataclasses import dataclass, field


@dataclass
class Metrics:
    """Emit {"metric": name, "value": v, "unit": u, ...} JSON lines."""
    # real dataclass fields (annotated) so sinks are per-instance
    # constructor-configurable; default_factory defers the sys.std* lookup
    # to construction time, keeping stdout/stderr redirects working.
    json_out: typing.TextIO = field(default_factory=lambda: sys.stdout)
    human_out: typing.TextIO = field(default_factory=lambda: sys.stderr)
    suppress_human: bool = False
    _t0: float = field(default_factory=time.perf_counter)

    def emit(self, metric: str, value, unit: str = "", **extra) -> None:
        rec = {"metric": metric, "value": value}
        if unit:
            rec["unit"] = unit
        rec.update(extra)
        print(json.dumps(rec), file=self.json_out, flush=True)
        if not self.suppress_human:
            tail = " ".join(f"{k}={v}" for k, v in extra.items())
            print(f"[{time.perf_counter() - self._t0:8.3f}s] "
                  f"{metric} = {value} {unit} {tail}".rstrip(),
                  file=self.human_out)


@dataclass
class Throughput:
    """Streaming samples/s (or bytes/s) meter for the modulator CLIs."""
    unit: str = "samples"
    _n: int = 0
    _t0: float = field(default_factory=time.perf_counter)

    def add(self, n: int) -> None:
        self._n += n

    @property
    def per_second(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._n / dt if dt > 0 else 0.0

    def report(self, metrics: Metrics, name: str) -> None:
        metrics.emit(name, round(self.per_second / 1e6, 3),
                     unit=f"M{self.unit}/s", total=self._n)
