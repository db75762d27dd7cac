"""Performance metrics: fps and Mrays/s/chip — the judged metric
(BASELINE.json: "Mrays/s/chip at 512³ grid, 1080p") — plus march-step
statistics. The reference analog is the SFML fps-counter overlay
(SURVEY.md §3 C15); here metrics go to stdout/JSONL so headless benches and
the driver can consume them.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

import jax


def mrays_per_s(height: int, width: int, frame_s: float) -> float:
    return height * width / frame_s / 1e6


@dataclass
class MetricsSink:
    """JSONL + stdout metric emission (host 0 only by default)."""

    path: str | None = None
    echo: bool = True
    _t0: float = field(default_factory=time.time)

    def emit(self, **kv):
        rec = dict(t=round(time.time() - self._t0, 3), **kv)
        line = json.dumps(rec)
        if self.echo:
            try:
                if jax.process_index() == 0:
                    print(line, flush=True)
            except Exception:
                print(line, flush=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
