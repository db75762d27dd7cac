"""Per-round cost split of the wavefront march at 512^3/1080p.

Trick: with max_steps == the schedule's cumulative step budget, every ray
still alive at the end of round k is force-retired (steps >= max_steps), so
the drain loop runs zero rounds and T(prefix_k) - T(prefix_{k-1}) is round
k's cost.
"""

from __future__ import annotations

import json
import time

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_wavefront import march_wavefront
from vxtpu.world import distfield, procgen

SCHED = ((1152 * 1024, 8), (192 * 1024, 16), (48 * 1024, 40))


def chain_time(fn, args, n=3):
    dep = jnp.float32(0.0)
    dep = fn(*args, dep)
    float(dep)
    t0 = time.perf_counter()
    for _ in range(n):
        dep = fn(*args, dep)
    float(dep)
    return (time.perf_counter() - t0) / n


def main():
    dims = (512, 512, 512)
    H, W = 1080, 1920
    grid = procgen.terrain(dims, seed=7)
    accel = distfield.build(grid.occupancy, cap=96)
    df_flat = accel.field.reshape(-1)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0), fov_y_deg=55.0).look_at(
        (256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W)
    out = {}

    # init-only: empty schedule + max_steps so small the drain retires
    # everyone in one tiny round
    for name, sched, ms in [
        ("r1", SCHED[:1], 8),
        ("r12", SCHED[:2], 24),
        ("r123", SCHED[:3], 64),
        ("full", SCHED, 512 * 3 + 2),
    ]:
        @jax.jit
        def f(o, d, df, eps, sched=sched, ms=ms):
            rec = march_wavefront(o, d + eps * 1e-12, df, dims, ms,
                                  schedule=sched)
            return jnp.sum(rec.t * rec.hit) + jnp.sum(rec.steps)

        out[name] = round(chain_time(f, (o, d, df_flat)) * 1e3, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
