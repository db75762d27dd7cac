"""Bisect the wavefront round-1 cost (458 of 540 ms at 512^3/1080p).

Same force-retire trick as probe_rounds.py (max_steps == round budget), with
knob variants: inner chunk size (while-loop any-reduce overhead), jumps off
(jump arithmetic share), halved steps (per-step share), halved buffer
(width share).
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

    B = 1152 * 1024
    for name, sched, ms, chunk, jumps in [
        ("base", ((B, 8),), 8, 4, True),
        ("chunk8", ((B, 8),), 8, 8, True),
        ("nojump", ((B, 8),), 8, 4, False),
        ("k4", ((B, 4),), 4, 4, True),
        ("k1", ((B, 1),), 1, 1, True),
        ("b_half", ((B // 2, 8),), 8, 4, True),
    ]:
        @jax.jit
        def f(o, d, df, eps, sched=sched, ms=ms, chunk=chunk, jumps=jumps):
            rec = march_wavefront(o, d + eps * 1e-12, df, dims, ms,
                                  schedule=sched, inner_chunk=chunk,
                                  use_jumps=jumps)
            return jnp.sum(rec.t * rec.hit) + jnp.sum(rec.steps)

        out[name] = round(chain_time(f, (o, d, df_flat)) * 1e3, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
