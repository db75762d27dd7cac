"""Stage split at the flagship 512^3/1080p frame: ray-gen / march-only /
march+shade, on the bench device. Chained timing (see tools/microbench.py).
"""

from __future__ import annotations

import functools
import json
import time

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_wavefront import make_march_wavefront, march_wavefront
from vxtpu.render.pipeline import render_image
from vxtpu.render.settings import RenderSettings
from vxtpu.world import distfield, procgen
from vxtpu.world.lights import Lights

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
    settings = RenderSettings(shading="lambert", step_chunk=8)
    lights = Lights.single((100.0, -150.0, 700.0), intensity=2.0)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0), fov_y_deg=55.0).look_at(
        (256.0, 256.0, 140.0))
    ms = 512 * 3 + 2
    out = {}

    @jax.jit
    def raygen_only(eps):
        o, d = generate_rays(cam.replace(yaw=cam.yaw + eps * 1e-6), H, W)
        return jnp.sum(o) + jnp.sum(d)

    out["raygen_ms"] = round(chain_time(raygen_only, ()) * 1e3, 1)
    print(json.dumps(out), flush=True)

    @jax.jit
    def march_only(f, eps):
        o, d = generate_rays(cam.replace(yaw=cam.yaw + eps * 1e-6), H, W)
        rec = march_wavefront(o, d, f, dims, ms, schedule=SCHED)
        return jnp.sum(rec.t * rec.hit) + jnp.sum(rec.steps)

    out["march_ms"] = round(chain_time(march_only, (df_flat,)) * 1e3, 1)
    print(json.dumps(out), flush=True)

    factory = functools.partial(make_march_wavefront, schedule=SCHED)

    @jax.jit
    def full(g, acc, eps):
        c = cam.replace(yaw=cam.yaw + eps * 1e-6)
        img = render_image(factory, g, c, lights, settings, H, W, acc)
        return jnp.mean(img)

    out["full_ms"] = round(chain_time(full, (grid, accel)) * 1e3, 1)
    print(json.dumps(out), flush=True)

    # flat shading = no albedo gather, no light math: isolates shade cost
    s_flat = RenderSettings(shading="flat", step_chunk=8)

    @jax.jit
    def full_flat(g, acc, eps):
        c = cam.replace(yaw=cam.yaw + eps * 1e-6)
        img = render_image(factory, g, c, lights, s_flat, H, W, acc)
        return jnp.mean(img)

    out["full_flat_ms"] = round(chain_time(full_flat, (grid, accel)) * 1e3, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
