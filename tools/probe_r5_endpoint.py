"""Characterize today's ~2x endpoint slowdown (probe_r5_regress: the SAME
march config measures 46.5 ms in one session and ~96 ms in another, at
every commit). Distinguish per-dispatch overhead from kernel-throughput
slowdown: time the march at 1080p vs a tiny 128x256 image (tiny kernel
~1 ms of real work — if it still costs tens of ms/call, the gap is
dispatch RTT; if it scales with work, the chip itself is slower this
session), plus the fused frame for comparison with the committed bench.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r5_endpoint.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.fused import render_rays_fused
from vxtpu.render.kernel_pallas_v2 import PackedMorton, march_pallas_v2
from vxtpu.render.settings import RenderSettings
from vxtpu.world import procgen
from vxtpu.world.lights import Lights
from vxtpu.world.packed import build_material_morton, build_packed_morton

DIMS = (512, 512, 512)
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r5_endpoint_out.json")


def chain(f, args, iters=4):
    dep = jnp.float32(0.0)
    t0 = time.perf_counter()
    dep = f(*args, dep)
    float(dep)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        dep = f(*args, dep)
    float(dep)
    return (time.perf_counter() - t0) / iters, cs


def main():
    res = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            res = json.load(fh)
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    mats = build_material_morton(grid.occupancy)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    max_steps = sum(DIMS) + 2
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((100.0, -150.0, 700.0), intensity=2.0)

    def save(name, entry):
        res[name] = entry
        with open(OUT, "w") as fh:
            json.dump(res, fh, indent=1)
        print(name, entry, flush=True)

    for name, (h, w) in dict(march_1080p=(1080, 1920),
                             march_tiny=(128, 256)).items():
        o, d = generate_rays(cam, h, w)

        @jax.jit
        def f(words, oo, dd, dep):
            oo = oo.at[0, 0].add(dep * 1e-12)
            rec = march_pallas_v2(oo, dd, PackedMorton(words=words), DIMS,
                                  max_steps, image_shape=(h, w),
                                  window=512, block_shape=(32, 32),
                                  split_window=True, local_advance=True,
                                  unroll=2)
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6

        dt, cs = chain(f, (accel.words, o, d))
        save(name, dict(ms=round(dt * 1e3, 2), compile_s=round(cs, 1),
                        mrays=round(h * w / dt / 1e6, 3)))

    o, d = generate_rays(cam, 1080, 1920)

    @jax.jit
    def frame(words, mw, oo, dd, dep):
        oo = oo.at[0, 0].add(dep * 1e-12)
        rgb, _ = render_rays_fused(oo, dd, PackedMorton(words=words),
                                   mw, DIMS, lights, settings,
                                   image_shape=(1080, 1920))
        return jnp.sum(rgb) * 1e-7

    dt, cs = chain(frame, (accel.words, mats, o, d))
    save("fused_1080p", dict(ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                             mrays=round(1080 * 1920 / dt / 1e6, 3)))


if __name__ == "__main__":
    main()
