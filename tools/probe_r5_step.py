"""Per-step timing decomposition of the field-kernel train step: is the
45 s/step figure real compute or a retrace/recompile per call?

Prints each step's wall time + the jit cache size, then times the pieces
(plain forward, plain value_and_grad) outside shard_map.

Writes tools/probe_r5_step_out.json.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r5_step.py
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
from vxtpu.engine.sharding import (camera_frame_rays, make_mesh,
                                   make_sharded_train_step)
from vxtpu.camera.rays import generate_rays
from vxtpu.render.settings import RenderSettings
from vxtpu.render.soft import SoftGrid
from vxtpu.render.soft_pallas import MortonSoftGrid, render_soft_rays_pallas
from vxtpu.world import procgen
from vxtpu.world.lights import Lights

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r5_step_out.json")
RES = {}


def save(name, entry):
    RES[name] = entry
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(name, entry, flush=True)


def main():
    dims = (128, 128, 128)
    H = W = 256
    S = 64
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((25.0, -38.0, 180.0), intensity=2.0)
    cam = Camera.make(pos=(-90.0, 64.0, 140.0),
                      fov_y_deg=55.0).look_at((64.0, 64.0, 35.0))
    msoft = MortonSoftGrid.from_soft(SoftGrid.zeros(dims))
    o, d = generate_rays(cam, H, W)
    target = jnp.zeros((H * W, 3), jnp.float32) + 0.3

    # ---- plain forward
    @jax.jit
    def fwd(ms, o, d, dep):
        o = o.at[0, 0].add(dep * 1e-12)
        c = render_soft_rays_pallas(ms, o, d, settings, S, lights=lights,
                                    image_shape=(H, W), window=64)
        return jnp.sum(c) * 1e-6

    dep = jnp.float32(0.0)
    t0 = time.perf_counter()
    dep = fwd(msoft, o, d, dep)
    float(dep)
    cs = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        dep = fwd(msoft, o, d, jnp.float32(float(dep) * 1e-9))
        float(dep)
        ts.append(round((time.perf_counter() - t0) * 1e3, 1))
    save("plain_fwd", dict(compile_s=round(cs, 1), step_ms=ts))

    # ---- plain value_and_grad
    @jax.jit
    def vg(ms, o, d, dep):
        o = o.at[0, 0].add(dep * 1e-12)

        def lf(m):
            c = render_soft_rays_pallas(m, o, d, settings, S,
                                        lights=lights,
                                        image_shape=(H, W), window=64)
            return jnp.mean((c - target) ** 2)

        loss, g = jax.value_and_grad(lf)(ms)
        return loss + jnp.sum(g.sigma_tab) * 1e-9

    dep = jnp.float32(0.0)
    t0 = time.perf_counter()
    dep = vg(msoft, o, d, dep)
    float(dep)
    cs = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        dep = vg(msoft, o, d, jnp.float32(float(dep) * 1e-9))
        float(dep)
        ts.append(round((time.perf_counter() - t0) * 1e3, 1))
    save("plain_grad", dict(compile_s=round(cs, 1), step_ms=ts))

    # ---- the sharded step, per-call timings
    mesh = make_mesh(1)
    o_c, d_c = camera_frame_rays(cam, H, W)
    init_fn, step_fn = make_sharded_train_step(
        settings, S, mesh, optimize_camera=True, grad_buckets=1,
        lights=lights, field_kernel=True, field_window=64,
        field_image_shape=(H, W))
    opt_state = init_fn(msoft, cam)
    c = cam
    s2 = msoft
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        s2, c, opt_state, loss = step_fn(s2, c, opt_state, o_c, d_c,
                                         target)
        jax.block_until_ready(s2)
        ts.append(round(time.perf_counter() - t0, 2))
    save("sharded_step_s", dict(per_call=ts))


if __name__ == "__main__":
    main()
