"""Standalone field-kernel train-step timing (the bench's
train_step_field entry), run as a SUBPROCESS by bench.py — same isolation
policy as bench_train_masked.py (mixing program families in one process
has tripped endpoint backend faults; a fresh process costs one cached
compile).

The step trains a MortonSoftGrid through the Pallas field-sampling
kernel pair (render/kernel_sample.py) inside the sharded train step —
the contract's "custom VJP backward kernel" running under ray sharding.
Timing starts at call 3: the first output's device-committed arrays
change the arg signature once, forcing a second trace
(tools/probe_r5_step_out.json: per_call [73s, 72s, 1.0s, 1.0s]).

Prints one JSON line."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vxtpu.engine.platform import enable_compilation_cache


def main():
    enable_compilation_cache()
    from vxtpu.camera.camera import Camera
    from vxtpu.engine.sharding import (camera_frame_rays, make_mesh,
                                       make_sharded_train_step,
                                       render_soft_image_sharded)
    from vxtpu.render.settings import RenderSettings
    from vxtpu.render.soft import SoftGrid
    from vxtpu.render.soft_pallas import MortonSoftGrid
    from vxtpu.world import procgen
    from vxtpu.world.lights import Lights

    dims = (128, 128, 128)
    H = W = 256
    samples = 64
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((25.0, -38.0, 180.0), intensity=2.0)
    mesh = make_mesh(1)
    truth = SoftGrid.from_hard(procgen.terrain(dims, seed=7, with_rgb=True),
                               sigma_solid=25.0)
    cam = Camera.make(pos=(-90.0, 64.0, 140.0),
                      fov_y_deg=55.0).look_at((64.0, 64.0, 35.0))
    target = render_soft_image_sharded(truth, cam, settings, H, W, samples,
                                       mesh, lights=lights).reshape(-1, 3)
    o_c, d_c = camera_frame_rays(cam, H, W)
    msoft = MortonSoftGrid.from_soft(SoftGrid.zeros(dims))

    init_fn, step_fn = make_sharded_train_step(
        settings, samples, mesh, optimize_camera=True, grad_buckets=1,
        lights=lights, field_kernel=True, field_window=128,
        field_image_shape=(H, W))
    opt = init_fn(msoft, cam)
    c = cam
    s2, c, opt, loss = step_fn(msoft, c, opt, o_c, d_c, target)
    jax.block_until_ready(s2)
    float(loss)
    s2, c, opt, loss = step_fn(s2, c, opt, o_c, d_c, target)
    jax.block_until_ready(s2)
    t0 = time.perf_counter()
    for _ in range(2):
        s2, c, opt, loss = step_fn(s2, c, opt, o_c, d_c, target)
        jax.block_until_ready(s2)
    float(loss)
    dt = (time.perf_counter() - t0) / 2
    print(json.dumps(dict(
        ms=round(dt * 1e3, 1), dims=dims, rays=H * W, samples=samples,
        lit=True, field_kernel=True, window=128, loss=float(loss))))


if __name__ == "__main__":
    main()
