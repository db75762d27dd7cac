"""Standalone masked-train-step timing (the bench's train_step_masked
entry), run as a SUBPROCESS by bench.py: on this endpoint, executing the
masked step's program in a process that already ran the dense train
programs deterministically kills the backend with an opaque
InvalidArgument (tools/probe_r4_c512.py and /tmp repro scripts; masked
FIRST in a fresh process always works). The train path is pure XLA — a
fresh process costs one cached compile, not a Mosaic warmup.

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
    from vxtpu.engine.sharding import (camera_frame_rays,
                                       compute_mask_bounds, make_mesh,
                                       make_sharded_train_step,
                                       render_soft_image_sharded)
    from vxtpu.render.occmask import (mask_distance_field,
                                      occupancy_mask_from_soft)
    from vxtpu.render.settings import RenderSettings
    from vxtpu.render.soft import SoftGrid
    from vxtpu.world import procgen
    from vxtpu.world.lights import Lights

    dims = (128, 128, 128)
    H = W = 256
    G = 4
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((25.0, -38.0, 180.0), intensity=2.0)
    mesh = make_mesh(1)
    truth = SoftGrid.from_hard(procgen.terrain(dims, seed=7, with_rgb=True),
                               sigma_solid=25.0)
    cam = Camera.make(pos=(-90.0, 64.0, 140.0),
                      fov_y_deg=55.0).look_at((64.0, 64.0, 35.0))
    target = render_soft_image_sharded(truth, cam, settings, H, W, 64,
                                       mesh, lights=lights).reshape(-1, 3)
    o_c, d_c = camera_frame_rays(cam, H, W)
    soft = SoftGrid(sigma_raw=truth.sigma_raw * 0.8,
                    rgb_raw=truth.rgb_raw * 0.8)
    mask = occupancy_mask_from_soft(soft, G, tau=0.01, dilate=1)
    mdf = mask_distance_field(mask)

    init_fn, step_fn = make_sharded_train_step(
        settings, 16, mesh, optimize_camera=True, lights=lights,
        use_custom_vjp=True, use_mask=True, mask_scale=G)
    opt = init_fn(soft, cam)
    c = cam
    b0, b1 = compute_mask_bounds(mask, mdf, c, o_c, d_c, G)
    s2, c, opt, loss = step_fn(soft, c, opt, o_c, d_c, target, mask, b0, b1)
    jax.block_until_ready(s2)
    float(loss)
    # second warm call: the first output's device-committed arrays change
    # the arg signature once and force a retrace (probe_r5_step_out.json);
    # steady state starts at call 3
    b0, b1 = compute_mask_bounds(mask, mdf, c, o_c, d_c, G)
    s2, c, opt, loss = step_fn(s2, c, opt, o_c, d_c, target, mask, b0, b1)
    jax.block_until_ready(s2)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(2):
        # per-step bounds from the updated camera (the real training loop)
        b0, b1 = compute_mask_bounds(mask, mdf, c, o_c, d_c, G)
        s2, c, opt, loss = step_fn(s2, c, opt, o_c, d_c, target, mask,
                                   b0, b1)
        jax.block_until_ready(s2)
    float(loss)
    dt = (time.perf_counter() - t0) / 2
    print(json.dumps(dict(
        ms=round(dt * 1e3, 1), dims=dims, rays=H * W, samples=16,
        mask_scale=G,
        mask_occupied_frac=round(float(jnp.mean(mask.astype(jnp.float32))),
                                 4),
        lit=True, custom_vjp=True, loss=float(loss))))


if __name__ == "__main__":
    main()
