"""Decompose the flagship wavefront frame (512³ @ 1080p) on the bench
endpoint: march-only vs shaded-frame timing, hand-tuned vs valid_count-
adaptive schedule, outside vs inside-the-grid camera, plus the stats=True
execution counters (rounds, steps, gathered lanes) that feed the roofline
model in bench.py.

Writes tools/probe_wf_out.json.
"""

from __future__ import annotations

import json
import time

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import functools

import jax
import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_wavefront import (count_valid_rays, march_wavefront,
                                           make_march_wavefront)
from vxtpu.render.pipeline import render_image
from vxtpu.render.settings import RenderSettings
from vxtpu.world import distfield, procgen
from vxtpu.world.lights import Lights

DIMS = (512, 512, 512)
H, W = 1080, 1920
HAND = ((1152 * 1024, 8), (192 * 1024, 16), (48 * 1024, 40))


def chain_time(fn, args, iters=3):
    dep = jnp.float32(0.0)
    dep = fn(*args, dep)
    float(dep)
    t0 = time.perf_counter()
    for _ in range(iters):
        dep = fn(*args, dep)
    float(dep)
    return (time.perf_counter() - t0) / iters


def main():
    out = {}
    grid = procgen.terrain(DIMS, seed=7)
    accel = distfield.build(grid.occupancy, cap=96)
    df_flat_host = accel.field.reshape(-1)
    cam_out = Camera.make(pos=(-360.0, 256.0, 560.0),
                          fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    cam_in = Camera.make(pos=(256.0, 256.0, 200.0),
                         fov_y_deg=70.0).look_at((500.0, 256.0, 60.0))
    max_steps = sum(DIMS) + 2

    def march_dep(schedule, vc=None):
        @jax.jit
        def f(o, d, df_flat, dep):
            o = o.at[0, 0].add(dep * 1e-12)
            rec = march_wavefront(o, d, df_flat, DIMS, max_steps,
                                  schedule=schedule, valid_count=vc)
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6
        return f

    for name, cam in (("outside", cam_out), ("inside", cam_in)):
        o, d = generate_rays(cam, H, W)
        vc = count_valid_rays(o, d, DIMS)
        out[f"{name}_valid"] = vc
        print(json.dumps({f"{name}_valid": vc}), flush=True)

        t_hand = chain_time(march_dep(HAND), (o, d, df_flat_host))
        out[f"{name}_march_hand_ms"] = round(t_hand * 1e3, 1)
        print(json.dumps({f"{name}_march_hand_ms": out[f"{name}_march_hand_ms"]}),
              flush=True)
        t_auto = chain_time(march_dep(None, vc), (o, d, df_flat_host))
        out[f"{name}_march_auto_ms"] = round(t_auto * 1e3, 1)
        print(json.dumps({f"{name}_march_auto_ms": out[f"{name}_march_auto_ms"]}),
              flush=True)
        n = o.shape[0]
        id4 = ((n, 4), (max(1024, -(-vc // 3 // 1024) * 1024), 12),
               (max(1024, -(-vc // 40 // 1024) * 1024), 40))
        t_id4 = chain_time(march_dep(id4), (o, d, df_flat_host))
        out[f"{name}_march_id4_ms"] = round(t_id4 * 1e3, 1)
        print(json.dumps({f"{name}_march_id4_ms": out[f"{name}_march_id4_ms"]}),
              flush=True)

        # execution counters (drives the roofline gathered-lane model)
        @jax.jit
        def stats_fn(o, d, df_flat, vc=vc):
            rec, st = march_wavefront(o, d, df_flat, DIMS, max_steps,
                                      valid_count=vc, stats=True)
            return (st["valid"], jnp.stack(st["round_steps"]),
                    jnp.stack(st["round_counts"]), st["drain_rounds"],
                    st["drain_steps_total"], st["gathered_lanes"])
        v, rs, rc, dr, dst, lanes = [x.tolist() for x in
                                     jax.block_until_ready(
                                         stats_fn(o, d, df_flat_host))]
        out[f"{name}_stats"] = dict(valid=v, round_steps=rs, round_counts=rc,
                                    drain_rounds=dr, drain_steps_total=dst,
                                    gathered_lanes=lanes)
        print(json.dumps({f"{name}_stats": out[f"{name}_stats"]}), flush=True)

    # shaded full frame (the bench path) for march-vs-shade split
    settings = RenderSettings(shading="lambert", step_chunk=8)
    lights = Lights.single((100.0, -150.0, 700.0), intensity=2.0)
    factory = functools.partial(make_march_wavefront, schedule=HAND)

    @jax.jit
    def frame(g, a, dep):
        cam = cam_out.replace(yaw=cam_out.yaw + dep * 1e-9)
        img = render_image(factory, g, cam, lights, settings, H, W, a)
        return jnp.mean(img)

    t_frame = chain_time(frame, (grid, accel))
    out["outside_frame_shaded_ms"] = round(t_frame * 1e3, 1)
    print(json.dumps({"outside_frame_shaded_ms": out["outside_frame_shaded_ms"]}),
          flush=True)

    with open("tools/probe_wf_out.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote tools/probe_wf_out.json", flush=True)


if __name__ == "__main__":
    main()
