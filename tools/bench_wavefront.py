"""Device A/B: current XLA df-march vs wavefront march at the flagship
512^3 / 1080p config. Chained + host-synced timing (see tools/microbench.py).
"""

from __future__ import annotations

import json
import sys
import time

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.render.kernel_wavefront import make_march_wavefront
from vxtpu.render.kernel_xla import make_march_xla
from vxtpu.render.pipeline import render_image
from vxtpu.render.settings import RenderSettings
from vxtpu.world import distfield, procgen
from vxtpu.world.lights import Lights


def timed_frames(frame, grid, accel, n=4):
    img, dep = frame(grid, accel, jnp.float32(0.0))
    jax.block_until_ready(img)
    float(dep)
    t0 = time.perf_counter()
    for _ in range(n):
        img, dep = frame(grid, accel, dep)
    float(dep)
    return (time.perf_counter() - t0) / n


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    dims = (512, 512, 512)
    H, W = 1080, 1920
    grid = procgen.terrain(dims, seed=7)
    accel = distfield.build(grid.occupancy, cap=96)
    settings = RenderSettings(shading="lambert", step_chunk=8)
    lights = Lights.single((100.0, -150.0, 700.0), intensity=2.0)
    base_cam = Camera.make(pos=(-360.0, 256.0, 560.0), fov_y_deg=55.0).look_at(
        (256.0, 256.0, 140.0))

    def make_frame(factory):
        @jax.jit
        def frame(g, acc, eps):
            cam = base_cam.replace(yaw=base_cam.yaw + eps * 1e-6)
            img = render_image(factory, g, cam, lights, settings, H, W, acc)
            return img, jnp.mean(img)
        return frame

    results = {}
    if which in ("both", "xla"):
        dt = timed_frames(make_frame(make_march_xla), grid, accel)
        results["xla_df"] = dict(ms=round(dt * 1e3, 1),
                                 mrays=round(H * W / dt / 1e6, 3))
        print(json.dumps(results["xla_df"]), flush=True)

    if which in ("both", "wavefront"):
        import functools
        schedules = {
            "default": None,
            "s2": ((1280 * 1024, 6), (320 * 1024, 12), (80 * 1024, 24),
                   (24 * 1024, 48)),
            "s3": ((1152 * 1024, 8), (192 * 1024, 16), (48 * 1024, 40)),
        }
        for name, sched in schedules.items():
            fac = functools.partial(make_march_wavefront, schedule=sched)
            dt = timed_frames(make_frame(fac), grid, accel)
            results[f"wf_{name}"] = dict(ms=round(dt * 1e3, 1),
                                         mrays=round(H * W / dt / 1e6, 3))
            print(json.dumps({name: results[f"wf_{name}"]}), flush=True)

    with open("tools/bench_wavefront_out.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()


def probe():
    """Stage breakdown: march-only vs full render; per-round active counts."""
    import functools
    import numpy as np
    from vxtpu.render.kernel_wavefront import march_wavefront
    dims = (512, 512, 512)
    H, W = 1080, 1920
    grid = procgen.terrain(dims, seed=7)
    accel = distfield.build(grid.occupancy, cap=96)
    df_flat = accel.field.reshape(-1)
    base_cam = Camera.make(pos=(-360.0, 256.0, 560.0), fov_y_deg=55.0).look_at(
        (256.0, 256.0, 140.0))
    from vxtpu.camera.rays import generate_rays
    o, d = generate_rays(base_cam, H, W)
    ms = 512 * 3 + 2

    # steps histogram + active-after-k-steps (via steps field of the ref march)
    from vxtpu.render.kernel_xla import march_xla_df
    rec = jax.jit(functools.partial(march_xla_df, dims=dims, max_steps=ms))(
        o, d, df_flat)
    steps = np.asarray(rec.steps)
    hit = np.asarray(rec.hit)
    print("steps percentiles:", {p: int(np.percentile(steps, p))
                                 for p in (50, 75, 90, 99, 99.9, 100)},
          "hit_frac:", round(float(hit.mean()), 3), flush=True)
    t_enter, t_exit, valid = None, None, None

    sched = ((1152 * 1024, 8), (192 * 1024, 16), (48 * 1024, 40))

    @jax.jit
    def march_only(o, d, f, eps):
        rec = march_wavefront(o + eps * 1e-9, d, f, dims, ms, schedule=sched)
        return jnp.sum(rec.t * jnp.isfinite(rec.t)) + jnp.sum(rec.steps)

    dep = jnp.float32(0.0)
    dep = march_only(o, d, df_flat, dep); float(dep)
    t0 = time.perf_counter()
    for _ in range(3):
        dep = march_only(o, d, df_flat, dep)
    float(dep)
    print({"march_only_ms": round((time.perf_counter() - t0) / 3 * 1e3, 1)},
          flush=True)

    # single-round-only timings (drain disabled via huge drain_buf trick:
    # schedule covers everything, drain runs 0 rounds when none active...
    # instead: measure cumulative prefixes of the schedule)
    for k in range(1, 4):
        sub = sched[:k]

        @jax.jit
        def mo(o, d, f, eps, sub=sub):
            rec = march_wavefront(o + eps * 1e-9, d, f, dims, ms,
                                  schedule=sub, drain_buf=2048,
                                  drain_steps=4)
            # NOTE: drain still runs to completion; to isolate, cap rounds
            return jnp.sum(rec.steps)

        # count actives instead: how many rays remain after prefix k
        # (cheap proxy: rays with steps==cap are unfinished)
        pass

    # active counts after each round: rerun with modified return
    from vxtpu.render import kernel_wavefront as kw
    print("DONE probe", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "probe":
    probe()
