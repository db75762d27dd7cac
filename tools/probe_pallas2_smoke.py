"""Phase-isolating device smoke for the v2 Pallas kernel: times (a) packed
Morton table build, (b) Mosaic compile, (c) run — at an escalating ladder of
grid sizes / ray counts, printing a timestamped line after every phase, so a
hang is attributable to one phase instead of one 40-minute silence.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pallas2_smoke.py
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
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_pallas_v2 import march_pallas_v2
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed_morton

T0 = time.perf_counter()


def say(msg):
    print(f"[{time.perf_counter() - T0:8.1f}s] {msg}", flush=True)


def run_case(dim, h, w, window, out):
    dims = (dim, dim, dim)
    key = f"d{dim}_r{h}x{w}_w{window}"
    say(f"case {key}: terrain...")
    t0 = time.perf_counter()
    grid = procgen.terrain(dims, seed=7)
    grid.occupancy.block_until_ready()
    say(f"  terrain built ({time.perf_counter()-t0:.1f}s)")
    t0 = time.perf_counter()
    accel = build_packed_morton(grid.occupancy, cap=64)
    accel.words.block_until_ready()
    build_s = time.perf_counter() - t0
    say(f"  packed build {accel.rows} rows ({build_s:.1f}s)")

    cam = Camera.make(pos=(-0.7 * dim, 0.5 * dim, 1.1 * dim),
                      fov_y_deg=55.0).look_at(
                          (0.5 * dim, 0.5 * dim, 0.27 * dim))
    o, d = generate_rays(cam, h, w)
    max_steps = sum(dims) + 2

    @jax.jit
    def f(o, d, words, dep):
        o = o.at[0, 0].add(dep * 1e-12)
        rec = march_pallas_v2(o, d, type(accel)(words=words), dims,
                              max_steps, image_shape=(h, w), window=window)
        return (jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6,
                jnp.sum(rec.hit.astype(jnp.int32)),
                jnp.max(rec.steps))

    t0 = time.perf_counter()
    lowered = f.lower(o, d, accel.words, jnp.float32(0.0))
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    say(f"  compiled ({compile_s:.1f}s)")
    t0 = time.perf_counter()
    dep, hits, msteps = compiled(o, d, accel.words, jnp.float32(0.0))
    dep = float(dep)
    first_s = time.perf_counter() - t0
    say(f"  first run ({first_s:.2f}s) hits={int(hits)} max_steps={int(msteps)}")
    t0 = time.perf_counter()
    for i in range(2):
        dep2, hits, msteps = compiled(o, d, accel.words,
                                      jnp.float32(dep * 1e-9))
        dep = float(dep2)
    run_s = (time.perf_counter() - t0) / 2
    mrays = h * w / run_s / 1e6
    say(f"  steady {run_s*1e3:.1f} ms -> {mrays:.3f} Mrays/s")
    out[key] = dict(rows=accel.rows, build_s=round(build_s, 1),
                    compile_s=round(compile_s, 1),
                    first_s=round(first_s, 2), ms=round(run_s * 1e3, 1),
                    mrays=round(mrays, 3), hits=int(hits),
                    max_ray_steps=int(msteps))


def main():
    out = {}
    ladder = [
        (64, 64, 128, 16),
        (128, 136, 240, 16),
        (256, 136, 240, 16),
        (512, 136, 240, 16),
        (512, 272, 480, 16),
    ]
    if len(sys.argv) > 1:
        ladder = ladder[: int(sys.argv[1])]
    for dim, h, w, window in ladder:
        try:
            run_case(dim, h, w, window, out)
        except Exception as e:
            say(f"  FAILED: {e}")
            out[f"d{dim}_r{h}x{w}_w{window}"] = dict(error=str(e)[:500])
            break
        with open("tools/probe_pallas2_smoke_out.json", "w") as fp:
            json.dump(out, fp, indent=1)
    say("done")


if __name__ == "__main__":
    main()
