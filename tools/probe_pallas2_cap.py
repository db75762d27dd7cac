"""Jump-cap sweep for the v2 kernel at 512³/1080p: the packed word's
chessboard distance is capped (default 64 coarse cells = 128-voxel jumps);
bigger caps mean fewer march steps through deep empty space at zero kernel
cost (same shapes -> cached compile; only table values change; values stay
bf16-exact through 255). Records march time + exact iteration counters per
cap. Writes tools/probe_pallas2_cap_out.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pallas2_cap.py
"""

from __future__ import annotations

import json
import time

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_pallas_v2 import march_pallas_v2
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed_morton

DIMS = (512, 512, 512)
H, W = 1080, 1920
MAX_STEPS = sum(DIMS) + 2
T0 = time.perf_counter()


def say(m):
    print(f"[{time.perf_counter() - T0:8.1f}s] {m}", flush=True)


def main():
    out = {}
    grid = procgen.terrain(DIMS, seed=7)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W)

    @jax.jit
    def f(o, d, words, dep):
        o = o.at[0, 0].add(dep * 1e-12)
        from vxtpu.world.packed import PackedMorton
        rec = march_pallas_v2(o, d, PackedMorton(words=words), DIMS,
                              MAX_STEPS, image_shape=(H, W), window=1024,
                              block_shape=(32, 32), unroll=2)
        return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6

    @jax.jit
    def stats(o, d, words):
        from vxtpu.world.packed import PackedMorton
        rec, st = march_pallas_v2(o, d, PackedMorton(words=words), DIMS,
                                  MAX_STEPS, image_shape=(H, W),
                                  window=1024, block_shape=(32, 32),
                                  unroll=2, stats=True)
        return (jnp.sum(st["iters_tile"]),
                jnp.sum(st["steps_tile_max"] + 1), jnp.sum(rec.steps),
                jnp.sum(rec.hit.astype(jnp.int32)))

    hits_ref = None
    for cap in (64, 128, 192, 255):
        t0 = time.perf_counter()
        accel = build_packed_morton(grid.occupancy, cap=cap)
        accel.words.block_until_ready()
        build_s = time.perf_counter() - t0
        dep = jnp.float32(0.0)
        dep = f(o, d, accel.words, dep)
        float(dep)
        t0 = time.perf_counter()
        for _ in range(3):
            dep = f(o, d, accel.words, jnp.float32(float(dep) * 1e-9))
        float(dep)
        dt = (time.perf_counter() - t0) / 3
        it, ideal, rs, hits = [int(x) for x in
                               jax.block_until_ready(stats(o, d,
                                                           accel.words))]
        if hits_ref is None:
            hits_ref = hits
        out[f"cap{cap}"] = dict(
            ms=round(dt * 1e3, 1), mrays=round(H * W / dt / 1e6, 3),
            build_s=round(build_s, 1), iters_total=it, ideal_total=ideal,
            ray_steps=rs, hits=hits, hits_match=bool(hits == hits_ref))
        say(f"cap{cap}: {out[f'cap{cap}']}")
        with open("tools/probe_pallas2_cap_out.json", "w") as fp:
            json.dump(out, fp, indent=1)
    say("done")


if __name__ == "__main__":
    main()
