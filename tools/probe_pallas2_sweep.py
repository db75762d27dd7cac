"""Full-resolution (512³ / 1080p) device sweep of the v2 Pallas kernel:
tile layout {8x128 strip, 32x32 block} x window size. Quarter-res trends
were misleading (coarser tiles -> wider Morton spread), so this sweeps at
the flagship shape directly. Writes tools/probe_pallas2_sweep_out.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pallas2_sweep.py
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
from vxtpu.render.kernel_pallas_v2 import march_pallas_v2
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed_morton

DIMS = (512, 512, 512)
H, W = 1080, 1920
MAX_STEPS = sum(DIMS) + 2
T0 = time.perf_counter()


def say(msg):
    print(f"[{time.perf_counter() - T0:8.1f}s] {msg}", flush=True)


def main():
    out = {}
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    accel.words.block_until_ready()
    say(f"table ready: {accel.rows} rows")
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W)

    def timed(window, block, iters=3):
        @jax.jit
        def f(o, d, words, dep):
            o = o.at[0, 0].add(dep * 1e-12)
            rec = march_pallas_v2(o, d, type(accel)(words=words), DIMS,
                                  MAX_STEPS, image_shape=(H, W),
                                  window=window, block_shape=block)
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6

        dep = jnp.float32(0.0)
        t0 = time.perf_counter()
        dep = f(o, d, accel.words, dep)
        dep = float(dep)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            dep = f(o, d, accel.words, jnp.float32(float(dep) * 1e-9))
        float(dep)
        return (time.perf_counter() - t0) / iters, compile_s

    import sys
    if "--batched" in sys.argv:
        # second pass: batched one-hot matmul lookup (one [1024,W]@[W,128]
        # per iter instead of 8 [128,W]@[W,128] weight reloads)
        cases = [
            ("bf16_block32_w1024", 1024, (32, 32)),
            ("bf16_block32_w1536", 1536, (32, 32)),
            ("bf16_block32_w2048", 2048, (32, 32)),
            ("bf16_block32_w512", 512, (32, 32)),
            ("bf16_block32_w3072", 3072, (32, 32)),
        ]
    else:
        cases = [
            ("block32_w64", 64, (32, 32)),
            ("block32_w128", 128, (32, 32)),
            ("strip_w128", 128, None),
            ("block32_w32", 32, (32, 32)),
            ("block32_w256", 256, (32, 32)),
            ("strip_w256", 256, None),
        ]
    for name, wdw, blk in cases:
        try:
            dt, cs = timed(wdw, blk)
            out[name] = dict(ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                             mrays=round(H * W / dt / 1e6, 3))
        except Exception as e:
            out[name] = dict(error=str(e)[:400])
        say(f"{name}: {out[name]}")
        fname = ("tools/probe_pallas2_sweep_batched_out.json"
                 if "--batched" in sys.argv
                 else "tools/probe_pallas2_sweep_out.json")
        with open(fname, "w") as fp:
            json.dump(out, fp, indent=1)
    say("done")


if __name__ == "__main__":
    main()
