"""Device timing + stall counters for the split-window fetch (two W/2
segments covering bimodal Morton row distributions from top-level octant
straddles) vs the contiguous window, at 512³/1080p.

Writes tools/probe_pallas2_split_out.json.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pallas2_split.py
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
H, W_IMG = 1080, 1920
MAX_STEPS = sum(DIMS) + 2
T0 = time.perf_counter()


def say(m):
    print(f"[{time.perf_counter() - T0:8.1f}s] {m}", flush=True)


def main():
    out = {}
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    cams = {
        "outside": Camera.make(pos=(-360.0, 256.0, 560.0),
                               fov_y_deg=55.0).look_at(
                                   (256.0, 256.0, 140.0)),
        "inside": Camera.make(pos=(256.0, 256.0, 120.0),
                              fov_y_deg=55.0).look_at((500.0, 400.0, 90.0)),
    }
    say(f"table ready: {accel.rows} rows")

    def run(cam_name, split, window):
        o, d = generate_rays(cams[cam_name], H, W_IMG)

        @jax.jit
        def f(o, d, words, dep):
            o = o.at[0, 0].add(dep * 1e-12)
            rec = march_pallas_v2(o, d, type(accel)(words=words), DIMS,
                                  MAX_STEPS, image_shape=(H, W_IMG),
                                  window=window, block_shape=(32, 32),
                                  unroll=2, split_window=split)
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6

        @jax.jit
        def st(o, d, words):
            _, s = march_pallas_v2(o, d, type(accel)(words=words), DIMS,
                                   MAX_STEPS, image_shape=(H, W_IMG),
                                   window=window, block_shape=(32, 32),
                                   unroll=2, split_window=split, stats=True)
            return jnp.sum(s["iters_tile"]), jnp.sum(s["steps_tile_max"] + 1)

        dep = jnp.float32(0.0)
        t0 = time.perf_counter()
        dep = f(o, d, accel.words, dep)
        float(dep)
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            dep = f(o, d, accel.words, jnp.float32(float(dep) * 1e-9))
        float(dep)
        dt = (time.perf_counter() - t0) / 3
        it, ideal = [int(x) for x in jax.block_until_ready(
            st(o, d, accel.words))]
        return dict(ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                    mrays=round(H * W_IMG / dt / 1e6, 3), iters_total=it,
                    ideal_total=ideal,
                    stall=round(it / max(ideal, 1), 2))

    for name, split, wdw in [
        ("outside_split_w1024", True, 1024),
        ("outside_contig_w1024", False, 1024),
        ("outside_split_w2048", True, 2048),
        ("inside_split_w1024", True, 1024),
    ]:
        cam_name = name.split("_")[0]
        try:
            out[name] = run(cam_name, split, wdw)
        except Exception as e:
            out[name] = dict(error=str(e)[:300])
        say(f"{name}: {out[name]}")
        with open("tools/probe_pallas2_split_out.json", "w") as fp:
            json.dump(out, fp, indent=1)
    say("done")


if __name__ == "__main__":
    main()
