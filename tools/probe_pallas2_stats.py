"""Device stall accounting for the v2 kernel at 512³/1080p: per-tile loop
iterations vs per-tile max march steps (the no-stall ideal). Decides whether
the kernel is stall-bound (widen/partition windows) or per-iter-cost-bound
(shrink per-iteration work). Writes tools/probe_pallas2_stats_out.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pallas2_stats.py
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


def main():
    out = {}
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W)

    for window in (1024, 256):
        @jax.jit
        def f(o, d, words):
            rec, st = march_pallas_v2(o, d, type(accel)(words=words), DIMS,
                                      MAX_STEPS, image_shape=(H, W),
                                      window=window, block_shape=(32, 32),
                                      stats=True)
            return st["iters_tile"], st["steps_tile_max"], jnp.sum(rec.steps)

        it, sm, rs = jax.block_until_ready(f(o, d, accel.words))
        it = np.asarray(it)
        sm = np.asarray(sm)
        ideal = sm + 1
        out[f"w{window}"] = dict(
            tiles=int(it.shape[0]),
            iters_total=int(it.sum()),
            ideal_total=int(ideal.sum()),
            stall_overhead=round(float(it.sum()) / max(ideal.sum(), 1), 3),
            iters_p50=int(np.percentile(it, 50)),
            iters_p90=int(np.percentile(it, 90)),
            iters_p99=int(np.percentile(it, 99)),
            iters_max=int(it.max()),
            ideal_p50=int(np.percentile(ideal, 50)),
            ideal_p99=int(np.percentile(ideal, 99)),
            useful_ray_steps=int(rs),
        )
        print(json.dumps({f"w{window}": out[f"w{window}"]}), flush=True)

    with open("tools/probe_pallas2_stats_out.json", "w") as fp:
        json.dump(out, fp, indent=1)


if __name__ == "__main__":
    main()
