"""Round-5: full-feature fused frame (in-kernel shadow marches) at the
flagship 512^3/1080p — vs r4's 3-dispatch 112.6 ms / 18.4 Mrays/s
(tools/bench_details.json pallas2_512_1080p_full).

Writes tools/probe_r5_full_out.json.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r5_full.py
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
from vxtpu.render.fused import render_frame_fused
from vxtpu.render.kernel_pallas_v2 import PackedMorton
from vxtpu.render.settings import RenderSettings
from vxtpu.world import procgen
from vxtpu.world.lights import Lights
from vxtpu.world.packed import build_material_morton, build_packed_morton

DIMS = (512, 512, 512)
H, W_IMG = 1080, 1920

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r5_full_out.json")
RES = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        RES = json.load(f)


def save(name, entry):
    RES[name] = entry
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(name, entry, flush=True)


def main():
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    mats = build_material_morton(grid.occupancy)
    lights = Lights.single((256.0, 640.0, 600.0), rgb=(1.0, 0.95, 0.9),
                           intensity=1.4)
    settings = RenderSettings(shading="full", shadows=True, fog=True)

    def frame_time(name, inkernel):
        if name in RES:
            return

        @jax.jit
        def frame(words, mats, dep):
            c = Camera.make(pos=(-360.0 + dep * 1e-12, 256.0, 560.0),
                            fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
            img = render_frame_fused(PackedMorton(words=words), mats, DIMS,
                                     c, lights, settings, H, W_IMG,
                                     inkernel_shadows=inkernel)
            return jnp.sum(img) * 1e-6

        dep = jnp.float32(0.0)
        t0 = time.perf_counter()
        dep = frame(accel.words, mats, dep)
        float(dep)
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            dep = frame(accel.words, mats, dep)
        float(dep)
        dt = (time.perf_counter() - t0) / 3
        save(name, dict(ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                        mrays=round(H * W_IMG / dt / 1e6, 3)))

    frame_time("full_composed_3dispatch", False)
    frame_time("full_inkernel_shadows", True)

    # device parity of the two shadow paths on the flagship frame
    if "shadow_parity" not in RES:
        @jax.jit
        def par(words, mats):
            c = Camera.make(pos=(-360.0, 256.0, 560.0),
                            fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
            a = render_frame_fused(PackedMorton(words=words), mats, DIMS,
                                   c, lights, settings, H, W_IMG,
                                   inkernel_shadows=True)
            b = render_frame_fused(PackedMorton(words=words), mats, DIMS,
                                   c, lights, settings, H, W_IMG,
                                   inkernel_shadows=False)
            d = jnp.abs(a - b)
            return jnp.max(d), jnp.sum((jnp.max(d, axis=-1) > 1e-3)
                                       .astype(jnp.int32))
        md, np_ = jax.device_get(par(accel.words, mats))
        save("shadow_parity", dict(max_diff=float(md),
                                   pix_gt_1e3=int(np_)))


if __name__ == "__main__":
    main()
