"""Round-5 real-march sweep of the v4 fetch (window x split x unroll) at
the flagship shape (512^3 terrain, 1080p), plus on-device v4-vs-r4 parity
and the fused lambert frame at the best setting.

Writes tools/probe_r5_march_out.json incrementally (resumable).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r5_march.py
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
from vxtpu.camera.rays import generate_rays
from vxtpu.render.fused import render_frame_fused
from vxtpu.render.kernel_pallas_v2 import PackedMorton, march_pallas_v2
from vxtpu.render.settings import MarchTuning, RenderSettings
from vxtpu.world import procgen
from vxtpu.world.lights import Lights
from vxtpu.world.packed import build_material_morton, build_packed_morton

DIMS = (512, 512, 512)
H, W_IMG = 1080, 1920

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r5_march_out.json")
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
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W_IMG)
    max_steps = sum(DIMS) + 2
    lights = Lights.single((256.0, 640.0, 600.0), rgb=(1.0, 0.95, 0.9),
                           intensity=1.4)

    def march_time(name, window, split, unroll, v4):
        if name in RES:
            return

        @jax.jit
        def f(words, oo, dd, dep):
            oo = oo.at[0, 0].add(dep * 1e-12)
            rec = march_pallas_v2(oo, dd, PackedMorton(words=words), DIMS,
                                  max_steps, image_shape=(H, W_IMG),
                                  window=window, block_shape=(32, 32),
                                  split_window=split, local_advance=True,
                                  unroll=unroll, fetch_v4=v4)
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6

        dep = jnp.float32(0.0)
        t0 = time.perf_counter()
        dep = f(accel.words, o, d, dep)
        float(dep)
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            dep = f(accel.words, o, d, dep)
        float(dep)
        dt = (time.perf_counter() - t0) / 3
        save(name, dict(ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                        mrays=round(H * W_IMG / dt / 1e6, 3)))

    # r4 reference (old fetch) first, then the v4 sweep
    march_time("r4ref_w512_split_u2", 512, True, 2, False)
    for name, w, split, u in (
            ("v4_w512_split_u2", 512, True, 2),
            ("v4_w256_split_u2", 256, True, 2),
            ("v4_w256_nosplit_u2", 256, False, 2),
            ("v4_w128_nosplit_u2", 128, False, 2),
            ("v4_w384_split_u2", 384, True, 2),
            ("v4_w256_split_u4", 256, True, 4),
            ("v4_w512_split_u4", 512, True, 4),
    ):
        march_time(name, w, split, u, True)

    # on-device v4-vs-r4 parity (hits + t + voxel identical)
    if "v4_parity" not in RES:
        @jax.jit
        def par(words, oo, dd):
            a = march_pallas_v2(oo, dd, PackedMorton(words=words), DIMS,
                                max_steps, image_shape=(H, W_IMG),
                                window=512, block_shape=(32, 32),
                                split_window=True, fetch_v4=False)
            b = march_pallas_v2(oo, dd, PackedMorton(words=words), DIMS,
                                max_steps, image_shape=(H, W_IMG),
                                window=512, block_shape=(32, 32),
                                split_window=True, fetch_v4=True)
            return (jnp.sum((a.hit != b.hit).astype(jnp.int32)),
                    jnp.max(jnp.abs(jnp.where(a.hit, a.t, 0.0)
                                    - jnp.where(b.hit, b.t, 0.0))),
                    jnp.sum(jnp.abs(a.voxel - b.voxel)))
        hd, td, vd = jax.device_get(par(accel.words, o, d))
        save("v4_parity", dict(hit_mismatch=int(hd), t_maxdiff=float(td),
                               voxel_absdiff=int(vd)))

    # fused lambert frame at the best v4 setting found above
    best = min((k for k in RES if k.startswith("v4_w")),
               key=lambda k: RES[k]["ms"])
    w = int(best.split("_")[1][1:])
    split = "nosplit" not in best
    u = int(best.rsplit("u", 1)[1])
    if "fused_best" not in RES:
        tn = MarchTuning(window=w, unroll=u, split_window=split,
                         fetch_v4=True)
        settings = RenderSettings(shading="lambert",
                                  tuning=tn)

        @jax.jit
        def frame(words, mats, dep):
            c = Camera.make(pos=(-360.0 + dep * 1e-12, 256.0, 560.0),
                            fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
            img = render_frame_fused(PackedMorton(words=words), mats, DIMS,
                                     c, lights, settings, H, W_IMG)
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
        save("fused_best", dict(config=best, ms=round(dt * 1e3, 1),
                                compile_s=round(cs, 1),
                                mrays=round(H * W_IMG / dt / 1e6, 3)))


def extra():
    """Second wave: unroll-1 configs + the v4b hybrid (3-D build, narrow
    extraction) — testing the register-pressure hypothesis for why v4
    loses in the real kernel while winning in the isolated probe."""
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W_IMG)
    max_steps = sum(DIMS) + 2

    def march_time(name, window, split, unroll, v4):
        if name in RES:
            return

        @jax.jit
        def f(words, oo, dd, dep):
            oo = oo.at[0, 0].add(dep * 1e-12)
            rec = march_pallas_v2(oo, dd, PackedMorton(words=words), DIMS,
                                  max_steps, image_shape=(H, W_IMG),
                                  window=window, block_shape=(32, 32),
                                  split_window=split, local_advance=True,
                                  unroll=unroll, fetch_v4=v4)
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6

        dep = jnp.float32(0.0)
        t0 = time.perf_counter()
        dep = f(accel.words, o, d, dep)
        float(dep)
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            dep = f(accel.words, o, d, dep)
        float(dep)
        dt = (time.perf_counter() - t0) / 3
        save(name, dict(ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                        mrays=round(H * W_IMG / dt / 1e6, 3)))

    march_time("r4ref_w512_split_u1", 512, True, 1, False)
    march_time("v4_w512_split_u1", 512, True, 1, True)
    march_time("v4b_w512_split_u1", 512, True, 1, "v4b")
    march_time("v4b_w512_split_u2", 512, True, 2, "v4b")
    march_time("r4ref_w512_split_u3", 512, True, 3, False)


if __name__ == "__main__":
    main()
    extra()
