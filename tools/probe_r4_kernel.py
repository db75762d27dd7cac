"""Round-4 device probe: flagship (512^3 / 1080p) kernel variants in ONE
process (first Mosaic compile per process costs minutes on this endpoint —
SURVEY.md §7.1; everything after is ~2s).

Measures, march-only unless noted:
  split_concat_local0   r3's fastest probed config (expect ~72 ms)
  split_concat_local1   + same-coarse-cell local advance
  split_mm2_local1      + two-matmul split (no window concat copy)
  split_mm2_local0      ablation
  fused_lambert         BEST variant march + in-kernel shade, full frame
  fused_full_shadows    full feature set: shadows+specular+fog, 3-pass
  inside_*              flythrough camera for the best variant
  device_parity         fused rgb vs XLA-pipeline rgb on a 64^2 crop

Writes tools/probe_r4_kernel_out.json incrementally after each entry.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.engine.platform import enable_compilation_cache
from vxtpu.render.fused import render_rays_fused
from vxtpu.render.kernel_pallas_v2 import march_pallas_v2
from vxtpu.render.settings import MarchTuning, RenderSettings
from vxtpu.world import procgen
from vxtpu.world.lights import Lights
from vxtpu.world.packed import (build_material_morton, build_packed_morton,
                                PackedMorton)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r4_kernel_out.json")
RES = {}
if os.path.exists(OUT):   # resume: skip entries already measured
    with open(OUT) as f:
        RES = json.load(f)


def save(name, entry):
    RES[name] = entry
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(name, entry, flush=True)


def chain_time(fn, args, iters=3):
    dep = jnp.float32(0.0)
    t0 = time.perf_counter()
    dep = fn(*args, dep)
    float(dep)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        dep = fn(*args, dep)
    float(dep)
    return (time.perf_counter() - t0) / iters, compile_s


def main():
    enable_compilation_cache()
    dims = (512, 512, 512)
    H, W = 1080, 1920
    grid = procgen.terrain(dims, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    mats = build_material_morton(grid.occupancy)
    max_steps = sum(dims) + 2
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    cam_in = Camera.make(pos=(256.0, 256.0, 120.0),
                         fov_y_deg=55.0).look_at((500.0, 400.0, 90.0))
    lights = Lights.single((100.0, -150.0, 700.0), intensity=2.0)
    o, d = generate_rays(cam, H, W)
    o_in, d_in = generate_rays(cam_in, H, W)

    def march_dep(words, oo, dd, dep, **kw):
        oo = oo.at[0, 0].add(dep * 1e-12)
        rec = march_pallas_v2(oo, dd, PackedMorton(words=words), dims,
                              max_steps, image_shape=(H, W), window=1024,
                              block_shape=(32, 32), unroll=2, **kw)
        return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6

    variants = {
        "split_concat_local0": dict(split_window=True, split_matmul2=False,
                                    local_advance=False),
        "split_concat_local1": dict(split_window=True, split_matmul2=False,
                                    local_advance=True),
        "split_mm2_local1": dict(split_window=True, split_matmul2=True,
                                 local_advance=True),
        "split_mm2_local0": dict(split_window=True, split_matmul2=True,
                                 local_advance=False),
        "contig_local1": dict(split_window=False, local_advance=True),
    }
    for name, kw in variants.items():
        if name in RES:
            continue
        f = jax.jit(functools.partial(march_dep, **kw))
        dt, cs = chain_time(f, (accel.words, o, d))
        # stats: exact loop iterations for the roofline
        @jax.jit
        def stats_fn(words, oo, dd):
            rec, st = march_pallas_v2(
                oo, dd, PackedMorton(words=words), dims, max_steps,
                image_shape=(H, W), window=1024, block_shape=(32, 32),
                unroll=2, stats=True, **kw)
            return (jnp.sum(st["iters_tile"]),
                    jnp.sum(st["steps_tile_max"] + 1), jnp.sum(rec.steps))
        it, ideal, rs = [int(x) for x in
                         jax.block_until_ready(stats_fn(accel.words, o, d))]
        save(name, dict(ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                        mrays=round(H * W / dt / 1e6, 3), iters_total=it,
                        ideal_total=ideal, ray_steps=rs,
                        stall=round(it / max(ideal, 1), 2),
                        per_iter_us=round(dt * 1e6 / max(it, 1), 3)))

    # best variant by measured ms
    best = min(variants, key=lambda k: RES[k]["ms"])
    best_kw = variants[best]
    save("best_variant", dict(name=best))

    # ---- fused march+shade full frame (lambert, headline-comparable)
    tuning = MarchTuning(
        split_window=best_kw.get("split_window", True),
        split_matmul2=best_kw.get("split_matmul2", False),
        local_advance=best_kw.get("local_advance", True))
    settings = RenderSettings(shading="lambert", tuning=tuning)

    def fused_dep(words, mw, oo, dd, dep):
        oo = oo.at[0, 0].add(dep * 1e-12)
        rgb, _ = render_rays_fused(oo, dd, PackedMorton(words=words), mw,
                                   dims, lights, settings,
                                   image_shape=(H, W))
        return jnp.sum(rgb) * 1e-7

    f = jax.jit(fused_dep)
    if "fused_lambert_frame" not in RES:
        dt, cs = chain_time(f, (accel.words, mats, o, d))
        save("fused_lambert_frame", dict(
            ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
            mrays=round(H * W / dt / 1e6, 3), variant=best))

    if "fused_lambert_frame_inside" not in RES:
        dt, cs = chain_time(f, (accel.words, mats, o_in, d_in))
        save("fused_lambert_frame_inside", dict(
            ms=round(dt * 1e3, 1), mrays=round(H * W / dt / 1e6, 3)))

    # ---- full feature set: shadows + specular + fog (VERDICT r3 #4)
    settings_full = RenderSettings(shading="full", shadows=True, fog=True,
                                   tuning=tuning)

    def full_dep(words, mw, oo, dd, dep):
        oo = oo.at[0, 0].add(dep * 1e-12)
        rgb, _ = render_rays_fused(oo, dd, PackedMorton(words=words), mw,
                                   dims, lights, settings_full,
                                   image_shape=(H, W))
        return jnp.sum(rgb) * 1e-7

    f = jax.jit(full_dep)
    if "fused_full_shadows_frame" not in RES:
        dt, cs = chain_time(f, (accel.words, mats, o, d))
        save("fused_full_shadows_frame", dict(
            ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
            mrays=round(H * W / dt / 1e6, 3), lights=1,
            note="march + 1 shadow march + fused shade kernel"))

    # ---- device parity: fused rgb vs XLA pipeline on a small crop
    from vxtpu.render.kernel_pallas_v2 import make_march_pallas_v2
    from vxtpu.render.pipeline import render_rays

    dims_s = (64, 64, 64)
    grid_s = procgen.terrain(dims_s, seed=11)
    accel_s = build_packed_morton(grid_s.occupancy)
    mats_s = build_material_morton(grid_s.occupancy)
    cam_s = Camera.make(pos=(-40.0, 32.0, 80.0)).look_at((32.0, 32.0, 24.0))
    o_s, d_s = generate_rays(cam_s, 64, 64)
    lights_s = Lights.single((50.0, -20.0, 120.0), intensity=2.0)
    for nm, st in [("lambert", RenderSettings(shading="lambert",
                                              tuning=tuning)),
                   ("full_shadow",
                    RenderSettings(shading="full", shadows=True, fog=True,
                                   tuning=tuning))]:
        @jax.jit
        def frgb(words, mw, oo, dd):
            rgb, _ = render_rays_fused(oo, dd, PackedMorton(words=words),
                                       mw, dims_s, lights_s, st,
                                       image_shape=(64, 64))
            return rgb

        @jax.jit
        def xrgb(occ, oo, dd):
            march = make_march_pallas_v2(occ, dims_s, st, accel=accel_s,
                                         image_shape=(64, 64))
            rgb, _ = render_rays(march, oo, dd, grid_s.albedo(), dims_s,
                                 lights_s, st)
            return rgb

        a = np.asarray(frgb(accel_s.words, mats_s, o_s, d_s))
        b = np.asarray(xrgb(grid_s.occupancy.reshape(-1), o_s, d_s))
        err = float(np.abs(a - b).max())
        save(f"device_parity_{nm}", dict(max_abs_err=err, ok=err < 1e-3))


if __name__ == "__main__":
    main()
