"""Round-5 stall sweep: the r4 flagship march stalls 1.45x (46.9 ms vs a
33.1 ms no-stall floor). Knobs swept on the REAL kernel at 512^3/1080p:

  split window totals 384/640/768 (vs the benched 512 = 2x256)
  sublane_windows at W 64/128 (8 per-sublane-row windows: tighter
    clusters, 8 min-syncs per iteration)

Writes tools/probe_r5_stall_out.json (resumable).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r5_stall.py
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
from vxtpu.render.kernel_pallas_v2 import PackedMorton, march_pallas_v2
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed_morton

DIMS = (512, 512, 512)
H, W_IMG = 1080, 1920

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r5_stall_out.json")
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
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W_IMG)
    max_steps = sum(DIMS) + 2

    def march_time(name, window, split, sublane, stats=False):
        if name in RES:
            return

        @jax.jit
        def f(words, oo, dd, dep):
            oo = oo.at[0, 0].add(dep * 1e-12)
            rec = march_pallas_v2(oo, dd, PackedMorton(words=words), DIMS,
                                  max_steps, image_shape=(H, W_IMG),
                                  window=window, block_shape=(32, 32),
                                  split_window=split,
                                  sublane_windows=sublane,
                                  local_advance=True, unroll=2)
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
        entry = dict(ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                     mrays=round(H * W_IMG / dt / 1e6, 3))
        if stats:
            @jax.jit
            def sf(words, oo, dd):
                _, st = march_pallas_v2(
                    oo, dd, PackedMorton(words=words), DIMS, max_steps,
                    image_shape=(H, W_IMG), window=window,
                    block_shape=(32, 32), split_window=split,
                    sublane_windows=sublane, local_advance=True,
                    unroll=2, stats=True)
                return (jnp.sum(st["iters_tile"]),
                        jnp.sum(st["steps_tile_max"] + 1))
            it, ideal = [int(x) for x in
                         jax.device_get(sf(accel.words, o, d))]
            entry.update(iters_total=it, ideal=ideal,
                         stall=round(it / max(ideal, 1), 2))
        save(name, entry)

    march_time("split_w512_ref", 512, True, False, stats=True)
    march_time("split_w384", 384, True, False, stats=True)
    march_time("split_w640", 640, True, False)
    march_time("split_w768", 768, True, False, stats=True)
    march_time("sublane_w64", 64, False, True, stats=True)
    march_time("sublane_w128", 128, False, True)


def stale_bases():
    """base_every sweep: stale split-window bases trade min-sync cost for
    extra stall rounds — parity-locked as a pure perf knob."""
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W_IMG)
    max_steps = sum(DIMS) + 2

    def t(name, be):
        if name in RES:
            return

        @jax.jit
        def f(words, oo, dd, dep):
            oo = oo.at[0, 0].add(dep * 1e-12)
            rec = march_pallas_v2(oo, dd, PackedMorton(words=words), DIMS,
                                  max_steps, image_shape=(H, W_IMG),
                                  window=512, block_shape=(32, 32),
                                  split_window=True, local_advance=True,
                                  unroll=2, base_every=be)
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

    t("be1_ref", 1)
    t("be2", 2)
    t("be3", 3)


if __name__ == "__main__":
    main()
    stale_bases()
