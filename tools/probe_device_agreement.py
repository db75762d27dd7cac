"""Measure the ACTUAL device-vs-oracle agreement of the march kernels (the
device test suite asserts >= 0.998 hit-mask agreement — this records what
the real number is, so the tolerance is a documented bound, not a shrug),
plus the pallas2 flagship timing for an INSIDE-the-grid camera (schedule /
layout generality beyond the tuned outside viewpoint).

Writes tools/probe_device_agreement_out.json.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_device_agreement.py
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
from vxtpu.render.kernel_xla import make_march_xla
from vxtpu.render.settings import RenderSettings
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed_morton

T0 = time.perf_counter()


def say(m):
    print(f"[{time.perf_counter() - T0:8.1f}s] {m}", flush=True)


def main():
    out = {}

    # ---- device kernel-vs-kernel agreement at test scale (32^3 terrain,
    # same scene as tests/test_device.py)
    dims = (32, 32, 32)
    grid = procgen.terrain(dims, seed=11)
    accel = build_packed_morton(grid.occupancy)
    cam = Camera.make(pos=(-20.0, 16.0, 40.0)).look_at((16.0, 16.0, 12.0))
    o, d = generate_rays(cam, 64, 64)
    settings = RenderSettings()
    occ_flat = grid.occupancy.reshape(-1)

    xla = jax.jit(make_march_xla(occ_flat, dims, settings, None))
    r_x = jax.block_until_ready(xla(o, d))

    @jax.jit
    def p2(o, d, words):
        return march_pallas_v2(o, d, type(accel)(words=words), dims, 128,
                               image_shape=(64, 64), window=accel.rows)

    r_p = jax.block_until_ready(p2(o, d, accel.words))
    hit_agree = float((np.asarray(r_x.hit) == np.asarray(r_p.hit)).mean())
    both = np.asarray(r_x.hit) & np.asarray(r_p.hit)
    vox_agree = float((np.asarray(r_x.voxel)[both]
                       == np.asarray(r_p.voxel)[both]).all(-1).mean())
    t_max_diff = float(np.abs(np.asarray(r_x.t)[both]
                              - np.asarray(r_p.t)[both]).max())
    out["device_xla_vs_pallas2_32cube"] = dict(
        rays=int(o.shape[0]), hit_agreement=hit_agree,
        voxel_agreement=vox_agree, t_maxdiff=t_max_diff)
    say(f"32^3 agreement: {out['device_xla_vs_pallas2_32cube']}")

    # ---- pallas2 flagship, INSIDE camera
    dims = (512, 512, 512)
    grid = procgen.terrain(dims, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    H, W = 1080, 1920
    cam_in = Camera.make(pos=(256.0, 256.0, 120.0),
                         fov_y_deg=55.0).look_at((500.0, 400.0, 90.0))
    o, d = generate_rays(cam_in, H, W)
    say(f"flagship table ready: {accel.rows} rows")

    @jax.jit
    def f(o, d, words, dep):
        o = o.at[0, 0].add(dep * 1e-12)
        rec = march_pallas_v2(o, d, type(accel)(words=words), dims,
                              sum(dims) + 2, image_shape=(H, W),
                              window=1024, block_shape=(32, 32), unroll=2)
        return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6

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
    out["pallas2_inside_camera"] = dict(
        ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
        mrays=round(H * W / dt / 1e6, 3), window=1024, block="32x32")
    say(f"inside camera: {out['pallas2_inside_camera']}")

    with open("tools/probe_device_agreement_out.json", "w") as fp:
        json.dump(out, fp, indent=1)
    say("done")


if __name__ == "__main__":
    main()
