"""Isolate the field-sampling kernels' device cost at the train shape
(128^3, 256^2 camera rays, S=64): fwd flat vs image-blocked tiles with
the mini-loop iteration counters, and bwd alone — to find where the
47 s train step (tools/probe_r5_train_out.json) actually goes.

Writes tools/probe_r5_sample_out.json.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r5_sample.py
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
from vxtpu.render import dda
from vxtpu.render.kernel_sample import (build_field_morton,
                                        sample_fields_bwd,
                                        sample_fields_fwd)
from vxtpu.render.soft import SoftGrid
from vxtpu.world import procgen

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r5_sample_out.json")
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
    dims = (128, 128, 128)
    H = W = 256
    S = 64
    soft = SoftGrid.from_hard(
        procgen.terrain(dims, seed=7, with_rgb=True), sigma_solid=25.0)
    tabs = (build_field_morton(soft.sigma_raw),
            build_field_morton(soft.rgb_raw[0]),
            build_field_morton(soft.rgb_raw[1]),
            build_field_morton(soft.rgb_raw[2]))
    cam = Camera.make(pos=(-90.0, 64.0, 140.0),
                      fov_y_deg=55.0).look_at((64.0, 64.0, 35.0))
    o, d = generate_rays(cam, H, W)
    t_enter, t_exit, valid = dda.ray_grid_clip(o, d, dims)
    t0 = jnp.where(valid, t_enter, 0.0)
    dt = jnp.where(valid, jnp.maximum(t_exit - t_enter, 0.0) / S, 0.0)
    n = o.shape[0]
    print("valid rays:", int(jnp.sum(valid)), "/", n, flush=True)

    def run_fwd(name, image_shape, window):
        if name in RES:
            return

        @jax.jit
        def f(tabs, o, d, t0, dt, dep):
            o = o.at[0, 0].add(dep * 1e-12)
            vals, iters = sample_fields_fwd(
                tabs, o, d, t0, dt, S, dims[0], lit=True, window=window,
                image_shape=image_shape,
                block_shape=(32, 32) if image_shape else None, stats=True)
            return jnp.sum(vals[0]) * 1e-9, iters

        dep = jnp.float32(0.0)
        t0_ = time.perf_counter()
        dep, iters = f(tabs, o, d, t0, dt, dep)
        float(dep)
        cs = time.perf_counter() - t0_
        t0_ = time.perf_counter()
        for _ in range(2):
            dep, iters = f(tabs, o, d, t0, dt,
                           jnp.float32(float(dep) * 1e-9))
        float(dep)
        ms = (time.perf_counter() - t0_) / 2 * 1e3
        it_tile = iters.reshape(-1, 8, 128)[:, 0, 0]
        save(name, dict(
            ms=round(ms, 1), compile_s=round(cs, 1),
            iters_mean=round(float(jnp.mean(it_tile)), 1),
            iters_max=int(jnp.max(it_tile)),
            iters_min=int(jnp.min(it_tile)),
            per_sample_expected=S,
            ns_per_ray_sample=round(ms * 1e6 / (n * S), 1)))

    run_fwd("fwd_flat_w64", None, 64)
    run_fwd("fwd_blk_w64", (H, W), 64)
    run_fwd("fwd_blk_w256", (H, W), 256)

    def run_bwd(name, image_shape, window):
        if name in RES:
            return
        cots = tuple(
            jax.random.normal(jax.random.PRNGKey(20 + i), (S, n)) * 1e-3
            for i in range(7))

        @jax.jit
        def f(tabs, o, d, t0, dt, dep):
            o = o.at[0, 0].add(dep * 1e-12)
            gtabs, go, gd, gt0, gdt = sample_fields_bwd(
                tabs, o, d, t0, dt, cots, dims[0], lit=True, window=window,
                image_shape=image_shape,
                block_shape=(32, 32) if image_shape else None)
            return jnp.sum(gtabs[0]) * 1e-9 + jnp.sum(go) * 1e-9

        dep = jnp.float32(0.0)
        t0_ = time.perf_counter()
        dep = f(tabs, o, d, t0, dt, dep)
        float(dep)
        cs = time.perf_counter() - t0_
        t0_ = time.perf_counter()
        for _ in range(2):
            dep = f(tabs, o, d, t0, dt, jnp.float32(float(dep) * 1e-9))
        float(dep)
        ms = (time.perf_counter() - t0_) / 2 * 1e3
        save(name, dict(ms=round(ms, 1), compile_s=round(cs, 1),
                        ns_per_ray_sample=round(ms * 1e6 / (n * S), 1)))

    run_bwd("bwd_blk_w64", (H, W), 64)


if __name__ == "__main__":
    main()
