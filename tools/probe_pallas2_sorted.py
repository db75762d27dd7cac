"""Device timing of the sorted multi-round v2 march at 512³/1080p:
single-round reference (post transpose-fix) vs march_pallas_v2_sorted over
{round0_iters, resume_window, window} — plus the argsort cost in isolation.
Writes tools/probe_pallas2_sorted_out.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pallas2_sorted.py
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
from vxtpu.render.kernel_pallas_v2 import (march_pallas_v2,
                                           march_pallas_v2_sorted)
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed_morton

DIMS = (512, 512, 512)
H, W_IMG = 1080, 1920
MAX_STEPS = sum(DIMS) + 2
T0 = time.perf_counter()


def say(m):
    print(f"[{time.perf_counter() - T0:8.1f}s] {m}", flush=True)


def chain(f, args, iters=3):
    dep = jnp.float32(0.0)
    t0 = time.perf_counter()
    dep = f(*args, dep)
    float(dep)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        dep = f(*args, jnp.float32(float(dep) * 1e-9))
    float(dep)
    return (time.perf_counter() - t0) / iters, cs


def main():
    out = {}
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W_IMG)
    say(f"table ready: {accel.rows} rows")

    # argsort cost in isolation (2M int32 keys)
    @jax.jit
    def sortf(k, dep):
        ids = jnp.argsort(k + (dep > 1e30).astype(jnp.int32))
        return ids[:8].sum().astype(jnp.float32) * 1e-9 + dep

    key = jax.random.randint(jax.random.PRNGKey(0), (H * W_IMG,), 0,
                             1 << 17)
    dt, cs = chain(sortf, (key,))
    out["argsort_2M_ms"] = round(dt * 1e3, 1)
    say(f"argsort 2M: {out['argsort_2M_ms']} ms (compile {cs:.0f}s)")

    def single(window):
        @jax.jit
        def f(o, d, words, dep):
            o = o.at[0, 0].add(dep * 1e-12)
            rec = march_pallas_v2(o, d, type(accel)(words=words), DIMS,
                                  MAX_STEPS, image_shape=(H, W_IMG),
                                  window=window, block_shape=(32, 32))
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6
        return chain(f, (o, d, accel.words))

    dt, cs = single(1024)
    out["single_w1024"] = dict(ms=round(dt * 1e3, 1),
                               compile_s=round(cs, 1),
                               mrays=round(H * W_IMG / dt / 1e6, 3))
    say(f"single_w1024: {out['single_w1024']}")

    def sorted_run(r0, rw, wdw, frac=8):
        @jax.jit
        def f(o, d, words, dep):
            o = o.at[0, 0].add(dep * 1e-12)
            rec = march_pallas_v2_sorted(
                o, d, type(accel)(words=words), DIMS, MAX_STEPS,
                image_shape=(H, W_IMG), window=wdw, block_shape=(32, 32),
                round0_iters=r0, survivor_frac=frac, resume_window=rw)
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6
        return chain(f, (o, d, accel.words))

    for name, r0, rw, wdw in [
        ("sorted_r24_rw256_w1024", 24, 256, 1024),
        ("sorted_r16_rw256_w1024", 16, 256, 1024),
        ("sorted_r32_rw256_w1024", 32, 256, 1024),
        ("sorted_r24_rw128_w512", 24, 128, 512),
        ("sorted_r16_rw512_w512", 16, 512, 512),
    ]:
        try:
            dt, cs = sorted_run(r0, rw, wdw)
            out[name] = dict(ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                             mrays=round(H * W_IMG / dt / 1e6, 3))
        except Exception as e:
            out[name] = dict(error=str(e)[:300])
        say(f"{name}: {out[name]}")
        with open("tools/probe_pallas2_sorted_out.json", "w") as fp:
            json.dump(out, fp, indent=1)
    say("done")


if __name__ == "__main__":
    main()
