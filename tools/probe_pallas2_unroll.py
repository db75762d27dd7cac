"""Device parity + timing for the unrolled v2 march body.

The per-iteration cost is ~2.4 us nearly independent of window size and of
the one-hot's W (probe_pallas2_fixed_out.json) — consistent with loop-
boundary serialization (cond sync / scalar pipeline flush), not op volume.
unroll=k repeats the masked body k times per while iteration: same ops,
1/k the boundaries. Parity is asserted ON DEVICE here (interpret-mode
unrolled loops are too slow on CPU to test there).

Writes tools/probe_pallas2_unroll_out.json.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pallas2_unroll.py
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

    # ---- parity at 64^3 on device
    dims = (64, 64, 64)
    g = procgen.terrain(dims, seed=11)
    acc = build_packed_morton(g.occupancy, cap=32)
    cam = Camera.make(pos=(-40.0, 32.0, 80.0)).look_at((32.0, 32.0, 20.0))
    o, d = generate_rays(cam, 128, 128)

    def march(unroll):
        @jax.jit
        def f(o, d, words):
            return march_pallas_v2(o, d, type(acc)(words=words), dims, 200,
                                   image_shape=(128, 128), window=64,
                                   block_shape=(32, 32), unroll=unroll)
        return jax.block_until_ready(f(o, d, acc.words))

    a = march(1)
    ok = True
    for u in (2, 4):
        b = march(u)
        same_hit = bool((np.asarray(a.hit) == np.asarray(b.hit)).all())
        h = np.asarray(a.hit)
        same_t = bool(np.allclose(np.asarray(a.t)[h], np.asarray(b.t)[h],
                                  rtol=1e-6))
        same_v = bool((np.asarray(a.voxel)[h] == np.asarray(b.voxel)[h]).all())
        out[f"parity_u{u}"] = dict(hit=same_hit, t=same_t, voxel=same_v)
        ok = ok and same_hit and same_t and same_v
        say(f"parity u{u}: {out[f'parity_u{u}']}")
    out["parity_ok"] = ok

    # ---- flagship timing
    dims = (512, 512, 512)
    grid = procgen.terrain(dims, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    H, W = 1080, 1920
    o, d = generate_rays(cam, H, W)
    say(f"flagship table ready: {accel.rows} rows")

    for u in (1, 2, 4, 8):
        @jax.jit
        def f(o, d, words, dep):
            o = o.at[0, 0].add(dep * 1e-12)
            rec = march_pallas_v2(o, d, type(accel)(words=words), dims,
                                  sum(dims) + 2, image_shape=(H, W),
                                  window=1024, block_shape=(32, 32),
                                  unroll=u)
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6

        try:
            dt, cs = chain(f, (o, d, accel.words))
            out[f"flagship_u{u}"] = dict(ms=round(dt * 1e3, 1),
                                         compile_s=round(cs, 1),
                                         mrays=round(H * W / dt / 1e6, 3))
        except Exception as e:
            out[f"flagship_u{u}"] = dict(error=str(e)[:300])
        say(f"flagship u{u}: {out[f'flagship_u{u}']}")
        with open("tools/probe_pallas2_unroll_out.json", "w") as fp:
            json.dump(out, fp, indent=1)
    say("done")


if __name__ == "__main__":
    main()
