"""Device probe for the experimental Pallas trilinear-gather kernel
(render/kernel_trilerp): Mosaic-compile health, exactness vs
soft.trilinear, and throughput vs the XLA 8-corner gather at the train
probe shape (128^3 field, 256^2 rays x 64 ray-ordered samples = 4.2M
coherent sample points).

Writes tools/probe_r4_trilerp_out.json.

HISTORICAL (round 4): render/kernel_trilerp was retired in round 5 —
its measured lesson (8 separate per-corner matmuls pay the fetch
machinery 8x -> 0.58x XLA) drove render/kernel_sample.py's batched
design. This probe no longer runs; its committed output
(probe_r4_trilerp_out.json) remains the round-4 evidence."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render import dda
from vxtpu.render.kernel_trilerp import build_field_morton, trilerp_pallas
from vxtpu.render.soft import SoftGrid, trilinear
from vxtpu.world import procgen

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r4_trilerp_out.json")
RES = {}


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
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        dep = fn(*args, dep)
    float(dep)
    return (time.perf_counter() - t0) / iters, cs


def main():
    dims = (128, 128, 128)
    D = dims[0]
    H = W = 256
    S = 64
    soft = SoftGrid.from_hard(procgen.terrain(dims, seed=7, with_rgb=True),
                              sigma_solid=25.0)
    field = soft.sigma_raw
    tbl = build_field_morton(field)
    cam = Camera.make(pos=(-90.0, 64.0, 140.0),
                      fov_y_deg=55.0).look_at((64.0, 64.0, 35.0))
    o, d = generate_rays(cam, H, W)
    te, tx, _ = dda.ray_grid_clip(o, d, dims)
    seg = jnp.maximum(tx - te, 0.0)
    ts = te[:, None] + (seg / S)[:, None] * (jnp.arange(S) + 0.5)[None, :]
    p = (o[:, None, :] + ts[..., None] * d[:, None, :]).reshape(-1, 3)
    n = p.shape[0]

    # exactness on a 64k subsample (full comparison is heavy host-side)
    sub = p[:65536]
    want = np.asarray(jax.jit(
        lambda f, q: trilinear(f, q, dims))(field, sub))
    got = np.asarray(jax.jit(
        lambda t, q: trilerp_pallas(t, q, D, window=512))(tbl, sub))
    err = float(np.abs(got - want).max())
    save("device_exactness", dict(max_abs_err=err, ok=err < 1e-4,
                                  n=65536))

    def f_pallas(t, q, dep):
        q = q.at[0, 0].add(dep * 1e-12)
        return jnp.sum(trilerp_pallas(t, q, D, window=512)) * 1e-9

    dt, cs = chain_time(jax.jit(f_pallas), (tbl, p))
    save("pallas_gather", dict(
        ms=round(dt * 1e3, 1), compile_s=round(cs, 1), samples=n,
        ns_per_sample=round(dt * 1e9 / n, 2)))

    def f_xla(f, q, dep):
        q = q.at[0, 0].add(dep * 1e-12)
        return jnp.sum(trilinear(f, q, dims)) * 1e-9

    dt_x, cs = chain_time(jax.jit(f_xla), (field, p))
    save("xla_gather", dict(
        ms=round(dt_x * 1e3, 1), compile_s=round(cs, 1), samples=n,
        ns_per_sample=round(dt_x * 1e9 / n, 2),
        speedup_pallas=round(dt_x / dt, 2)))


if __name__ == "__main__":
    main()
