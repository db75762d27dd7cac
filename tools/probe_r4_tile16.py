"""Measure whether a DOUBLE-HEIGHT tile ([16,128] = 2048 rays) amortizes
the v2 kernel's fixed per-iteration fetch cost (~2.4 us/iter at [8,128],
dominated by one-hot machinery that is window-size independent).

Forced-iteration standalone kernels (probe_pallas2_fixed pattern):
  t8   current [8,128] tile, one [1024,W] one-hot fetch per iter
  t16  [16,128] tile, one [2048,W] one-hot fetch per iter

Metric: ns per RAY-iteration (per_iter_us / rays_per_tile * 1000).
If t16's per-ray cost drops meaningfully, parameterizing TILE in the
real kernel is the next perf lever; if it scales ~linearly, the fixed
cost is per-ray after all and the lever is dead.

Writes tools/probe_r4_tile16_out.json."""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_pallas_v2 import _morton3
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed_morton

DIMS = (512, 512, 512)
H, W_IMG = 1080, 1920
N_ITERS = 48
WIN = 512

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r4_tile16_out.json")
RES = {}


def save(name, entry):
    RES[name] = entry
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(name, entry, flush=True)


def _lookup_T(win, row_rel, lane, W, T):
    """_lookup_window generalized to a [T,128] tile."""
    wt = jnp.transpose((row_rel << 7) | lane)     # [128, T]
    rt = wt >> 7
    lt = wt & 127
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (128, W), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    rowoh_all = jnp.concatenate(
        [(iota_w == rt[:, c:c + 1]).astype(jnp.bfloat16) for c in range(T)],
        axis=0)                                   # [T*128, W]
    g_all = jnp.dot(rowoh_all, win.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    cols = []
    for c in range(T):
        laneoh = (iota_l == lt[:, c:c + 1]).astype(jnp.float32)
        g = g_all[c * 128:(c + 1) * 128]
        cols.append(jnp.sum(g * laneoh, axis=1, keepdims=True))
    return jnp.transpose(jnp.concatenate(cols, axis=1))  # [T,128]


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tbl_ref,
            out_ref, *, T):
    X, Y, Z = DIMS
    rows = tbl_ref.shape[0]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    sgx = jnp.where(dx >= 0, 1, -1).astype(jnp.int32)
    sgy = jnp.where(dy >= 0, 1, -1).astype(jnp.int32)
    sgz = jnp.where(dz >= 0, 1, -1).astype(jnp.int32)
    vx0 = jnp.clip(jnp.floor(ox).astype(jnp.int32), 0, X - 1)
    vy0 = jnp.clip(jnp.floor(oy).astype(jnp.int32), 0, Y - 1)
    vz0 = jnp.clip(jnp.floor(oz).astype(jnp.int32), 0, Z - 1)
    state = (vx0, vy0, vz0, jnp.zeros((T, 128), jnp.float32), jnp.int32(0))

    def cond(s):
        return s[4] < N_ITERS

    def body(s):
        vx, vy, vz, acc, it = s
        nvx = jnp.clip(vx + sgx, 0, X - 1)
        nvy = jnp.clip(vy + sgy, 0, Y - 1)
        nvz = jnp.clip(vz + sgz, 0, Z - 1)
        widx = _morton3(nvx >> 1, nvy >> 1, nvz >> 1)
        row = widx >> 7
        lane = widx & 127
        base = jnp.clip(jnp.min(row), 0, rows - WIN)
        win = tbl_ref[pl.ds(base, WIN), :]
        rel = jnp.clip(row - base, 0, WIN - 1)
        wv = _lookup_T(win, rel, lane, WIN, T)
        acc = acc + wv * 1e-9
        return (nvx, nvy, nvz, acc, it + 1)

    s = jax.lax.while_loop(cond, body, state)
    out_ref[:] = s[3]


def run(name, T):
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W_IMG)
    n = o.shape[0]
    tile_rays = T * 128
    pad = (-n) % tile_rays
    op = jnp.concatenate([o, jnp.zeros((pad, 3))])
    dp = jnp.concatenate([d, jnp.ones((pad, 3))])
    nt = (n + pad) // tile_rays
    t3 = lambda x: x.reshape(nt * T, 128)
    chans = [t3(op[:, 0]), t3(op[:, 1]), t3(op[:, 2]),
             t3(dp[:, 0]), t3(dp[:, 1]), t3(dp[:, 2])]
    rows = accel.rows

    ray_spec = pl.BlockSpec((T, 128), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(_kernel, T=T),
        grid=(nt, 1),
        in_specs=[ray_spec] * 6 + [tbl_spec],
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((nt * T, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )

    @jax.jit
    def g(chans, words, dep):
        cs = list(chans)
        cs[0] = cs[0] + dep * 1e-12
        return jnp.sum(f(*cs, words)) * 1e-9

    dep = jnp.float32(0.0)
    t0 = time.perf_counter()
    dep = g(chans, accel.words, dep)
    float(dep)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2):
        dep = g(chans, accel.words, jnp.float32(float(dep) * 1e-9))
    float(dep)
    dt = (time.perf_counter() - t0) / 2
    per_iter_us = dt / (nt * N_ITERS) * 1e6
    save(name, dict(ms=round(dt * 1e3, 1), compile_s=round(compile_s, 1),
                    per_iter_us=round(per_iter_us, 3),
                    ns_per_ray_iter=round(per_iter_us * 1e3 / tile_rays,
                                          3)))


def main():
    run("t8", 8)
    run("t16", 16)
    run("t32", 32)


if __name__ == "__main__":
    main()
