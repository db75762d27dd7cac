"""Isolate the W-INDEPENDENT ~2.1us/iter fetch overhead of the v2 kernel.

probe_pallas2_cost --wscale showed per-iter cost is flat in window size, so
the fetch cost is fixed overhead, not matmul/copy volume. Candidates:
  (a) dynamic-slice DMA issue latency (pl.ds with a runtime base),
  (b) the vector->scalar sync of the min-reduce that feeds the base,
  (c) the one-hot machinery (3 transposes + 8 lane-onehot reduces).

Variants (all forced to N=48 iters, w512, flagship tile count):
  empty         loop only                                (baseline)
  dyn_slice     + dynamic slice, base = f(iter scalar)   -> (a)
  min_slice     + dynamic slice, base = vector-min       -> (a)+(b)
  onehot_static + one-hot fetch from a STATIC window     -> (c)
  full          everything                               (= a+b+c)

Writes tools/probe_pallas2_fixed_out.json.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pallas2_fixed.py
"""

from __future__ import annotations

import functools
import json
import time

from vxtpu.engine.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_pallas_v2 import TILE, _lookup_window, _morton3
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed_morton

DIMS = (512, 512, 512)
H, W_IMG = 1080, 1920
N_ITERS = 48
W = 512


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tbl_ref, out_ref,
            *, variant):
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
    state = (vx0, vy0, vz0, jnp.zeros(TILE, jnp.float32), jnp.int32(0))

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

        if variant == "empty":
            acc = acc + 1.0
        elif variant == "dyn_slice":
            base = jnp.clip(it * 7 % 1024, 0, rows - W)
            win = tbl_ref[pl.ds(base, W), :]
            acc = acc + win[0, 0] * 1e-9 + win[7, 127] * 1e-9
        elif variant == "min_slice":
            base = jnp.clip(jnp.min(row), 0, rows - W)
            win = tbl_ref[pl.ds(base, W), :]
            acc = acc + win[0, 0] * 1e-9 + win[7, 127] * 1e-9
        elif variant == "onehot_static":
            win = tbl_ref[0:W, :]
            rel = jnp.clip(row - (it * 0), 0, W - 1)
            wv = _lookup_window(win, rel, lane, W)
            acc = acc + wv * 1e-9
        else:  # full
            base = jnp.clip(jnp.min(row), 0, rows - W)
            win = tbl_ref[pl.ds(base, W), :]
            rel = jnp.clip(row - base, 0, W - 1)
            wv = _lookup_window(win, rel, lane, W)
            acc = acc + wv * 1e-9
        return (nvx, nvy, nvz, acc, it + 1)

    s = jax.lax.while_loop(cond, body, state)
    out_ref[:] = s[3]


def main():
    out = {}
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W_IMG)
    n = o.shape[0]
    pad = (-n) % 1024
    o = jnp.concatenate([o, jnp.zeros((pad, 3))])
    d = jnp.concatenate([d, jnp.ones((pad, 3))])
    nt = (n + pad) // 1024
    t3 = lambda x: x.reshape(nt * 8, 128)
    chans = [t3(o[:, 0]), t3(o[:, 1]), t3(o[:, 2]),
             t3(d[:, 0]), t3(d[:, 1]), t3(d[:, 2])]
    rows = accel.rows

    def run(variant):
        ray_spec = pl.BlockSpec(TILE, lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        tbl_spec = pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            functools.partial(_kernel, variant=variant),
            grid=(nt, 1),
            in_specs=[ray_spec] * 6 + [tbl_spec],
            out_specs=ray_spec,
            out_shape=jax.ShapeDtypeStruct((nt * 8, 128), jnp.float32),
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
        return dt, compile_s

    for variant in ("empty", "dyn_slice", "min_slice", "onehot_static",
                    "full"):
        try:
            dt, cs = run(variant)
            out[variant] = dict(ms=round(dt * 1e3, 1),
                                compile_s=round(cs, 1),
                                per_iter_us=round(dt / (nt * N_ITERS) * 1e6,
                                                  3))
        except Exception as e:
            out[variant] = dict(error=str(e)[:300])
        print(json.dumps({variant: out[variant]}), flush=True)
        with open("tools/probe_pallas2_fixed_out.json", "w") as fp:
            json.dump(out, fp, indent=1)


if __name__ == "__main__":
    main()
