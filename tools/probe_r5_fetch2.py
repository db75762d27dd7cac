"""Round-5 fetch probe, part 2: attack the two measured halves of the v3
fetch (probe_r5_fetch_out.json: build+matmul ~0.86us, extract ~0.87us,
loop+DDA 0.32, slice+min ~0.35).

Build side — matmul FLOPs now matter (the old design was op-issue-bound
and W-independent; v3 is leaner so W scales):
  full_v3_w256 / full_v3_w128   window sweep of the full v3 fetch
  v3_build_w128                 isolate build+matmul at W=128

Extract side (all from a static window, W=512, so numbers compare to
v3_extract = 0.87):
  ex_matmul    (G*sel) reshaped [1024,128] @ ones[128,1] -> [1024,1]
               -> reshape [8,128]  (matmul-reduce; tests whether the
               [1024,1]->[8,128] reshape lowers without the r4 concat bug)
  ex_bf16      compare+mul in bf16, reduce in f32
  ex_cur       round-4 per-sublane-column extraction (isolated, for the
               old-vs-v3 split)

Combined candidates:
  full_v4_w256 v3 build + ex_matmul extract, W=256
  full_v4_w128 same at W=128

Writes tools/probe_r5_fetch2_out.json.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r5_fetch2.py
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
from vxtpu.render.kernel_pallas_v2 import TILE, _morton3
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed_morton

DIMS = (512, 512, 512)
H, W_IMG = 1080, 1920
N_ITERS = 48


def _build_v3(win, rel, Wn):
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (8, 128, Wn), 2)
    oh = (iota_w == rel[:, :, None]).astype(jnp.bfloat16).reshape(1024, Wn)
    return jnp.dot(oh, win.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _ex_v3(g, lane):
    g3 = g.reshape(8, 128, 128)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
    sel = (iota_l == lane[:, :, None]).astype(jnp.float32)
    return jnp.sum(g3 * sel, axis=2)


def _ex_matmul(g, lane):
    g3 = g.reshape(8, 128, 128)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
    sel = (iota_l == lane[:, :, None]).astype(jnp.float32)
    gm = (g3 * sel).reshape(1024, 128)
    ones = jnp.ones((128, 1), jnp.float32)
    out = jnp.dot(gm, ones, preferred_element_type=jnp.float32)
    return out.reshape(8, 128)


def _ex_bf16(g, lane):
    g3 = g.astype(jnp.bfloat16).reshape(8, 128, 128)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
    sel = (iota_l == lane[:, :, None]).astype(jnp.bfloat16)
    return jnp.sum((g3 * sel).astype(jnp.float32), axis=2)


def _ex_cur(g, lane):
    lt = jnp.transpose(lane)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    cols = []
    for c in range(8):
        laneoh = (iota_l == lt[:, c:c + 1]).astype(jnp.float32)
        cols.append(jnp.sum(g[c * 128:(c + 1) * 128] * laneoh, axis=1,
                            keepdims=True))
    return jnp.transpose(jnp.concatenate(cols, axis=1))


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

        if variant.startswith("full_v3_w"):
            W = int(variant.split("w")[1])
            base = jnp.clip(jnp.min(row), 0, rows - W)
            win = tbl_ref[pl.ds(base, W), :]
            rel = jnp.clip(row - base, 0, W - 1)
            acc = acc + _ex_v3(_build_v3(win, rel, W), lane) * 1e-9
        elif variant.startswith("full_v4_w"):
            W = int(variant.split("w")[1])
            base = jnp.clip(jnp.min(row), 0, rows - W)
            win = tbl_ref[pl.ds(base, W), :]
            rel = jnp.clip(row - base, 0, W - 1)
            acc = acc + _ex_matmul(_build_v3(win, rel, W), lane) * 1e-9
        elif variant == "v3_build_w128":
            W = 128
            win = tbl_ref[0:W, :]
            rel = jnp.clip(row, 0, W - 1)
            g = _build_v3(win, rel, W)
            acc = acc + g[0:8, :] * 1e-9
        elif variant.startswith("ex_"):
            W = 512
            win = tbl_ref[0:W, :]
            g = win[0:128, :][None, :, :] + jnp.zeros((8, 128, 128),
                                                      jnp.float32)
            g = g.reshape(1024, 128)
            fn = {"ex_matmul": _ex_matmul, "ex_bf16": _ex_bf16,
                  "ex_cur": _ex_cur}[variant]
            acc = acc + fn(g, lane) * 1e-9
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
    sums = {}

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
        sums[variant] = float(dep)
        return dt, compile_s

    for variant in ("full_v3_w256", "full_v3_w128", "v3_build_w128",
                    "ex_matmul", "ex_bf16", "ex_cur",
                    "full_v4_w256", "full_v4_w128", "full_v4_w512"):
        try:
            dt, cs = run(variant)
            out[variant] = dict(ms=round(dt * 1e3, 1),
                                compile_s=round(cs, 1),
                                per_iter_us=round(dt / (nt * N_ITERS) * 1e6,
                                                  3))
        except Exception as e:
            out[variant] = dict(error=str(e)[:300])
        print(json.dumps({variant: out[variant]}), flush=True)
        with open("tools/probe_r5_fetch2_out.json", "w") as fp:
            json.dump(out, fp, indent=1)


if __name__ == "__main__":
    main()
