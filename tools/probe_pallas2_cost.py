"""Per-iteration cost decomposition of the v2 Pallas march kernel.

The stall probe showed per-iter cost is ~2.8-3.1 us nearly independent of
window size — so neither the one-hot matmul nor the window copy dominates.
This probe forces every tile to run exactly N loop iterations (cond ignores
done) and toggles kernel stages, attributing the fixed cost:

    full     = window slice + one-hot matmul + lane reduce + DDA math + sel
    nofetch  = DDA math + sel (wv := -1 constant)
    nomath   = fetch + sel   (target voxel := naive +sg step)
    empty    = loop overhead only (carry rotate + it+1)

per_iter_us = frame_time / (tiles * N).  Writes probe_pallas2_cost_out.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pallas2_cost.py
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
from vxtpu.render.kernel_pallas_v2 import (TILE, _childbit, _lookup_window,
                                           _morton3)
from vxtpu.world import procgen
from vxtpu.world.packed import build_packed_morton

DIMS = (512, 512, 512)
H, W_IMG = 1080, 1920
N_ITERS = 48
BIG = 3.0e30


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tbl_ref, out_ref,
            *, window, variant):
    X, Y, Z = DIMS
    rows = tbl_ref.shape[0]
    W = window
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    def inv(d):
        tiny = jnp.abs(d) < 1e-12
        return jnp.where(tiny, BIG, 1.0 / jnp.where(tiny, 1.0, d))

    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
    sgx = jnp.where(dx >= 0, 1, -1).astype(jnp.int32)
    sgy = jnp.where(dy >= 0, 1, -1).astype(jnp.int32)
    sgz = jnp.where(dz >= 0, 1, -1).astype(jnp.int32)

    vx0 = jnp.clip(jnp.floor(ox).astype(jnp.int32), 0, X - 1)
    vy0 = jnp.clip(jnp.floor(oy).astype(jnp.int32), 0, Y - 1)
    vz0 = jnp.clip(jnp.floor(oz).astype(jnp.int32), 0, Z - 1)
    zero = jnp.zeros(TILE, jnp.int32)
    state = (vx0, vy0, vz0, zero, zero, jnp.zeros(TILE, jnp.float32),
             jnp.int32(0))

    def cond(s):
        return s[6] < N_ITERS

    def body(s):
        vx, vy, vz, cb, dist, acc, it = s

        if variant in ("full", "nofetch"):
            # --- the real DDA/jump target math (abridged from the kernel)
            cxf = (vx >> 1).astype(jnp.float32)
            cyf = (vy >> 1).astype(jnp.float32)
            czf = (vz >> 1).astype(jnp.float32)
            df = dist.astype(jnp.float32)
            big_jump = dist > 0

            def axis_t(vf, cf, o, d, iv):
                lo = jnp.where(big_jump, 2.0 * cf - 2.0 * (df - 1.0), vf)
                hi = jnp.where(big_jump, 2.0 * cf + 2.0 * df, vf + 1.0)
                bound = jnp.where(d >= 0, hi, lo)
                t = (bound - o) * iv
                return jnp.where(jnp.abs(d) < 1e-12, BIG, t)

            tx = axis_t(vx.astype(jnp.float32), cxf, ox, dx, ivx)
            ty = axis_t(vy.astype(jnp.float32), cyf, oy, dy, ivy)
            tz = axis_t(vz.astype(jnp.float32), czf, oz, dz, ivz)
            t_new = jnp.minimum(jnp.minimum(tx, ty), tz)
            mx = (tx <= ty) & (tx <= tz)
            my = ~mx & (ty <= tz)
            px = ox + (t_new + 1e-4) * dx
            py = oy + (t_new + 1e-4) * dy
            pz = oz + (t_new + 1e-4) * dz
            nvx = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, X - 1)
            nvy = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, Y - 1)
            nvz = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, Z - 1)
            stuck = (nvx == vx) & (nvy == vy) & (nvz == vz)
            nvx = jnp.where(stuck & mx, jnp.clip(vx + sgx, 0, X - 1), nvx)
            nvy = jnp.where(stuck & my, jnp.clip(vy + sgy, 0, Y - 1), nvy)
        else:
            # naive step: cheapest possible progress
            nvx = jnp.clip(vx + sgx, 0, X - 1)
            nvy = jnp.clip(vy + sgy, 0, Y - 1)
            nvz = jnp.clip(vz + sgz, 0, Z - 1)

        if variant in ("full", "nomath"):
            widx = _morton3(nvx >> 1, nvy >> 1, nvz >> 1)
            row = widx >> 7
            lane = widx & 127
            base = jnp.min(row)
            base = jnp.clip(base, 0, rows - W)
            row_rel = jnp.clip(row - base, 0, W - 1)
            win = tbl_ref[pl.ds(base, W), :]
            wv = _lookup_window(win, row_rel, lane, W)
            ncb = jnp.maximum(wv, 0.0).astype(jnp.int32)
            ndist = jnp.maximum(-wv, 0.0).astype(jnp.int32)
            solid = _childbit(ncb, nvx, nvy, nvz) == 1
            acc = acc + jnp.where(solid, 1.0, 0.0)
        elif variant == "empty":
            acc = acc + 1.0
            return (vx, vy, vz, cb, dist, acc, it + 1)
        else:  # nofetch
            ncb = cb
            ndist = dist
            acc = acc + nvx.astype(jnp.float32) * 1e-9

        return (nvx, nvy, nvz, ncb, ndist, acc, it + 1)

    s = jax.lax.while_loop(cond, body, state)
    out_ref[:] = s[5]


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
    window = 1024

    def run(variant, wdw=None):
        ray_spec = pl.BlockSpec(TILE, lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        tbl_spec = pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
        kern = functools.partial(_kernel, window=wdw or window,
                                 variant=variant)
        f = pl.pallas_call(
            kern, grid=(nt, 1),
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
            r = f(*cs, words)
            return jnp.sum(r) * 1e-9

        dep = jnp.float32(0.0)
        t0 = time.perf_counter()
        dep = g(chans, accel.words, dep)
        float(dep)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 2
        for _ in range(iters):
            dep = g(chans, accel.words, jnp.float32(float(dep) * 1e-9))
        float(dep)
        dt = (time.perf_counter() - t0) / iters
        return dt, compile_s

    import sys
    if "--wscale" in sys.argv:
        # fetch-cost scaling vs window size (full variant, forced iters)
        for wdw in (128, 256, 512, 1024):
            global_window = wdw
            try:
                dt, cs = run("full", wdw)
                out[f"full_w{wdw}"] = dict(
                    ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                    per_iter_us=round(dt / (nt * N_ITERS) * 1e6, 3))
            except Exception as e:
                out[f"full_w{wdw}"] = dict(error=str(e)[:300])
            print(json.dumps({f"full_w{wdw}": out[f"full_w{wdw}"]}),
                  flush=True)
            with open("tools/probe_pallas2_cost_wscale_out.json", "w") as fp:
                json.dump(out, fp, indent=1)
        return
    for variant in ("empty", "nofetch", "nomath", "full"):
        try:
            dt, cs = run(variant)
            per_iter_us = dt / (nt * N_ITERS) * 1e6
            out[variant] = dict(ms=round(dt * 1e3, 1),
                                compile_s=round(cs, 1),
                                per_iter_us=round(per_iter_us, 3))
        except Exception as e:
            out[variant] = dict(error=str(e)[:300])
        print(json.dumps({variant: out[variant]}), flush=True)
        with open("tools/probe_pallas2_cost_out.json", "w") as fp:
            json.dump(out, fp, indent=1)


if __name__ == "__main__":
    main()
