"""Round-5 fetch restructure probe: collapse the one-hot machinery's OP
COUNT (probe_pallas2_fixed showed the ~1.67us/iter fetch cost is
window-size INDEPENDENT, i.e. op-issue-bound, not element-bound: the
current _lookup_window spends ~36 vector ops on 8-way compare loops,
concats, transposes and per-column lane-select reduces).

The v3 candidate builds the whole fetch in ~7 ops using 3-D broadcasting:

  rowoh3 = (iota[8,128,W] == row[:,:,None])      one compare, no transpose
  oh2    = rowoh3.reshape(1024, W)               leading-dim merge (layout
                                                 no-op: minor dim unchanged)
  g      = oh2 @ win                             one MXU matmul (bf16)
  g3     = g.reshape(8, 128, 128)                leading-dim split
  sel    = (iota[8,128,128] == lane[:,:,None])   one compare
  wv     = sum(g3 * sel, axis=2)                 one mul + one minor reduce
                                                 -> [8,128], NO transpose

Round-4's flat attempt failed on a Mosaic [128,1]->[1024,1] CONCAT bug;
this formulation has no concat anywhere.

Variants (N=48 forced iters, flagship tile count, W=512, real 512^3 table):
  empty        loop+DDA baseline          (r4: 0.311 us/iter)
  full_cur     dyn win + min + current    (r4: 2.449)
  full_v3      dyn win + min + v3
  v3_static    v3 from a static window    (isolate: no slice/min)
  v3_build     compare+reshape+matmul only
  v3_extract   extraction ops only (static g)
  full_v3_split  two W/2 segments (concat) + v3  (the benched split shape)

Also asserts full_v3's accumulated output == full_cur's (device numerics).
Writes tools/probe_r5_fetch_out.json.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r5_fetch.py
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


def _lookup_v3(win, row_rel, lane, Wn, dtype=jnp.bfloat16):
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                 else None)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (8, 128, Wn), 2)
    oh = (iota_w == row_rel[:, :, None]).astype(dtype).reshape(1024, Wn)
    g = jnp.dot(oh, win.astype(dtype), preferred_element_type=jnp.float32,
                precision=precision).reshape(8, 128, 128)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
    sel = (iota_l == lane[:, :, None]).astype(jnp.float32)
    return jnp.sum(g * sel, axis=2)


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
        elif variant == "full_cur":
            base = jnp.clip(jnp.min(row), 0, rows - W)
            win = tbl_ref[pl.ds(base, W), :]
            rel = jnp.clip(row - base, 0, W - 1)
            wv = _lookup_window(win, rel, lane, W)
            acc = acc + wv * 1e-9
        elif variant == "full_v3":
            base = jnp.clip(jnp.min(row), 0, rows - W)
            win = tbl_ref[pl.ds(base, W), :]
            rel = jnp.clip(row - base, 0, W - 1)
            wv = _lookup_v3(win, rel, lane, W)
            acc = acc + wv * 1e-9
        elif variant == "v3_static":
            win = tbl_ref[0:W, :]
            rel = jnp.clip(row, 0, W - 1)
            wv = _lookup_v3(win, rel, lane, W)
            acc = acc + wv * 1e-9
        elif variant == "v3_build":
            win = tbl_ref[0:W, :]
            rel = jnp.clip(row, 0, W - 1)
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (8, 128, W), 2)
            oh = (iota_w == rel[:, :, None]).astype(jnp.bfloat16)
            g = jnp.dot(oh.reshape(1024, W), win.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            acc = acc + g[0:8, :] * 1e-9
        elif variant == "v3_extract":
            g3 = (tbl_ref[0:128, :])[None, :, :] + jnp.zeros(
                (8, 128, 128), jnp.float32)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
            sel = (iota_l == lane[:, :, None]).astype(jnp.float32)
            acc = acc + jnp.sum(g3 * sel, axis=2) * 1e-9
        else:  # full_v3_split
            Wh = W // 2
            base1 = jnp.clip(jnp.min(row), 0, rows - Wh)
            r1 = row - base1
            cov1 = (r1 >= 0) & (r1 < Wh)
            base2 = jnp.clip(
                jnp.min(jnp.where(cov1, rows - 1, row)), 0, rows - Wh)
            r2 = row - base2
            win = jnp.concatenate([tbl_ref[pl.ds(base1, Wh), :],
                                   tbl_ref[pl.ds(base2, Wh), :]], axis=0)
            rel = jnp.clip(jnp.where(cov1, r1, Wh + r2), 0, W - 1)
            wv = _lookup_v3(win, rel, lane, W)
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

    for variant in ("empty", "full_cur", "full_v3", "v3_static",
                    "v3_build", "v3_extract", "full_v3_split"):
        try:
            dt, cs = run(variant)
            out[variant] = dict(ms=round(dt * 1e3, 1),
                                compile_s=round(cs, 1),
                                per_iter_us=round(dt / (nt * N_ITERS) * 1e6,
                                                  3))
        except Exception as e:
            out[variant] = dict(error=str(e)[:300])
        print(json.dumps({variant: out[variant]}), flush=True)
        with open("tools/probe_r5_fetch_out.json", "w") as fp:
            json.dump(out, fp, indent=1)
    if "full_cur" in sums and "full_v3" in sums:
        # accumulated dep values chain through the timing loop; compare the
        # FIRST-call sums instead would be cleaner, but matching final deps
        # across identical iteration counts is a strong device-parity check
        out["v3_matches_cur"] = bool(
            abs(sums["full_cur"] - sums["full_v3"])
            <= 1e-6 * max(1.0, abs(sums["full_cur"])))
        with open("tools/probe_r5_fetch_out.json", "w") as fp:
            json.dump(out, fp, indent=1)
        print(json.dumps({"v3_matches_cur": out["v3_matches_cur"]}),
              flush=True)


if __name__ == "__main__":
    main()
