"""Round-4 second-stage tuning probe (run after the split/local results in
probe_r4_kernel_out.json):

  march sweep   real march_pallas_v2 at the flagship: split window total
                512 / 768 / 1024 / 1536 at unroll 2, and unroll 1/4 at
                w1024 — stalls depend on W even though per-iter cost
                doesn't, so the optimum is not obvious.
  fetch variants (forced-iteration standalone kernel, probe_pallas2_fixed
                pattern): the current _lookup_window vs a 'lane_flat'
                formulation that replaces the 8 per-sublane lane-one-hot
                reduces + concat + transpose with ONE [1024,128] masked
                reduce + reshape — candidates for cutting the ~1.7 us
                fixed one-hot machinery.

Writes tools/probe_r4_tune_out.json incrementally."""

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
from vxtpu.render.kernel_pallas_v2 import (TILE, _morton3, march_pallas_v2)
from vxtpu.world import procgen
from vxtpu.world.packed import PackedMorton, build_packed_morton

DIMS = (512, 512, 512)
H, W_IMG = 1080, 1920
N_ITERS = 48
WIN = 512

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r4_tune_out.json")
RES = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        RES = json.load(f)


def save(name, entry):
    RES[name] = entry
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(name, entry, flush=True)


def _lookup_cols(win, row_rel, lane, W):
    """The shipped _lookup_window (8 per-sublane cols + transpose)."""
    from vxtpu.render.kernel_pallas_v2 import _lookup_window

    return _lookup_window(win, row_rel, lane, W)


def _lookup_flat(win, row_rel, lane, W):
    """Candidate: one [1024,128] lane mask + single reduce + reshape
    instead of 8 column reduces + concat + transpose-back."""
    wt = jnp.transpose((row_rel << 7) | lane)     # [128, 8]
    rt = wt >> 7
    lt = wt & 127
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (128, W), 1)
    rowoh_all = jnp.concatenate(
        [(iota_w == rt[:, c:c + 1]).astype(jnp.bfloat16) for c in range(8)],
        axis=0)                                   # [1024, W]
    g_all = jnp.dot(rowoh_all, win.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    lt_all = jnp.concatenate([lt[:, c:c + 1] for c in range(8)], axis=0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1024, 128), 1)
    masked = jnp.where(iota_l == lt_all, g_all, 0.0)
    col = jnp.sum(masked, axis=1)                 # [1024]
    return col.reshape(8, 128)


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tbl_ref,
            out_ref, *, lookup):
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
        base = jnp.clip(jnp.min(row), 0, rows - WIN)
        win = tbl_ref[pl.ds(base, WIN), :]
        rel = jnp.clip(row - base, 0, WIN - 1)
        wv = lookup(win, rel, lane, WIN)
        acc = acc + wv * 1e-9
        return (nvx, nvy, nvz, acc, it + 1)

    s = jax.lax.while_loop(cond, body, state)
    out_ref[:] = s[3]


def main():
    grid = procgen.terrain(DIMS, seed=7)
    accel = build_packed_morton(grid.occupancy, cap=64)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))
    o, d = generate_rays(cam, H, W_IMG)
    max_steps = sum(DIMS) + 2

    # ---- real march: split window/unroll sweep
    def march_time(name, window, unroll):
        if name in RES:
            return

        @jax.jit
        def f(words, oo, dd, dep):
            oo = oo.at[0, 0].add(dep * 1e-12)
            rec = march_pallas_v2(oo, dd, PackedMorton(words=words), DIMS,
                                  max_steps, image_shape=(H, W_IMG),
                                  window=window, block_shape=(32, 32),
                                  split_window=True, local_advance=True,
                                  unroll=unroll)
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0)) * 1e-6

        dep = jnp.float32(0.0)
        t0 = time.perf_counter()
        dep = f(accel.words, o, d, dep)
        float(dep)
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            dep = f(accel.words, o, d, dep)
        float(dep)
        dt = (time.perf_counter() - t0) / 3
        save(name, dict(ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                        mrays=round(H * W_IMG / dt / 1e6, 3)))

    for w in (512, 768, 1024, 1536):
        march_time(f"march_split_w{w}_u2", w, 2)
    march_time("march_split_w1024_u1", 1024, 1)
    march_time("march_split_w1024_u4", 1024, 4)

    # ---- forced-iteration fetch variants
    n = o.shape[0]
    pad = (-n) % 1024
    op = jnp.concatenate([o, jnp.zeros((pad, 3))])
    dp = jnp.concatenate([d, jnp.ones((pad, 3))])
    nt = (n + pad) // 1024
    t3 = lambda x: x.reshape(nt * 8, 128)
    chans = [t3(op[:, 0]), t3(op[:, 1]), t3(op[:, 2]),
             t3(dp[:, 0]), t3(dp[:, 1]), t3(dp[:, 2])]
    rows = accel.rows

    def fetch_time(name, lookup):
        if name in RES:
            return
        ray_spec = pl.BlockSpec(TILE, lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        tbl_spec = pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            functools.partial(_kernel, lookup=lookup),
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
        save(name, dict(ms=round(dt * 1e3, 1),
                        compile_s=round(compile_s, 1),
                        per_iter_us=round(dt / (nt * N_ITERS) * 1e6, 3)))

    fetch_time("fetch_cols", _lookup_cols)
    fetch_time("fetch_flat", _lookup_flat)

    # correctness spot-check of the flat formulation (interpretable shapes)
    key = jax.random.PRNGKey(0)
    win = jax.random.randint(key, (WIN, 128), -64, 255).astype(jnp.float32)
    rr = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, WIN)
    ll = jax.random.randint(jax.random.PRNGKey(2), (8, 128), 0, 128)
    a = _lookup_cols(win, rr, ll, WIN)
    b = _lookup_flat(win, rr, ll, WIN)
    save("flat_matches_cols", dict(ok=bool(jnp.array_equal(a, b))))


if __name__ == "__main__":
    main()
