"""Pallas TPU march kernel — the TPU-native rebuild of the reference's
per-pixel OpenCL ray-march kernel (SURVEY.md §3 C1, §4.3), designed for the
hardware instead of translated from it.

Design (per-tile SPMD, everything resident on-chip):

  * grid = ray tiles of 1024 rays shaped [8, 128] (VPU-native tiles); each
    program marches one tile to completion with a per-tile early-exit
    ``while_loop`` — the masked-divergence answer to the OpenCL kernel's
    per-work-item divergent loop.
  * the world lives in VMEM as a packed coarse-cell word table
    (world/packed.py): ONE logical fetch per march step returns both the
    2x2x2 fine child-occupancy bits (exact hit test) and the coarse
    chessboard distance (conservative empty-space jump) — the capability of
    the reference's octree descent with one table access and zero pointer
    chasing.
  * TPU v5e exposes no fast per-lane random access (neither XLA gather nor
    Mosaic's dynamic_gather is usable at speed — measured on hardware), so
    the fetch is built from MXU + VPU primitives: transpose the per-ray
    (row, lane) indices, and for each of 8 ray-columns do a row-one-hot
    [128, rows] @ table [rows, 128] matmul followed by a lane-one-hot
    multiply+reduce. Words are float32-exact (< 2^16).

Semantics are identical to render/kernel_xla.march_xla_df (jumps only ever
cross provably-empty voxels), which is itself parity-locked to the per-ray
oracle render/kernel_ref — see tests/test_pallas.py.

Scaling note: the one-hot fetch is O(table_rows) per step, so this v1 is
intended for grids whose packed table stays small (64^3 -> 256 rows,
128^3 -> 2048). The flagship-scale successor is render/kernel_pallas_v2.py:
a Morton-ordered table + dynamic [base : base+W] row window (``pl.ds``,
scalar base from a min-reduce) drops the per-step cost to O(W) and runs at
512^3 (131072 rows, VMEM-resident). v1 is kept as the simpler parity rung.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vxtpu.render.types import HitRecord
from vxtpu.world.packed import PackedAccel, build_packed, coarse_dims

TILE = (8, 128)
TILE_RAYS = TILE[0] * TILE[1]
EPS = 1e-4
BIG = 3.0e30
BIG_T = 1e30


def _lookup(tbl, row, lane, rows):
    """tbl [rows,128] f32, row/lane int32 [8,128] -> tbl[row, lane] [8,128].

    MXU one-hot gather: per static ray-column c, G = rowOH @ tbl selects
    each ray's table row, then a lane-one-hot reduce picks the lane.
    """
    rt = jnp.transpose(row)                       # [128, 8] int32
    lt = jnp.transpose(lane)                      # [128, 8] int32
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (128, rows), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    cols = []
    for c in range(8):
        rc = rt[:, c:c + 1]                       # [128, 1] static lane slice
        lc = lt[:, c:c + 1]
        rowoh = (iota_r == rc).astype(jnp.float32)
        g = jnp.dot(rowoh, tbl, preferred_element_type=jnp.float32)  # [128,128]
        laneoh = (iota_l == lc).astype(jnp.float32)
        cols.append(jnp.sum(g * laneoh, axis=1, keepdims=True))      # [128,1]
    return jnp.transpose(jnp.concatenate(cols, axis=1))              # [8,128]


def _childbit(cb, vx, vy, vz):
    """Bit of the 8-bit child mask for fine voxel (vx,vy,vz) in its cell."""
    ci = ((vx & 1) << 2) | ((vy & 1) << 1) | (vz & 1)
    bit = jnp.zeros_like(cb)
    for k in range(8):
        bit = jnp.where(ci == k, (cb >> k) & 1, bit)
    return bit


def _march_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                  tbl_ref,
                  hit_ref, t_ref, vx_ref, vy_ref, vz_ref, ax_ref, sg_ref,
                  steps_ref,
                  *, dims, max_steps):
    X, Y, Z = dims
    cxd, cyd, czd = coarse_dims(dims)
    rows = tbl_ref.shape[0]
    tbl = tbl_ref[:]

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    t_max = tmax_ref[0]

    def inv(d):
        tiny = jnp.abs(d) < 1e-12
        return jnp.where(tiny, BIG, 1.0 / jnp.where(tiny, 1.0, d))

    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)

    # ---- slab clip against [0,X]x[0,Y]x[0,Z] (dda.ray_grid_clip)
    def slab(o, iv, dim):
        t0 = (0.0 - o) * iv
        t1 = (dim - o) * iv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    nx, fx = slab(ox, ivx, float(X))
    ny, fy = slab(oy, ivy, float(Y))
    nz, fz = slab(oz, ivz, float(Z))
    t_enter = jnp.maximum(jnp.maximum(nx, ny), jnp.maximum(nz, 0.0))
    t_exit = jnp.minimum(jnp.minimum(fx, fy), fz)
    valid = t_enter <= t_exit
    t_end = jnp.minimum(t_exit, t_max)

    sgx = jnp.where(dx >= 0, 1, -1).astype(jnp.int32)
    sgy = jnp.where(dy >= 0, 1, -1).astype(jnp.int32)
    sgz = jnp.where(dz >= 0, 1, -1).astype(jnp.int32)

    def reinit(t):
        px = ox + (t + EPS) * dx
        py = oy + (t + EPS) * dy
        pz = oz + (t + EPS) * dz
        vx = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, X - 1)
        vy = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, Y - 1)
        vz = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, Z - 1)
        inside = (
            (px >= 0) & (px < X) & (py >= 0) & (py < Y) & (pz >= 0) & (pz < Z)
        )
        return vx, vy, vz, inside

    def fetch(vx, vy, vz):
        cx, cy, cz = vx >> 1, vy >> 1, vz >> 1
        widx = (cx * cyd + cy) * czd + cz
        w = _lookup(tbl, widx >> 7, widx & 127, rows).astype(jnp.int32)
        return w & 255, w >> 8   # child bits, coarse distance

    vx0, vy0, vz0, _ = reinit(t_enter)
    cb0, d0 = fetch(vx0, vy0, vz0)
    solid0 = _childbit(cb0, vx0, vy0, vz0) == 1
    first_hit = valid & solid0 & (t_enter <= t_max)
    # entry face: axis whose near-slab t is largest (ties -> lowest axis),
    # matching dda.entry_face_mask
    tn_max = jnp.maximum(jnp.maximum(nx, ny), nz)
    eax = jnp.where(nx >= tn_max, 0, jnp.where(ny >= tn_max, 1, 2))
    esg = jnp.where(eax == 0, sgx, jnp.where(eax == 1, sgy, sgz))

    zero = jnp.zeros(TILE, jnp.int32)
    # flags ride the while_loop carry as int32 (i1 vector carries trip a
    # Mosaic "unsupported target bitwidth" on this toolchain)
    state = (
        vx0, vy0, vz0,                                   # current voxel
        cb0, d0,                                         # fetched word at it
        first_hit.astype(jnp.int32),                     # hit
        jnp.where(first_hit, t_enter, BIG_T),            # t_hit
        jnp.where(first_hit, eax, zero),                 # hit axis
        jnp.where(first_hit, esg, zero),                 # hit step sign
        zero,                                            # steps
        (first_hit | ~valid).astype(jnp.int32),          # done
        jnp.int32(0),                                    # iter
    )

    def cond(s):
        done, it = s[10], s[11]
        # integer min-reduce: an i1 all-reduce trips Mosaic bitwidth checks
        return (it < max_steps) & (jnp.min(done) == 0)

    def body(s):
        vx, vy, vz, cb, dist, hit, t_hit, rax, rsg, steps, done, it = s
        active = done == 0

        # --- box to exit: D >= 1 -> empty coarse box of radius D-1 around
        # the cell; D == 0 -> the current fine voxel (plain DDA step).
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
        ax = jnp.where(mx, 0, jnp.where(my, 1, 2))
        sg = jnp.where(mx, sgx, jnp.where(my, sgy, sgz))

        nvx, nvy, nvz, inside = reinit(t_new)
        # progress guard: fp rounding re-landed in the same voxel -> force a
        # single DDA step along the crossing axis (exact: the boundary of
        # that axis is crossed at t_new by construction)
        stuck = (nvx == vx) & (nvy == vy) & (nvz == vz)
        nvx = jnp.where(stuck & mx, jnp.clip(vx + sgx, 0, X - 1), nvx)
        nvy = jnp.where(stuck & my, jnp.clip(vy + sgy, 0, Y - 1), nvy)
        mz = ~mx & ~my
        nvz = jnp.where(stuck & mz, jnp.clip(vz + sgz, 0, Z - 1), nvz)
        # the forced step can itself leave the grid
        fx_ = vx + sgx
        fy_ = vy + sgy
        fz_ = vz + sgz
        # boolean algebra, not where-selects: Mosaic rejects vselects whose
        # VALUE operands are i1 vectors ("unsupported target bitwidth")
        f_in = (
            (mx & (fx_ >= 0) & (fx_ < X))
            | (my & (fy_ >= 0) & (fy_ < Y))
            | (mz & (fz_ >= 0) & (fz_ < Z))
        )
        inside = (stuck & f_in) | (~stuck & inside)

        past_end = t_new > t_end
        ncb, ndist = fetch(nvx, nvy, nvz)
        solid = _childbit(ncb, nvx, nvy, nvz) == 1
        new_hit = active & inside & ~past_end & solid
        newly_done = new_hit | (active & (~inside | past_end))

        upd = active
        sel = lambda c, a, b: jnp.where(c, a, b)
        return (
            sel(upd, nvx, vx), sel(upd, nvy, vy), sel(upd, nvz, vz),
            sel(upd, ncb, cb), sel(upd, ndist, dist),
            hit | new_hit.astype(jnp.int32),
            sel(new_hit, t_new, t_hit),
            sel(new_hit, ax, rax),
            sel(new_hit, sg, rsg),
            steps + upd.astype(jnp.int32),
            done | newly_done.astype(jnp.int32),
            it + 1,
        )

    s = jax.lax.while_loop(cond, body, state)
    vx, vy, vz, _, _, hit, t_hit, rax, rsg, steps, _, _ = s

    hit_ref[0] = hit
    t_ref[0] = t_hit
    vx_ref[0] = vx
    vy_ref[0] = vy
    vz_ref[0] = vz
    ax_ref[0] = rax
    sg_ref[0] = rsg
    steps_ref[0] = steps


def march_pallas(o: jax.Array, d: jax.Array, accel: PackedAccel,
                 dims: tuple[int, int, int], max_steps: int,
                 t_max: jax.Array | None = None,
                 interpret: bool = False) -> HitRecord:
    """March rays o,d [N,3] through the packed-accel world; HitRecord [N].

    Hit-equivalent to kernel_xla.march_xla_df / kernel_ref (parity-tested).
    """
    n = o.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), BIG_T, dtype=jnp.float32)
    pad = (-n) % TILE_RAYS
    if pad:
        # padding rays point away from the grid -> immediate invalid/miss
        o = jnp.concatenate([o, jnp.full((pad, 3), -10.0, o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], d.dtype), (pad, 1))]
        )
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    nt = (n + pad) // TILE_RAYS

    tile3 = lambda x: x.reshape(nt, *TILE)
    ins = [tile3(o[:, 0]), tile3(o[:, 1]), tile3(o[:, 2]),
           tile3(d[:, 0]), tile3(d[:, 1]), tile3(d[:, 2]), tile3(t_max)]

    ray_spec = pl.BlockSpec((1, *TILE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nt, *TILE), t)
                 for t in (jnp.int32, jnp.float32, jnp.int32, jnp.int32,
                           jnp.int32, jnp.int32, jnp.int32, jnp.int32)]

    kern = functools.partial(_march_kernel, dims=dims, max_steps=max_steps)
    outs = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[ray_spec] * 7 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[ray_spec] * 8,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins, accel.words)

    hit, t, vx, vy, vz, ax, sg, steps = [x.reshape(-1)[:n] for x in outs]
    voxel = jnp.stack([vx, vy, vz], axis=-1)
    normal = -sg[:, None].astype(jnp.float32) * jax.nn.one_hot(ax, 3,
                                                               dtype=jnp.float32)
    normal = jnp.where(hit[:, None] > 0, normal, 0.0)
    return HitRecord(hit=hit > 0, t=t, voxel=voxel, normal=normal,
                     steps=steps)


def make_march_pallas(occ_flat, dims, settings, accel=None,
                      interpret: bool = False):
    """Pipeline march-factory (same shape as make_march_xla). ``accel`` must
    be a PackedAccel (built from the grid if omitted)."""
    if not isinstance(accel, PackedAccel):
        occ = occ_flat.reshape(dims)
        accel = build_packed(occ)
    max_steps = settings.resolve_max_steps(dims)
    return functools.partial(march_pallas, accel=accel, dims=dims,
                             max_steps=max_steps, interpret=interpret)
