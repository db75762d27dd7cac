"""EXPERIMENTAL Pallas trilinear-gather kernel — the forward half of the
contract's "custom VJP backward kernel" (SURVEY.md §2 L0, §4.5): the soft
renderer's per-sample field evaluation without XLA's per-index gather
floor (measured ~10.5 ns/index on the bench endpoint; the one-hot MXU
fetch amortizes to ~2.4 us per 1024 lookups ≈ 2.3 ns each).

Design (same machinery as the march kernel, render/kernel_pallas_v2):

  * the scalar field is re-laid out in FINE-VOXEL MORTON order as an
    [X*Y*Z/128, 128] f32 table (``build_field_morton``) — row-major
    locality is anisotropic (x-neighbors are X*Y apart), Morton locality
    is isotropic, which is what makes a compact row WINDOW cover all 8
    trilinear corners of a coherent sample tile;
  * samples are tiled [8,128]; each kernel iteration DMA-slices a dynamic
    W-row window at the min still-needed corner row and fetches ALL EIGHT
    corners of every in-window sample with one batched one-hot matmul
    ([8*1024, W] @ [W, 128] bf16 is NOT exact for general f32 fields —
    the fetch runs at Precision.HIGHEST f32, see the r4 matfetch trap);
  * a mini-loop (like the march's material fetch) re-windows until every
    sample has all corners, then the trilinear weights combine in-tile.

Parity: tests/test_trilerp.py locks interpret-mode output to
render/soft.trilinear bit-for-bit modulo fp addition order (allclose).
Status (measured on device, tools/probe_r4_trilerp_out.json): EXACT
(max_abs_err 0.0 at 64k samples — Mosaic health + the HIGHEST-precision
fetch verified) but 0.58x the XLA gather's speed at the 4.2M-sample
train shape: eight separate f32 one-hot matmuls per iteration pay the
fixed fetch machinery eight times. The measured fix for round 5: store
the field as 8 PARITY-SHIFTED Morton copies (64 MB at 128^3) so every
trilinear stencil becomes ONE aligned group of 8 CONSECUTIVE Morton
lanes (groups never straddle a 128-lane row: aligned indices mod 8 == 0
start at lane <= 120) — one matmul + eight cheap lane-selects per
iteration instead of eight matmuls. Forward only; the backward scatter
(one-hot transpose into an aliased accumulator) is the other half of
the SURVEY §8 round-5 plan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vxtpu.render.kernel_pallas_v2 import (TILE, TILE_RAYS, _morton3,
                                           _tile_layout)
from vxtpu.world.packed import morton3

LANES = 128


def build_field_morton(field: jax.Array) -> jax.Array:
    """[X,Y,Z] f32 -> fine-voxel-Morton [X*Y*Z/128, 128] table (cubic
    power-of-two dims)."""
    X, Y, Z = field.shape
    assert X == Y == Z and (X & (X - 1)) == 0, "cubic power-of-two only"
    ii, jj, kk = jnp.meshgrid(jnp.arange(X), jnp.arange(Y), jnp.arange(Z),
                              indexing="ij")
    mi = morton3(ii, jj, kk).reshape(-1)
    flat = jnp.zeros((X * Y * Z,), jnp.float32).at[mi].set(
        field.reshape(-1).astype(jnp.float32))
    return flat.reshape(-1, LANES)


def _corner_lookup(win, rel, lane, W):
    """f32-exact one-hot fetch of 8 corner planes at once.

    rel/lane: int32 [8, 8, 128] (corner-major). Builds one [64*128, W]
    one-hot and a single HIGHEST-precision matmul; returns [8, 8, 128].
    """
    outs = []
    for corner in range(8):
        wt = jnp.transpose((rel[corner] << 7) | lane[corner])   # [128,8]
        rt = wt >> 7
        lt = wt & 127
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (128, W), 1)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rowoh = jnp.concatenate(
            [(iota_w == rt[:, c:c + 1]).astype(jnp.float32)
             for c in range(8)], axis=0)                        # [1024, W]
        g = jnp.dot(rowoh, win, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        cols = []
        for c in range(8):
            laneoh = (iota_l == lt[:, c:c + 1]).astype(jnp.float32)
            cols.append(jnp.sum(g[c * 128:(c + 1) * 128] * laneoh, axis=1,
                                keepdims=True))
        outs.append(jnp.transpose(jnp.concatenate(cols, axis=1)))
    return jnp.stack(outs, axis=0)                              # [8,8,128]


def _trilerp_kernel(px_ref, py_ref, pz_ref, tbl_ref, out_ref, mwin_ref,
                    msem_ref, *, dim, window):
    rows = tbl_ref.shape[0]
    W = min(window, rows)
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
    D = dim

    q0x = jnp.floor(px - 0.5)
    q0y = jnp.floor(py - 0.5)
    q0z = jnp.floor(pz - 0.5)
    fx = (px - 0.5) - q0x
    fy = (py - 0.5) - q0y
    fz = (pz - 0.5) - q0z
    i0x = jnp.clip(q0x.astype(jnp.int32), 0, D - 1)
    i0y = jnp.clip(q0y.astype(jnp.int32), 0, D - 1)
    i0z = jnp.clip(q0z.astype(jnp.int32), 0, D - 1)
    i1x = jnp.clip(i0x + 1, 0, D - 1)
    i1y = jnp.clip(i0y + 1, 0, D - 1)
    i1z = jnp.clip(i0z + 1, 0, D - 1)

    rows_c = []
    lanes_c = []
    for corner in range(8):
        cx = i1x if (corner & 4) else i0x
        cy = i1y if (corner & 2) else i0y
        cz = i1z if (corner & 1) else i0z
        widx = _morton3(cx, cy, cz)
        rows_c.append(widx >> 7)
        lanes_c.append(widx & 127)
    row8 = jnp.stack(rows_c, axis=0)           # [8, 8, 128]
    lane8 = jnp.stack(lanes_c, axis=0)

    zero = jnp.zeros((8,) + TILE, jnp.float32)
    got0 = jnp.zeros((8,) + TILE, jnp.int32)

    def cond(s):
        got, _, it = s
        return (it < jnp.int32(8 * TILE_RAYS)) & (jnp.min(got) == 0)

    def body(s):
        got, vals, it = s
        pend = got == 0
        base = jnp.min(jnp.where(pend, row8, rows - 1))
        base = jnp.maximum(jnp.minimum(base, rows - W), 0)
        rel = row8 - base
        inw = (rel >= 0) & (rel < W)
        cp = pltpu.make_async_copy(tbl_ref.at[pl.ds(base, W), :],
                                   mwin_ref, msem_ref)
        cp.start()
        cp.wait()
        wv = _corner_lookup(mwin_ref[:], jnp.clip(rel, 0, W - 1), lane8, W)
        take = pend & inw
        vals = jnp.where(take, wv, vals)
        return got | take.astype(jnp.int32), vals, it + 1

    _, c, _ = jax.lax.while_loop(cond, body, (got0, zero, jnp.int32(0)))

    c00 = c[0] * (1 - fz) + c[1] * fz          # i0x i0y
    c01 = c[2] * (1 - fz) + c[3] * fz          # i0x i1y
    c10 = c[4] * (1 - fz) + c[5] * fz          # i1x i0y
    c11 = c[6] * (1 - fz) + c[7] * fz          # i1x i1y
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    out_ref[:] = c0 * (1 - fx) + c1 * fx


def trilerp_pallas(table: jax.Array, p: jax.Array, dim: int,
                   window: int = 512,
                   interpret: bool = False) -> jax.Array:
    """Trilinear interpolation of a Morton field table at points p [N,3]
    (voxel-center convention, edge-clamped — matches soft.trilinear for a
    [dim]^3 scalar field). table: build_field_morton output."""
    n = p.shape[0]
    pack, unpack, raw_shape, grid = _tile_layout(n, None, None)
    rows = table.shape[0]
    W = min(window, rows)
    chans = [pack(p[:, 0], 0.0), pack(p[:, 1], 0.0), pack(p[:, 2], 0.0)]
    ray_spec = pl.BlockSpec(TILE, lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_trilerp_kernel, dim=dim, window=W),
        grid=grid,
        in_specs=[ray_spec] * 3 + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct(raw_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((W, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(W * 128 * 4 + 24 * 1024 * 1024,
                                 127 * 1024 * 1024)),
        interpret=interpret,
    )(*chans, table)
    return unpack(out)
