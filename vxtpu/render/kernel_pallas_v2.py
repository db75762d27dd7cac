"""Pallas TPU march kernel v2 — the flagship-scale (512³) successor to
render/kernel_pallas.py, implementing the windowed-fetch design that file
documents as "planned v2" (SURVEY.md §7.1; the TPU-native rebuild of the
reference's per-pixel OpenCL hot loop, SURVEY.md §4.3).

What changed vs v1:

  * TABLE LAYOUT: the packed coarse-cell word table (world/packed.py) is
    linearized in Morton (z-order) cell order (build_packed_morton), so a
    spatially-compact cluster of ray positions maps to a compact row RANGE
    of the [rows, 128] table.
  * FETCH: one-hot over a dynamic W-row window ``tbl_ref[pl.ds(base, W)]``
    around the tile's ray cluster (base = min active row, a scalar
    min-reduce) instead of one-hot over ALL rows — O(W) MXU work per step
    instead of O(rows), which is what unlocks 512³ (131072 rows, 64 MB,
    VMEM-resident on v5e's 128 MB; v1's full-row one-hot was unusable past
    128³).
  * STALLS: a ray whose row falls outside the current window simply does
    not advance this iteration (its target voxel is recomputed identically
    next round). The min-row active ray is always in-window, so every
    iteration makes progress and termination is guaranteed; divergence
    costs iterations, never correctness.
  * TILING: rays are blocked as [8, 128] IMAGE PATCHES (pass image_shape)
    rather than scanline runs — adjacent pixels march through adjacent
    cells, which is what keeps the cluster's Morton range narrow. This is
    the TPU analog of the GPU's spatial warp tiling.

Semantics are identical to kernel_pallas / kernel_xla.march_xla_df /
kernel_ref (same jump rule: only provably-empty cells are skipped) —
parity-locked in tests/test_pallas_v2.py including forced tiny windows
that exercise heavy stalling.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vxtpu.render.types import HitRecord
from vxtpu.world.packed import PackedMorton, build_packed_morton

TILE = (8, 128)
TILE_RAYS = TILE[0] * TILE[1]
EPS = 1e-4
BIG = 3.0e30
BIG_T = 1e30


def _part1by2(v):
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _morton3(x, y, z):
    return _part1by2(x) | (_part1by2(y) << 1) | (_part1by2(z) << 2)


def _lookup_window(win, row_rel, lane, W, dtype=jnp.bfloat16):
    """win [W,128] f32, row_rel/lane int32 [8,128] -> f32 win[row_rel, lane].

    Same MXU one-hot gather as v1's _lookup, restricted to the window, but
    BATCHED and in bf16: the 8 per-sublane-row one-hots are stacked into one
    [1024, W] bf16 operand so the fetch is a single bf16 MXU matmul (win's
    signed-integer encoding is bf16-exact, see world/packed.PackedMorton;
    the one-hot row has exactly one nonzero so no accumulation error).
    G = rowOH_all @ win selects each ray's window row, then a lane-one-hot
    reduce picks the lane. Out-of-window rows must be pre-clamped by the
    caller (their results are masked out).

    dtype=jnp.float32 keeps the matmul in f32 with HIGHEST precision —
    required for tables whose words exceed bf16's 8-bit-exact integer
    range (the 24-bit material table, world/packed.build_material_morton).
    On real TPUs the DEFAULT matmul precision casts f32 inputs to bf16
    (measured: tools/probe_r4_matfetch_out.json — 13052 fetched as 13056),
    which interpret-mode CPU runs do not reproduce; HIGHEST selects the
    multi-pass bf16 decomposition that is f32-exact.
    """
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                 else None)
    # ONE transpose of the packed (row<<7|lane) index instead of two: the
    # transpose relayout is part of the measured fixed fetch overhead
    # (tools/probe_pallas2_fixed_out.json)
    wt = jnp.transpose((row_rel << 7) | lane)     # [128, 8]
    rt = wt >> 7
    lt = wt & 127
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (128, W), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    rowoh_all = jnp.concatenate(
        [(iota_w == rt[:, c:c + 1]).astype(dtype) for c in range(8)],
        axis=0)                                   # [1024, W]
    # win's signed encoding is bf16-exact (|values| <= 255); casting the
    # window (not the stored table: Mosaic's dynamic sublane slice needs
    # f32 tiling) runs the fetch at the MXU's bf16 rate
    g_all = jnp.dot(rowoh_all, win.astype(dtype),
                    preferred_element_type=jnp.float32,
                    precision=precision)
    cols = []
    for c in range(8):
        lc = lt[:, c:c + 1]
        laneoh = (iota_l == lc).astype(jnp.float32)
        g = g_all[c * 128:(c + 1) * 128]
        cols.append(jnp.sum(g * laneoh, axis=1, keepdims=True))
    return jnp.transpose(jnp.concatenate(cols, axis=1))  # [8,128] f32


def _lookup_window_v4(win, row_rel, lane, W, dtype=jnp.bfloat16):
    """Round-5 reformulation of _lookup_window: same math, ~5 vector ops.

    The r4 form was op-issue-bound (~36 vector ops/fetch, window-size
    independent — tools/probe_pallas2_fixed_out.json); this one builds the
    row one-hot with ONE 3-D broadcast compare (rank-2 iota against
    row_rel[:, :, None] — no transposes, no concats: the round-4 flat
    attempt died on a Mosaic [128,1]->[1024,1] concat, which this
    formulation never creates) and the leading-dim reshape [8,128,W] ->
    [1024,W] is layout-trivial (minor dim unchanged). The lane select is
    one broadcast compare + mul, reduced by a [1024,128]@[128,1] MXU
    matmul whose [1024,1]->[8,128] reshape measured cheapest of the probed
    reduce forms (tools/probe_r5_fetch2_out.json: ex_matmul). Measured
    2.37 -> 1.92 us/iter at the flagship probe shape (full_v4_w128)."""
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                 else None)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (8, 128, W), 2)
    oh = (iota_w == row_rel[:, :, None]).astype(dtype).reshape(1024, W)
    g = jnp.dot(oh, win.astype(dtype), preferred_element_type=jnp.float32,
                precision=precision)
    g3 = g.reshape(8, 128, 128)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
    sel = (iota_l == lane[:, :, None]).astype(jnp.float32)
    gm = (g3 * sel).reshape(1024, 128)
    out = jnp.dot(gm, jnp.ones((128, 1), jnp.float32),
                  preferred_element_type=jnp.float32)
    return out.reshape(8, 128)


def _lookup_window_v4b(win, row_rel, lane, W, dtype=jnp.bfloat16):
    """Hybrid probe variant: v4's one-compare 3-D one-hot build + r4's
    narrow per-sublane-column lane extraction (small live footprint)."""
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                 else None)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (8, 128, W), 2)
    oh = (iota_w == row_rel[:, :, None]).astype(dtype).reshape(1024, W)
    g_all = jnp.dot(oh, win.astype(dtype),
                    preferred_element_type=jnp.float32,
                    precision=precision)
    lt = jnp.transpose(lane)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    cols = []
    for c in range(8):
        laneoh = (iota_l == lt[:, c:c + 1]).astype(jnp.float32)
        g = g_all[c * 128:(c + 1) * 128]
        cols.append(jnp.sum(g * laneoh, axis=1, keepdims=True))
    return jnp.transpose(jnp.concatenate(cols, axis=1))


def _lookup_window_split(win1, win2, rel, cov1, lane, Wh,
                         dtype=jnp.bfloat16):
    """Two-segment variant of _lookup_window WITHOUT the [W,128] concat
    copy: each ray one-hots against its own Wh-row segment (zeros against
    the other) and the two MXU products are summed — same FLOPs as the
    concat path, no per-iteration window materialization.

    rel: row index RELATIVE to the covering segment's base (pre-clipped to
    [0, Wh)); cov1: True where segment 1 covers the ray. NOTE: rays
    covered by NEITHER segment still produce a valid one-hot row (the
    caller clips rel), so their fetched value is garbage — callers MUST
    mask them out via in_win, exactly as the march body does.
    """
    packed = (jnp.where(cov1, (1 << 27), 0) | (rel << 7) | lane)
    wt = jnp.transpose(packed)                    # [128, 8] one transpose
    c1t = wt >> 27
    rt = (wt >> 7) & 0xFFFFF
    lt = wt & 127
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (128, Wh), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    oh1 = jnp.concatenate(
        [((iota_w == rt[:, c:c + 1]) & (c1t[:, c:c + 1] == 1)).astype(dtype)
         for c in range(8)], axis=0)              # [1024, Wh]
    oh2 = jnp.concatenate(
        [((iota_w == rt[:, c:c + 1]) & (c1t[:, c:c + 1] == 0)).astype(dtype)
         for c in range(8)], axis=0)
    g_all = (jnp.dot(oh1, win1.astype(dtype),
                     preferred_element_type=jnp.float32)
             + jnp.dot(oh2, win2.astype(dtype),
                       preferred_element_type=jnp.float32))
    cols = []
    for c in range(8):
        laneoh = (iota_l == lt[:, c:c + 1]).astype(jnp.float32)
        g = g_all[c * 128:(c + 1) * 128]
        cols.append(jnp.sum(g * laneoh, axis=1, keepdims=True))
    return jnp.transpose(jnp.concatenate(cols, axis=1))  # [8,128] f32


def _childbit(cb, vx, vy, vz):
    """Bit of the 8-bit child mask for fine voxel (vx,vy,vz) in its cell."""
    ci = ((vx & 1) << 2) | ((vy & 1) << 1) | (vz & 1)
    bit = jnp.zeros_like(cb)
    for k in range(8):
        bit = jnp.where(ci == k, (cb >> k) & 1, bit)
    return bit


@dataclasses.dataclass(frozen=True)
class ShadeSpec:
    """Static configuration for IN-KERNEL shading (the fused epilogue).

    The reference shades inside its OpenCL kernel (SURVEY.md §4.3: normal
    from step mask, diffuse+specular per light, fog mix, sky on miss);
    round 3's TPU build shaded in post-march XLA instead, which cost ~40 ms
    of per-ray gathers at the flagship (VERDICT r3 missing #3). The fused
    epilogue runs the whole shade as VPU math on the march tile while it is
    still in VMEM; the only memory traffic is ONE windowed material-table
    fetch per tile (vs one XLA gather per ray).

    Field semantics mirror render/settings.RenderSettings (values are
    copied from it by ``ShadeSpec.from_settings``); palette is the
    world.grid.MATERIAL_RGB table as a static tuple (palette-mode scenes
    only — per-voxel-RGB grids take the XLA shade path).
    """

    mode: str = "lambert"            # 'flat' | 'lambert' | 'full'
    shadows: bool = False            # in-kernel per-light shadow marches
    rgb8: bool = False               # mats = per-voxel RGB8 fine-Morton
    fog: bool = False
    n_lights: int = 1
    use_vis: bool = False            # shadow-visibility input channels
    ambient: float = 0.15
    specular_exp: float = 32.0
    specular_k: float = 0.35
    fog_density: float = 0.004
    sky_top: tuple = (0.35, 0.55, 0.85)
    sky_horizon: tuple = (0.80, 0.88, 0.95)
    palette: tuple = ()
    mat_window: int = 1024

    @staticmethod
    def from_settings(settings, lights, use_vis: bool = False,
                      palette=None, shadows: bool | None = None,
                      rgb8: bool = False) -> "ShadeSpec":
        if palette is None:
            from vxtpu.world.grid import MATERIAL_RGB

            palette = MATERIAL_RGB
        pal = tuple(tuple(float(c) for c in row) for row in
                    jax.device_get(palette))
        assert len(pal) <= 8, "fused shading supports <=8 palette entries"
        pal = pal + ((0.0, 0.0, 0.0),) * (8 - len(pal))
        if shadows is None:
            shadows = bool(settings.shadows) and not use_vis
        return ShadeSpec(
            mode=settings.shading if settings.shading in
            ("flat", "lambert", "full") else "lambert",
            shadows=shadows, rgb8=rgb8,
            fog=settings.fog, n_lights=lights.count, use_vis=use_vis,
            ambient=settings.ambient, specular_exp=settings.specular_exp,
            specular_k=settings.specular_k,
            fog_density=settings.fog_density,
            sky_top=tuple(settings.sky_top),
            sky_horizon=tuple(settings.sky_horizon), palette=pal,
            mat_window=settings.tuning.window)


def pack_lights(lights) -> jax.Array:
    """Lights -> (8, 8) f32 SMEM payload for the fused epilogue: row l =
    [pos.x, pos.y, pos.z, r, g, b, intensity, 0]. Padded rows are zero
    (n_lights is static, so they are never read)."""
    arr = jnp.zeros((8, 8), jnp.float32)
    if lights.count:
        arr = arr.at[:lights.count, 0:3].set(lights.pos)
        arr = arr.at[:lights.count, 3:6].set(lights.rgb)
        arr = arr.at[:lights.count, 6].set(lights.intensity)
    return arr


_SHADOW_EPS = 1e-3  # matches render/shade._SHADOW_EPS (parity-tested)


def _shade_epilogue(spec: ShadeSpec, _rows_unused, mat_ref, mwin_ref, msem,
                    lights_ref, vis,
                    ox, oy, oz, dx, dy, dz, hit, t_hit, vx, vy, vz,
                    rax, rsg):
    """Tile-resident shading: [8,128] march state -> (r, g, b) [8,128] f32.

    Matches render/shade.shade (palette-mode, no atlas) to fp tolerance —
    parity-locked in tests/test_fused_shade.py. The material fetch is a
    windowed one-hot loop like the march fetch, but runs ~1-3 iterations
    per tile total (a tile's hit cells are a compact surface patch in
    Morton space), not once per step — so the material table can stay in
    HBM (mat_ref is an ANY-space ref; at 512^3 two 64 MB VMEM tables
    would blow the 128 MB budget) and each iteration DMAs its window into
    the mwin_ref scratch.
    """
    hitb = hit == 1
    zero = jnp.zeros(TILE, jnp.int32)
    Wm = mwin_ref.shape[0]
    # the material table's OWN row count, not the occupancy table's: in
    # rgb8 mode the table is fine-voxel Morton (8x the coarse rows)
    rows = mat_ref.shape[0]

    # ---- material word fetch (f32 one-hot: 24-bit words)
    if spec.rgb8:
        widx = _morton3(vx, vy, vz)
    else:
        widx = _morton3(vx >> 1, vy >> 1, vz >> 1)
    row = widx >> 7
    lane = widx & 127

    def mcond(s):
        got, _, it = s
        pend = jnp.where(hitb, 1 - got, 0)
        return (it < jnp.int32(TILE_RAYS)) & (jnp.max(pend) > 0)

    def mbody(s):
        got, mw, it = s
        pend = hitb & (got == 0)
        base = jnp.min(jnp.where(pend, row, rows - 1))
        base = jnp.maximum(jnp.minimum(base, rows - Wm), 0)
        rel = row - base
        inw = (rel >= 0) & (rel < Wm)
        cp = pltpu.make_async_copy(mat_ref.at[pl.ds(base, Wm), :],
                                   mwin_ref, msem)
        cp.start()
        cp.wait()
        wv = _lookup_window(mwin_ref[:], jnp.clip(rel, 0, Wm - 1), lane,
                            Wm, dtype=jnp.float32)
        take = pend & inw
        mw = jnp.where(take, wv.astype(jnp.int32), mw)
        return got | take.astype(jnp.int32), mw, it + 1

    _, mat_word, _ = jax.lax.while_loop(
        mcond, mbody, (zero, zero, jnp.int32(0)))

    if spec.rgb8:
        # ---- albedo: RGB8 word decode (world/packed.build_rgb8_morton)
        pr = (mat_word & 255).astype(jnp.float32) * (1.0 / 255.0)
        pg = ((mat_word >> 8) & 255).astype(jnp.float32) * (1.0 / 255.0)
        pb = ((mat_word >> 16) & 255).astype(jnp.float32) * (1.0 / 255.0)
    else:
        # ---- albedo: 3-bit child id -> palette select chain
        ci = ((vx & 1) << 2) | ((vy & 1) << 1) | (vz & 1)
        mid = zero
        for k in range(8):
            mid = jnp.where(ci == k, (mat_word >> (3 * k)) & 7, mid)
        pr = jnp.zeros(TILE, jnp.float32)
        pg = jnp.zeros(TILE, jnp.float32)
        pb = jnp.zeros(TILE, jnp.float32)
        for k, (cr, cg, cb_) in enumerate(spec.palette):
            selk = mid == k
            pr = jnp.where(selk, cr, pr)
            pg = jnp.where(selk, cg, pg)
            pb = jnp.where(selk, cb_, pb)

    # ---- face normal from the DDA step mask (shade.py semantics: zero
    # on miss)
    sgf = rsg.astype(jnp.float32)
    nx = jnp.where(hitb & (rax == 0), -sgf, 0.0)
    ny = jnp.where(hitb & (rax == 1), -sgf, 0.0)
    nz = jnp.where(hitb & (rax == 2), -sgf, 0.0)

    t_s = jnp.where(hitb, t_hit, 0.0)   # keep miss-lane math finite
    if spec.mode == "flat":
        w = 0.80 * jnp.abs(nx) + 0.68 * jnp.abs(ny) + 1.00 * jnp.abs(nz)
        w = jnp.where(nz < -0.5, 0.45, w)
        ar, ag, ab = pr * w, pg * w, pb * w
    else:
        px = ox + t_s * dx + nx * _SHADOW_EPS
        py = oy + t_s * dy + ny * _SHADOW_EPS
        pz = oz + t_s * dz + nz * _SHADOW_EPS
        ar = pr * spec.ambient
        ag = pg * spec.ambient
        ab = pb * spec.ambient
        for li in range(spec.n_lights):
            lpx = lights_ref[li, 0]
            lpy = lights_ref[li, 1]
            lpz = lights_ref[li, 2]
            lr = lights_ref[li, 3]
            lg = lights_ref[li, 4]
            lb = lights_ref[li, 5]
            lint = lights_ref[li, 6]
            lvx = lpx - px
            lvy = lpy - py
            lvz = lpz - pz
            dist2 = lvx * lvx + lvy * lvy + lvz * lvz
            rinv = jax.lax.rsqrt(jnp.maximum(dist2, 1e-12))
            ldx = lvx * rinv
            ldy = lvy * rinv
            ldz = lvz * rinv
            ndotl = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
            atten = lint / (1.0 + 0.002 * dist2)
            v = vis[li] if vis is not None else 1.0
            diff = ndotl * atten * v
            ar = ar + pr * diff * lr
            ag = ag + pg * diff * lg
            ab = ab + pb * diff * lb
            if spec.mode == "full":
                hx = ldx - dx
                hy = ldy - dy
                hz = ldz - dz
                hn = jax.lax.rsqrt(
                    jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-12))
                ndoth = jnp.maximum(
                    (nx * hx + ny * hy + nz * hz) * hn, 0.0)
                sp = (spec.specular_k * (ndoth ** spec.specular_exp)
                      * (ndotl > 0.0) * atten * v)
                ar = ar + sp * lr
                ag = ag + sp * lg
                ab = ab + sp * lb

    # ---- sky gradient (shade.sky_color) + fog (shade.apply_fog)
    u = jnp.clip(dz * 0.5 + 0.5, 0.0, 1.0)
    skr = spec.sky_horizon[0] * (1.0 - u) + spec.sky_top[0] * u
    skg = spec.sky_horizon[1] * (1.0 - u) + spec.sky_top[1] * u
    skb = spec.sky_horizon[2] * (1.0 - u) + spec.sky_top[2] * u
    if spec.fog:
        fog_f = jnp.where(hitb,
                          1.0 - jnp.exp(-spec.fog_density * t_s), 0.0)
        ar = ar * (1.0 - fog_f) + skr * fog_f
        ag = ag * (1.0 - fog_f) + skg * fog_f
        ab = ab * (1.0 - fog_f) + skb * fog_f
    out_r = jnp.clip(jnp.where(hitb, ar, skr), 0.0, 1.0)
    out_g = jnp.clip(jnp.where(hitb, ag, skg), 0.0, 1.0)
    out_b = jnp.clip(jnp.where(hitb, ab, skb), 0.0, 1.0)
    return out_r, out_g, out_b


def _march_kernel(*refs, dims, max_steps, window, sublane_windows=False,
                  split_window=False, split_matmul2=False,
                  local_advance=True, resume=False, iter_budget=None,
                  unroll=1, shade_spec=None, fetch_v4=True,
                  base_every=1):
    lookup = {True: _lookup_window_v4, False: _lookup_window,
              "v4b": _lookup_window_v4b}[fetch_v4]
    refs = list(refs)
    if resume:
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
         rvx_ref, rvy_ref, rvz_ref, rdist_ref, rsteps_ref, tbl_ref) = \
            refs[:13]
        refs = refs[13:]
    else:
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
         tbl_ref) = refs[:8]
        refs = refs[8:]
    if shade_spec is not None:
        mat_ref, lights_ref = refs[:2]
        refs = refs[2:]
    (hit_ref, t_ref, vx_ref, vy_ref, vz_ref, ax_ref, sg_ref,
     steps_ref, iters_ref, done_ref, dist_ref) = refs[:11]
    refs = refs[11:]
    if shade_spec is not None:
        r_ref, g_ref, b_ref, mwin_ref, msem_ref = refs
    else:
        assert not refs
    X, Y, Z = dims
    rows = tbl_ref.shape[0]
    W = window

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_max = tmax_ref[:]

    def run_march(ox, oy, oz, dx, dy, dz, t_max, use_resume=False,
                  active0=None):
        # the complete windowed DDA march for one (o, d, t_max) ray
        # set — a closure so the in-kernel shadow pass (the reference
        # kernel's second DDA loop inside the same dispatch, SURVEY.md
        # §4.3) reuses the march verbatim. active0 masks rays out of
        # the march entirely (shadow rays of miss pixels).
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
        valid = valid & (t_enter <= t_end)

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

        # entry face: axis whose near-slab t is largest (ties -> lowest axis)
        tn_max = jnp.maximum(jnp.maximum(nx, ny), nz)
        eax = jnp.where(nx >= tn_max, 0, jnp.where(ny >= tn_max, 1, 2))
        esg = jnp.where(eax == 0, sgx, jnp.where(eax == 1, sgy, sgz))

        vx0, vy0, vz0, _ = reinit(t_enter)
        zero = jnp.zeros(TILE, jnp.int32)
        dist0 = zero
        steps0 = zero
        fresh0 = valid.astype(jnp.int32)
        done0 = (~valid).astype(jnp.int32)
        if use_resume:
            # mid-flight restart (march_pallas_v2_sorted): the march is
            # memoryless given (o, d, current voxel, current cell dist) — the
            # DDA t invariants are pure functions of the voxel, so the resumed
            # step continues EXACTLY where the capped round left off. Sentinels
            # in the dist channel: -1 = dead slot, -2 = never-fetched (redo the
            # entry fetch at the given voxel; entry t/axis from the slab clip
            # stays correct because o, d are unchanged).
            rd = rdist_ref[:]
            dead = rd == -1
            freshr = rd == -2
            vx0 = jnp.clip(rvx_ref[:], 0, X - 1)
            vy0 = jnp.clip(rvy_ref[:], 0, Y - 1)
            vz0 = jnp.clip(rvz_ref[:], 0, Z - 1)
            dist0 = jnp.maximum(rd, 0)
            steps0 = rsteps_ref[:]   # total-step continuity across rounds
            done0 = ((~valid) | dead).astype(jnp.int32)
            fresh0 = (valid & freshr & (~dead)).astype(jnp.int32)
        # flags ride the while_loop carry as int32 (i1 vector carries trip a
        # Mosaic "unsupported target bitwidth" on this toolchain)
        # cbok: the cb carry holds the CURRENT cell's child bits (resume-round
        # rays start with an unknown cb -> 0 until their first fetch; fresh
        # rays are excluded from the local-advance path anyway)
        cbok0 = zero if use_resume else jnp.ones(TILE, jnp.int32)
        if active0 is not None:
            done0 = done0 | (~active0).astype(jnp.int32)
            fresh0 = fresh0 * active0.astype(jnp.int32)
        state = (
            vx0, vy0, vz0,                                   # current voxel
            zero, dist0,                                     # cb, dist
            zero,                                            # hit
            jnp.full(TILE, BIG_T, jnp.float32),              # t_hit
            zero, zero,                                      # hit axis / sign
            steps0,                                          # steps
            done0,                                           # done
            fresh0,                                          # fresh (entry fetch)
            cbok0,                                           # cb valid
            jnp.int32(0),                                    # iter
            jnp.int32(0), jnp.int32(0),                      # window bases
        )
        # stalls consume iterations without consuming step budget; every
        # iteration the min-row ray progresses, so this bound is unreachable in
        # practice (the all-done early exit fires first) but guarantees
        # termination even under full serialization. iter_budget deliberately
        # undercuts it: the sorted multi-round driver resumes survivors.
        iter_cap = jnp.int32(max_steps * 8 + TILE_RAYS)
        if iter_budget is not None:
            iter_cap = jnp.int32(min(iter_budget, max_steps * 8 + TILE_RAYS))

        def cond(s):
            done, it = s[10], s[13]
            return (it < iter_cap) & (jnp.min(done) == 0)

        def body(s):
            (vx, vy, vz, cb, dist, hit, t_hit, rax, rsg, steps, done, fresh,
             cbok, it, cb1, cb2) = s
            active = done == 0
            freshb = fresh == 1

            # --- non-fresh target: empty-box jump (D>=1) or fine DDA step
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
            mz = ~mx & ~my
            ax = jnp.where(mx, 0, jnp.where(my, 1, 2))
            sg = jnp.where(mx, sgx, jnp.where(my, sgy, sgz))

            nvx, nvy, nvz, inside = reinit(t_new)
            # progress guard: fp rounding re-landed in the same voxel -> force a
            # single DDA step along the crossing axis
            stuck = (nvx == vx) & (nvy == vy) & (nvz == vz)
            nvx = jnp.where(stuck & mx, jnp.clip(vx + sgx, 0, X - 1), nvx)
            nvy = jnp.where(stuck & my, jnp.clip(vy + sgy, 0, Y - 1), nvy)
            nvz = jnp.where(stuck & mz, jnp.clip(vz + sgz, 0, Z - 1), nvz)
            fx_ = vx + sgx
            fy_ = vy + sgy
            fz_ = vz + sgz
            # boolean algebra, not where-selects: Mosaic rejects vselects whose
            # VALUE operands are i1 vectors
            f_in = (
                (mx & (fx_ >= 0) & (fx_ < X))
                | (my & (fy_ >= 0) & (fy_ < Y))
                | (mz & (fz_ >= 0) & (fz_ < Z))
            )
            inside = (stuck & f_in) | (~stuck & inside)

            # --- fresh override: target is the entry voxel itself
            nvx = jnp.where(freshb, vx, nvx)
            nvy = jnp.where(freshb, vy, nvy)
            nvz = jnp.where(freshb, vz, nvz)
            t_new = jnp.where(freshb, t_enter, t_new)
            ax = jnp.where(freshb, eax, ax)
            sg = jnp.where(freshb, esg, sg)
            inside = freshb | inside

            past_end = t_new > t_end
            terminate = active & ((~inside) | past_end)      # no fetch needed
            need = active & inside & (~past_end)

            # --- local same-cell advance: the target voxel lies in the SAME
            # 2x2x2 coarse cell whose child bits the cb carry already holds
            # (dist==0 <-> the last fetched word was an occupied cell). These
            # rays resolve their step from registers — no fetch, and no
            # window-coverage requirement, so they advance EVERY iteration,
            # relieving Morton-window stall pressure for free (VERDICT r3
            # next-#2). Exactly the word a fetch would return, so semantics
            # are unchanged (parity-locked incl. tiny windows + resume).
            if local_advance:
                same_cell = (((nvx >> 1) == (vx >> 1))
                             & ((nvy >> 1) == (vy >> 1))
                             & ((nvz >> 1) == (vz >> 1)))
                adv_local = (need & (~freshb) & (cbok == 1) & (dist == 0)
                             & same_cell)
                solid_local = _childbit(cb, nvx, nvy, nvz) == 1
                need_f = need & (~adv_local)
            else:
                adv_local = jnp.zeros_like(need)
                solid_local = adv_local
                need_f = need

            # --- Morton-windowed fetch
            widx = _morton3(nvx >> 1, nvy >> 1, nvz >> 1)
            row = widx >> 7
            lane = widx & 127
            if sublane_windows:
                # 8 independent windows, one per 128-ray sub-row: each sub-
                # cluster is spatially tighter than the whole tile, so W can be
                # ~8x smaller — the one-hot build and matmul shrink with it.
                row_m = jnp.where(need_f, row, rows - 1)
                rmt = jnp.transpose(row_m)                # [128, 8]
                rt = jnp.transpose(row)                   # [128, 8]
                lt = jnp.transpose(lane)                  # [128, 8]
                iota_w = jax.lax.broadcasted_iota(jnp.int32, (128, W), 1)
                iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
                cols, inw_cols = [], []
                for c in range(8):
                    base_c = jnp.min(rmt[:, c:c + 1])
                    base_c = jnp.maximum(jnp.minimum(base_c, rows - W), 0)
                    rel_c = rt[:, c:c + 1] - base_c       # [128, 1]
                    inw_cols.append(((rel_c >= 0) & (rel_c < W))
                                    .astype(jnp.int32))
                    win_c = tbl_ref[pl.ds(base_c, W), :]
                    rowoh = (iota_w == jnp.clip(rel_c, 0, W - 1)).astype(
                        jnp.bfloat16)
                    g = jnp.dot(rowoh, win_c.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                    laneoh = (iota_l == lt[:, c:c + 1]).astype(jnp.float32)
                    cols.append(jnp.sum(g * laneoh, axis=1, keepdims=True))
                wv = jnp.transpose(jnp.concatenate(cols, axis=1))
                in_win = jnp.transpose(jnp.concatenate(inw_cols, axis=1)) == 1
                fetch = need_f & in_win                  # progress this iter
            elif split_window:
                # TWO W/2 segments: seg1 at the min needy row (progress
                # guarantee), seg2 at the min row seg1 does NOT cover. Morton
                # codes jump by half the range when a ray crosses a top-level
                # octant mid-plane, so deep tiles are often BIMODAL in row
                # space — two half-windows cover both modes where one
                # contiguous window of the same total size cannot.
                Wh = W // 2

                def _fresh_bases(row=row, need_f=need_f):
                    b1 = jnp.min(jnp.where(need_f, row, rows - 1))
                    b1 = jnp.maximum(jnp.minimum(b1, rows - Wh), 0)
                    r1_ = row - b1
                    c1_ = (r1_ >= 0) & (r1_ < Wh)
                    b2 = jnp.min(jnp.where(need_f & ~c1_, row, rows - 1))
                    b2 = jnp.maximum(jnp.minimum(b2, rows - Wh), 0)
                    return b1, b2

                if base_every > 1:
                    # STALE BASES: recompute the two scalar window bases
                    # only every base_every-th iteration (the two
                    # vector->scalar min syncs are a measurable slice of
                    # the iteration); between recomputes, out-of-window
                    # rays just stall one extra round — correctness is
                    # unchanged (in_win masks every fetch) and
                    # termination is still guaranteed by the recompute.
                    base1, base2 = jax.lax.cond(
                        it % base_every == 0, _fresh_bases,
                        lambda: (cb1, cb2))
                else:
                    base1, base2 = _fresh_bases()
                r1 = row - base1
                cov1 = (r1 >= 0) & (r1 < Wh)
                r2 = row - base2
                cov2 = (r2 >= 0) & (r2 < Wh)
                in_win = cov1 | cov2
                fetch = need_f & in_win                  # progress this iter
                if split_matmul2:
                    # no [W,128] concat copy per iteration: one-hot each half
                    # against its own segment and SUM the two MXU products
                    # (rows covered by neither segment have all-zero one-hots)
                    rel = jnp.where(cov1, r1, r2)
                    wv = _lookup_window_split(
                        tbl_ref[pl.ds(base1, Wh), :],
                        tbl_ref[pl.ds(base2, Wh), :],
                        jnp.clip(rel, 0, Wh - 1), cov1, lane, Wh)
                else:
                    win = jnp.concatenate([tbl_ref[pl.ds(base1, Wh), :],
                                           tbl_ref[pl.ds(base2, Wh), :]],
                                          axis=0)
                    row_rel = jnp.where(cov1, r1, Wh + r2)
                    wv = lookup(win, jnp.clip(row_rel, 0, W - 1), lane, W)
            else:
                base = jnp.min(jnp.where(need_f, row, rows - 1))
                base = jnp.minimum(base, rows - W)
                base = jnp.maximum(base, 0)
                row_rel = row - base
                in_win = (row_rel >= 0) & (row_rel < W)
                fetch = need_f & in_win                  # progress this iter
                win = tbl_ref[pl.ds(base, W), :]
                wv = lookup(win, jnp.clip(row_rel, 0, W - 1), lane, W)
            # signed bf16 encoding (world/packed.py): >0 -> child bits of an
            # occupied cell; <0 -> -D empty-space jump radius
            ncb = jnp.maximum(wv, 0.0).astype(jnp.int32)
            ndist = jnp.maximum(-wv, 0.0).astype(jnp.int32)
            solid = _childbit(ncb, nvx, nvy, nvz) == 1

            new_hit = (fetch & solid) | (adv_local & solid_local)
            newly_done = new_hit | terminate
            adv = fetch | adv_local
            upd = adv | terminate

            if split_window and not sublane_windows:
                nb1, nb2 = base1, base2
            else:
                nb1, nb2 = cb1, cb2
            sel = lambda c, a, b: jnp.where(c, a, b)
            return (
                sel(adv, nvx, vx), sel(adv, nvy, vy), sel(adv, nvz, vz),
                sel(fetch, ncb, cb), sel(fetch, ndist, dist),
                hit | new_hit.astype(jnp.int32),
                sel(new_hit, t_new, t_hit),
                sel(new_hit, ax, rax),
                sel(new_hit, sg, rsg),
                steps + (adv & ~freshb).astype(jnp.int32),
                done | newly_done.astype(jnp.int32),
                fresh & (~upd).astype(jnp.int32),
                cbok | fetch.astype(jnp.int32),
                it + 1,
                nb1, nb2,
            )

        if unroll > 1:
            # fewer loop boundaries: the measured per-iteration cost is largely
            # W-independent fixed overhead (tools/probe_pallas2_fixed_out.json)
            # — unrolling amortizes the cond sync / scalar pipeline flush over
            # several march steps. Pure repetition of the same masked body, so
            # semantics are unchanged (done rays are inert).
            inner = body

            def body(s):  # noqa: F811
                for _ in range(unroll):
                    s = inner(s)
                return s

        return jax.lax.while_loop(cond, body, state)
    s = run_march(ox, oy, oz, dx, dy, dz, t_max, use_resume=resume)
    (vx, vy, vz, _, dist_f, hit, t_hit, rax, rsg, steps, done_f, fresh_f,
     _, it, _, _) = s

    hit_ref[:] = hit
    t_ref[:] = t_hit
    vx_ref[:] = vx
    vy_ref[:] = vy
    vz_ref[:] = vz
    ax_ref[:] = rax
    sg_ref[:] = rsg
    steps_ref[:] = steps
    done_ref[:] = done_f
    # resume channel for the next round: -2 = still awaiting entry fetch
    dist_ref[:] = jnp.where(fresh_f == 1, -2, dist_f)
    iters_total = it

    if shade_spec is not None:
        vis = None
        if (shade_spec.shadows and shade_spec.n_lights > 0
                and shade_spec.mode != "flat"):
            # in-kernel shadow pass — the reference's second DDA loop in
            # the SAME dispatch (SURVEY.md §4.3): hit points nudged off
            # the surface along the face normal, one capped march per
            # light, identical semantics to render/fused.py's 3-dispatch
            # composition (parity-locked in tests/test_fused_shade.py).
            hitb = hit == 1
            sgf = rsg.astype(jnp.float32)
            nxv = jnp.where(hitb & (rax == 0), -sgf, 0.0)
            nyv = jnp.where(hitb & (rax == 1), -sgf, 0.0)
            nzv = jnp.where(hitb & (rax == 2), -sgf, 0.0)
            t_s = jnp.where(hitb, t_hit, 0.0)
            px = ox + t_s * dx + nxv * _SHADOW_EPS
            py = oy + t_s * dy + nyv * _SHADOW_EPS
            pz = oz + t_s * dz + nzv * _SHADOW_EPS
            px = jnp.where(hitb, px, 0.0)
            py = jnp.where(hitb, py, 0.0)
            pz = jnp.where(hitb, pz, 0.0)
            vis = []
            for li in range(shade_spec.n_lights):
                lvx = lights_ref[li, 0] - px
                lvy = lights_ref[li, 1] - py
                lvz = lights_ref[li, 2] - pz
                ldist = jnp.sqrt(lvx * lvx + lvy * lvy + lvz * lvz)
                dn = jnp.maximum(ldist, 1e-12)
                ldx = lvx / dn
                ldy = lvy / dn
                ldz = lvz / dn
                tm = jnp.where(hitb, ldist - 2.0 * _SHADOW_EPS, 0.0)
                # backfacing gate: when n.l <= 0 BOTH the diffuse term
                # (ndotl clamped to 0) and the specular term (explicit
                # ndotl>0 factor) are zero, so vis is never read — skip
                # the march for those rays entirely (bitwise-identical
                # output, parity-locked in tests/test_fused_shade.py)
                ndl = nxv * ldx + nyv * ldy + nzv * ldz
                s2 = run_march(px, py, pz, ldx, ldy, ldz, tm,
                               active0=hitb & (ndl > 0.0))
                shit = s2[5]
                vis.append(jnp.where((shit == 1) & hitb, 0.0, 1.0))
                iters_total = iters_total + s2[13]

        r, g, b = _shade_epilogue(
            shade_spec, tbl_ref.shape[0], mat_ref, mwin_ref, msem_ref,
            lights_ref, vis,
            ox, oy, oz, dx, dy, dz, hit, t_hit, vx, vy, vz, rax, rsg)
        r_ref[:] = r
        g_ref[:] = g
        b_ref[:] = b
    # per-tile loop-iteration count (stall accounting for the roofline
    # model), including any in-kernel shadow marches
    iters_ref[:] = jnp.full(TILE, 1, jnp.int32) * iters_total


def _tile_layout(n, image_shape, block_shape):
    """(pack, unpack, raw_shape, grid) for the [8,128] kernel tiling.

    Three layouts (all parity-locked as layout-only knobs):
      * image_shape + block_shape: bh x bw image blocks permuted so each
        kernel tile is a square-ish spatially-coherent patch (the flagship
        configuration — narrow Morton windows);
      * image_shape only: 8 x 128 image strips;
      * neither: scanline runs with flat padding.
    """
    if (block_shape is not None and image_shape is not None
            and image_shape[0] * image_shape[1] == n):
        bh, bw = block_shape
        assert bh * bw == TILE_RAYS, (bh, bw)
        H, W_img = image_shape
        pad_h = (-H) % bh
        pad_w = (-W_img) % bw
        Hp, Wp = H + pad_h, W_img + pad_w
        gh, gw = Hp // bh, Wp // bw
        nt = gh * gw

        def pack(x, fill):
            img = jnp.pad(x.reshape(H, W_img), ((0, pad_h), (0, pad_w)),
                          constant_values=fill)
            blk = img.reshape(gh, bh, gw, bw).transpose(0, 2, 1, 3)
            return blk.reshape(nt * TILE[0], TILE[1])

        def unpack(x):
            img = x.reshape(gh, gw, bh, bw).transpose(0, 2, 1, 3)
            return img.reshape(Hp, Wp)[:H, :W_img].reshape(-1)

        return pack, unpack, (nt * TILE[0], TILE[1]), (nt, 1)
    if image_shape is not None and image_shape[0] * image_shape[1] == n:
        H, W_img = image_shape
        pad_h = (-H) % TILE[0]
        pad_w = (-W_img) % TILE[1]
        Hp, Wp = H + pad_h, W_img + pad_w

        def pack(x, fill):
            img = x.reshape(H, W_img)
            return jnp.pad(img, ((0, pad_h), (0, pad_w)),
                           constant_values=fill)

        unpack = lambda x: x[:H, :W_img].reshape(-1)
        return pack, unpack, (Hp, Wp), (Hp // TILE[0], Wp // TILE[1])
    pad = (-n) % TILE_RAYS
    nt = (n + pad) // TILE_RAYS

    def pack(x, fill):
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(nt * TILE[0], TILE[1])

    unpack = lambda x: x.reshape(-1)[:n]
    return pack, unpack, (nt * TILE[0], TILE[1]), (nt, 1)


def march_pallas_v2(o: jax.Array, d: jax.Array, accel: PackedMorton,
                    dims: tuple[int, int, int], max_steps: int,
                    t_max: jax.Array | None = None,
                    image_shape: tuple[int, int] | None = None,
                    window: int = 512,
                    block_shape: tuple[int, int] | None = (32, 32),
                    sublane_windows: bool = False,
                    split_window: bool = True,
                    stats: bool = False,
                    iter_budget: int | None = None,
                    resume_state: tuple | None = None,
                    extended: bool = False,
                    unroll: int = 2,
                    split_matmul2: bool = False,
                    local_advance: bool = True,
                    fetch_v4: bool = True,
                    base_every: int = 1,
                    shade_spec: ShadeSpec | None = None,
                    mats: jax.Array | None = None,
                    lights_arr: jax.Array | None = None,
                    interpret: bool = False) -> HitRecord:
    """March rays o,d [N,3] through the Morton packed-accel world.

    image_shape=(H, W) with N == H*W tiles rays as [8,128] image PATCHES
    (spatially-coherent clusters -> narrow Morton windows); None falls back
    to scanline-order tiles (correct, more stalls). block_shape=(bh,bw)
    with bh*bw == 1024 (e.g. (32,32)) additionally PERMUTES pixels so each
    kernel tile is a square-ish image block instead of an 8x128 strip — a
    32x32 block's 3D ray cluster spans ~4x less Morton range than a 128-px
    strip, cutting window stalls; the permutation is pure host-side XLA
    (reshape/transpose), the kernel body is identical.

    Multi-round support (march_pallas_v2_sorted): iter_budget caps the
    per-tile loop (with unroll>1 the cap is only checked between unrolled
    bodies, so a tile may run up to unroll-1 extra iterations — harmless
    for correctness; it slightly inflates the iters_tile stall counters if
    both knobs are combined); extended=True additionally returns
    {done [N] bool, dist [N] int32 (-2 = entry fetch still pending)};
    resume_state=(voxel [N,3] int32, dist [N] int32 with -1 dead / -2
    fresh sentinels[, steps [N] int32 prior-round step counts]) restarts
    rays mid-flight — the march is memoryless given (o, d, voxel, dist),
    so continuation is exact (parity-tested), and rec.steps continues from
    the provided prior counts.

    FUSED SHADING: shade_spec (a ShadeSpec) + mats (the f32 Morton
    material table, world/packed.build_material_morton) + lights_arr
    (pack_lights) run the full shade — palette albedo, face-normal
    lighting, fog, sky — as an in-kernel epilogue on the still-VMEM-
    resident tile; the return becomes (HitRecord, rgb [N,3]). Matches
    render/shade.shade to fp tolerance (tests/test_fused_shade.py).

    split_window=True (the benched default — tools/probe_pallas2_split_out
    measured it 1.6x faster than one contiguous window at the flagship)
    fetches TWO W/2 row segments instead of one W row; it silently degrades
    to the contiguous path when the effective window is odd or smaller than
    2 rows (identical semantics either way — every window variant is a
    performance knob only, parity-locked in tests/test_pallas_v2.py).
    sublane_windows takes precedence over split_window when both are set.

    Hit-equivalent to kernel_pallas / kernel_xla.march_xla_df / kernel_ref
    (parity-tested). NOTE: a resumed ray's step counter restarts at its
    resume_state steps value (0 when not provided), so rec.steps is the
    TOTAL across rounds; max_steps only sizes the iteration cap (per-ray
    termination is geometric: grid exit, t_max, or hit).
    """
    n = o.shape[0]
    rows = accel.rows
    window = min(window, rows)
    if split_window and (window % 2 == 1 or window < 2):
        split_window = False
    if t_max is None:
        t_max = jnp.full((n,), BIG_T, dtype=jnp.float32)
    resume = resume_state is not None

    pack, unpack, raw_shape, grid = _tile_layout(n, image_shape,
                                                 block_shape)

    # padding rays point away from the grid -> immediate miss; padded
    # resume slots carry the dead sentinel
    chans = [pack(o[:, 0], -10.0), pack(o[:, 1], -10.0),
             pack(o[:, 2], -10.0),
             pack(d[:, 0], 0.0), pack(d[:, 1], 0.0), pack(d[:, 2], -1.0),
             pack(t_max, 0.0)]
    if resume:
        if len(resume_state) == 3:
            rv, rdist, rsteps = resume_state
        else:
            rv, rdist = resume_state
            rsteps = jnp.zeros((n,), jnp.int32)
        chans += [pack(rv[:, 0], 0), pack(rv[:, 1], 0), pack(rv[:, 2], 0),
                  pack(rdist, -1), pack(rsteps, 0)]

    ray_spec = pl.BlockSpec(TILE, lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    out_dtypes = [jnp.int32, jnp.float32, jnp.int32, jnp.int32, jnp.int32,
                  jnp.int32, jnp.int32, jnp.int32, jnp.int32, jnp.int32,
                  jnp.int32]
    fused = shade_spec is not None
    if fused:
        assert mats is not None and lights_arr is not None
        out_dtypes += [jnp.float32] * 3
    out_shape = [jax.ShapeDtypeStruct(raw_shape, t) for t in out_dtypes]
    tbl_spec = pl.BlockSpec((rows, 128), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_march_kernel, dims=dims, max_steps=max_steps,
                             window=window, sublane_windows=sublane_windows,
                             split_window=split_window,
                             split_matmul2=split_matmul2,
                             local_advance=local_advance,
                             resume=resume, iter_budget=iter_budget,
                             unroll=unroll, shade_spec=shade_spec,
                             fetch_v4=fetch_v4, base_every=base_every)
    table_bytes = rows * 128 * accel.words.dtype.itemsize
    in_specs = [ray_spec] * len(chans) + [tbl_spec]
    inputs = list(chans) + [accel.words]
    scratch_shapes = []
    if fused:
        # material table stays in HBM (ANY); the epilogue DMAs its window
        # into a scratch buffer 1-3x per tile (two VMEM-resident 64 MB
        # tables would exceed the 128 MB budget at 512^3)
        Wm = min(shade_spec.mat_window, rows)
        table_bytes += Wm * 128 * 4
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec((8, 8), lambda i, j: (0, 0),
                                  memory_space=pltpu.SMEM)]
        inputs += [mats, lights_arr]
        scratch_shapes = [pltpu.VMEM((Wm, 128), jnp.float32),
                          pltpu.SemaphoreType.DMA(())]
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[ray_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(table_bytes + 16 * 1024 * 1024,
                                 127 * 1024 * 1024)),
        interpret=interpret,
    )(*inputs)

    hit, t, vx, vy, vz, ax, sg, steps = [unpack(x) for x in outs[:8]]
    voxel = jnp.stack([vx, vy, vz], axis=-1)
    normal = -sg[:, None].astype(jnp.float32) * jax.nn.one_hot(
        ax, 3, dtype=jnp.float32)
    normal = jnp.where(hit[:, None] > 0, normal, 0.0)
    rec = HitRecord(hit=hit > 0, t=t, voxel=voxel, normal=normal,
                    steps=steps)
    ret = [rec]
    if fused:
        ret.append(jnp.stack([unpack(x) for x in outs[11:14]], axis=-1))
    if extended:
        ret.append(dict(done=unpack(outs[9]) > 0, dist=unpack(outs[10])))
    if stats:
        # per-tile while-loop iteration counts (one scalar per kernel
        # tile, broadcast over the tile by the kernel); steps_tile_max is
        # the per-tile max march-step count from the SAME raw tiling — the
        # no-stall ideal iteration count (+1 entry fetch) for roofline
        # stall accounting.
        def per_tile(raw, red):
            if raw.shape[1] == TILE[1]:
                t3 = raw.reshape(-1, TILE[0], TILE[1])
                return red(t3, (1, 2))
            t4 = raw.reshape(raw.shape[0] // TILE[0], TILE[0],
                             raw.shape[1] // TILE[1], TILE[1])
            return red(t4, (1, 3)).reshape(-1)

        ret.append(dict(
            iters_tile=per_tile(outs[8], lambda a, x: jnp.max(a, axis=x)),
            steps_tile_max=per_tile(outs[7],
                                    lambda a, x: jnp.max(a, axis=x))))
    return ret[0] if len(ret) == 1 else tuple(ret)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def march_pallas_v2_sorted(o: jax.Array, d: jax.Array, accel: PackedMorton,
                           dims: tuple[int, int, int], max_steps: int,
                           t_max: jax.Array | None = None,
                           image_shape: tuple[int, int] | None = None,
                           window: int = 512,
                           block_shape: tuple[int, int] | None = (32, 32),
                           round0_iters: int = 24,
                           survivor_frac: int = 8,
                           resume_window: int = 256,
                           interpret: bool = False) -> HitRecord:
    """Multi-round v2 march with MID-FLIGHT RAY RESORT — the TPU answer to
    deep-ray divergence (the stall tail: tools/probe_pallas2_stats_out.json
    measured 2.8x iteration overhead from tiles whose rays spread across
    Morton space at depth).

    Round 0 marches image blocks with a per-tile iteration budget — the
    cheap, coherent majority (sky + first hits) finishes there. Survivors
    are compacted and SORTED BY CURRENT MORTON CELL (one argsort), so the
    resume round's tiles are clusters in WORLD space, not image space —
    tight windows, few stalls. A host-side drain loop guarantees
    completion if survivors ever exceed the buffer. Exact-equivalent to
    the single-round kernel (parity-tested: the march is memoryless given
    (o, d, voxel, dist))."""
    n = o.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), BIG_T, dtype=jnp.float32)
    rec, ext = march_pallas_v2(
        o, d, accel, dims, max_steps, t_max=t_max, image_shape=image_shape,
        window=window, block_shape=block_shape, iter_budget=round0_iters,
        extended=True, interpret=interpret)
    B = min(_round_up(max(n // survivor_frac, TILE_RAYS), TILE_RAYS), n)

    def resume_round(carry):
        rec, ext = carry
        alive = ~ext["done"]
        v = rec.voxel
        mkey = _morton3(v[:, 0] >> 1, v[:, 1] >> 1, v[:, 2] >> 1)
        key = jnp.where(alive, mkey, jnp.int32(1 << 30))
        ids = jnp.argsort(key)[:B]
        sel_alive = jnp.take(alive, ids)
        o2 = jnp.take(o, ids, axis=0)
        d2 = jnp.take(d, ids, axis=0)
        tm2 = jnp.take(t_max, ids)
        v2 = jnp.take(v, ids, axis=0)
        dist2 = jnp.where(sel_alive, jnp.take(ext["dist"], ids), -1)
        steps2 = jnp.where(sel_alive, jnp.take(rec.steps, ids), 0)
        rec1, ext1 = march_pallas_v2(
            o2, d2, accel, dims, max_steps, t_max=tm2, window=resume_window,
            resume_state=(v2, dist2, steps2), extended=True,
            interpret=interpret)
        upd = sel_alive
        tgt = jnp.where(upd, ids, n)

        def scat(dst, src):
            return dst.at[tgt].set(src, mode="drop")

        rec = HitRecord(
            hit=scat(rec.hit, rec1.hit),
            t=scat(rec.t, rec1.t),
            voxel=scat(rec.voxel, rec1.voxel),
            normal=scat(rec.normal, rec1.normal),
            steps=scat(rec.steps, rec1.steps),
        )
        ext = dict(done=scat(ext["done"], ext1["done"]),
                   dist=scat(ext["dist"], ext1["dist"]))
        return rec, ext

    # one unconditional resume round (the common case: all survivors fit
    # the sorted buffer), then a while_loop drain for adversarial scenes —
    # the body compiles ONCE and reruns only while stragglers remain, so
    # this stays jit-compatible with no host sync and no graph unrolling.
    rec, ext = resume_round((rec, ext))
    rec, ext = jax.lax.while_loop(
        lambda c: jnp.any(~c[1]["done"]), resume_round, (rec, ext))
    return rec


def make_march_pallas_v2(occ_flat, dims, settings, accel=None,
                         image_shape=None, window: int | None = None,
                         block_shape=None, sublane_windows: bool | None = None,
                         split_window: bool | None = None,
                         unroll: int | None = None,
                         interpret: bool = False):
    """Pipeline march-factory (same shape as make_march_xla). ``accel`` must
    be a PackedMorton (built from the grid if omitted). Tuning knobs left
    as None come from ``settings.tuning`` (MarchTuning — the benched
    configuration), so the plain factory call reproduces the headline."""
    if not isinstance(accel, PackedMorton):
        occ = occ_flat.reshape(dims)
        accel = build_packed_morton(occ)
    max_steps = settings.resolve_max_steps(dims)
    tn = settings.tuning
    if window is None:
        window = tn.window
    if unroll is None:
        unroll = tn.unroll
    if sublane_windows is None:
        sublane_windows = tn.sublane_windows
    if split_window is None:
        split_window = tn.split_window
    if block_shape is None and image_shape is not None:
        block_shape = tn.block
    return functools.partial(march_pallas_v2, accel=accel, dims=dims,
                             max_steps=max_steps, image_shape=image_shape,
                             window=window, block_shape=block_shape,
                             sublane_windows=sublane_windows,
                             split_window=split_window,
                             split_matmul2=tn.split_matmul2,
                             local_advance=tn.local_advance,
                             fetch_v4=tn.fetch_v4,
                             base_every=tn.base_every, unroll=unroll,
                             interpret=interpret)


def _shade_only_kernel(*refs, spec: ShadeSpec):
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_ref, hit_ref,
     vx_ref, vy_ref, vz_ref, ax_ref, sg_ref) = refs[:13]
    refs = refs[13:]
    nvis = spec.n_lights if spec.use_vis else 0
    vis = [refs[i][:] for i in range(nvis)] or None
    mat_ref, lights_ref, r_ref, g_ref, b_ref, mwin_ref, msem_ref = \
        refs[nvis:]
    r, g, b = _shade_epilogue(
        spec, mat_ref.shape[0], mat_ref, mwin_ref, msem_ref, lights_ref,
        vis,
        ox_ref[:], oy_ref[:], oz_ref[:], dx_ref[:], dy_ref[:], dz_ref[:],
        hit_ref[:], t_ref[:], vx_ref[:], vy_ref[:], vz_ref[:],
        ax_ref[:], sg_ref[:])
    r_ref[:] = r
    g_ref[:] = g
    b_ref[:] = b


def shade_pallas_v2(rec: HitRecord, o, d, vis, mats, lights_arr,
                    spec: ShadeSpec,
                    image_shape=None, block_shape=(32, 32),
                    interpret: bool = False) -> jax.Array:
    """Standalone fused-shade pass: HitRecord [N] (+ per-light shadow
    visibility [N, L]) -> rgb [N, 3].

    Used by the shadowed pipeline (render/fused.render_frame_fused), where
    shading must wait for the shadow marches and therefore cannot ride the
    primary march's epilogue. Identical math to the in-march epilogue.
    """
    n = o.shape[0]
    pack, unpack, raw_shape, grid = _tile_layout(n, image_shape,
                                                 block_shape)
    # reconstruct the DDA step axis/sign from the face normal (exactly one
    # nonzero component, = -sign of the step; zero on miss)
    nrm = rec.normal
    ax = jnp.argmax(jnp.abs(nrm), axis=-1).astype(jnp.int32)
    sg = -jnp.sum(nrm, axis=-1).astype(jnp.int32)
    chans = [pack(o[:, 0], 0.0), pack(o[:, 1], 0.0), pack(o[:, 2], 0.0),
             pack(d[:, 0], 0.0), pack(d[:, 1], 0.0), pack(d[:, 2], -1.0),
             pack(rec.t, 0.0), pack(rec.hit.astype(jnp.int32), 0),
             pack(rec.voxel[:, 0], 0), pack(rec.voxel[:, 1], 0),
             pack(rec.voxel[:, 2], 0), pack(ax, 0), pack(sg, 0)]
    if spec.use_vis:
        assert vis is not None and vis.shape[1] == spec.n_lights
        chans += [pack(vis[:, li], 1.0) for li in range(spec.n_lights)]
    rows = mats.shape[0]
    Wm = min(spec.mat_window, rows)
    ray_spec = pl.BlockSpec(TILE, lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    in_specs = ([ray_spec] * len(chans)
                + [pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((8, 8), lambda i, j: (0, 0),
                                memory_space=pltpu.SMEM)])
    outs = pl.pallas_call(
        functools.partial(_shade_only_kernel, spec=spec),
        grid=grid,
        in_specs=in_specs,
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct(raw_shape, jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((Wm, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(Wm * 128 * 4 + 16 * 1024 * 1024,
                                 127 * 1024 * 1024)),
        interpret=interpret,
    )(*chans, mats, lights_arr)
    return jnp.stack([unpack(x) for x in outs], axis=-1)
