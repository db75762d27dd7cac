"""Pallas TPU trilinear field-sampling kernels — the contract's custom-VJP
backward kernel (SURVEY.md §2 L0 "Pallas TPU kernel (forward march) +
custom VJP backward kernel", §4.5; VERDICT r4 next-#2).

The differentiable soft renderer's cost on this endpoint is the per-index
gather floor (~60 ns/sample/channel XLA, tools/probe_r4_trilerp_out.json);
the r4 experimental kernel (kernel_trilerp, now retired to these kernels)
was device-EXACT but 0.58x XLA because it paid the one-hot fetch machinery
once per corner. These kernels restructure the work:

  * SAMPLES ARE WALKED IN-KERNEL: each [8,128] ray tile loops s = 0..S-1
    computing p_s = o + (t0 + dt(s+.5))d itself, so successive samples
    drift smoothly through the fine-voxel Morton table and the dynamic
    row window (pl.ds) almost never moves — the window DMA + scalar min
    sync amortize over S samples instead of being paid per call.
  * f32-EXACT bf16 MATMUL FETCH: the one-hot operand is exactly
    representable in bf16, so only the table side needs splitting —
    win = hi + mid + lo (three bf16 planes, 8 mantissa bits each = the
    full f32 significand) and THREE bf16 MXU passes reconstruct the f32
    gather to ~2^-24 relative error, vs Precision.HIGHEST's six passes
    (r4 matfetch trap: DEFAULT precision bf16-casts f32 operands).
  * ALL FOUR FIELD CHANNELS (sigma + rgb) ride one window: the scratch
    window is [W, 512] with each channel DMA'd into its own lane block,
    so one one-hot build serves four fetches.
  * The BACKWARD kernel re-walks the same samples (recompute over store,
    as render/vjp.py's scan does), scatter-adds voxel gradients into a
    VMEM-resident grad window flushed into the ALIASED Morton grad tables
    (input_output_aliases; race-free because TPU grid iterations are
    sequential — SURVEY.md §6 "race detection"), and chains sample-
    position cotangents to per-ray (o, d, t0, dt) accumulators held in
    registers.

Tables are FINE-VOXEL Morton [X*Y*Z/128, 128] f32 (build_field_morton):
row-major locality is anisotropic (x-neighbors X*Y apart), Morton
locality is isotropic, which is what lets one compact row window cover
all 8 trilinear corners of a coherent sample front (a 32x32-pixel ray
tile's sample front spans only ~7-30 voxels at typical depths).

Semantics match render/soft.trilinear / trilinear_grad (voxel-center
convention, edge-clamped corners, gradients through the interpolation
weights only — corner indices are non-differentiable, exactly like
jnp.take's index argument). Parity + grads are locked in
tests/test_sample_kernel.py; the XLA path stays as the semantics oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vxtpu.render.kernel_pallas_v2 import TILE, _tile_layout
from vxtpu.world.packed import morton3, part1by2

LANES = 128
NCH = 4  # sigma + rgb — one window serves all four


def build_field_morton(field: jax.Array) -> jax.Array:
    """[X,Y,Z] f32 -> fine-voxel-Morton [X*Y*Z/128, 128] f32 table (cubic
    power-of-two dims only — morton3 is then a bijection)."""
    X, Y, Z = field.shape
    assert X == Y == Z and (X & (X - 1)) == 0, "cubic power-of-two only"
    ii, jj, kk = jnp.meshgrid(jnp.arange(X), jnp.arange(Y), jnp.arange(Z),
                              indexing="ij")
    mi = morton3(ii, jj, kk).reshape(-1)
    flat = jnp.zeros((X * Y * Z,), jnp.float32).at[mi].set(
        field.reshape(-1).astype(jnp.float32))
    return flat.reshape(-1, LANES)


def field_from_morton(table: jax.Array, dim: int) -> jax.Array:
    """Inverse of build_field_morton: [rows,128] -> [dim,dim,dim] f32."""
    ii, jj, kk = jnp.meshgrid(jnp.arange(dim), jnp.arange(dim),
                              jnp.arange(dim), indexing="ij")
    mi = morton3(ii, jj, kk)
    return jnp.take(table.reshape(-1), mi.reshape(-1), axis=0).reshape(
        dim, dim, dim)


def _split3(w):
    """f32 -> three bf16 planes whose sum reconstructs w to ~2^-24 rel."""
    hi = w.astype(jnp.bfloat16)
    r1 = w - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _mm3(oh, parts):
    """One-hot [M,W] bf16 x 3-split window -> exact-ish f32 [M,N]."""
    hi, mid, lo = parts
    return (jnp.dot(oh, hi, preferred_element_type=jnp.float32)
            + jnp.dot(oh, mid, preferred_element_type=jnp.float32)
            + jnp.dot(oh, lo, preferred_element_type=jnp.float32))


def _corner_setup(px, py, pz, D):
    """Corner rows/lanes + interpolation fracs for the 8-corner stencil.

    Corner k = ex*4 + ey*2 + ez (c000..c111 naming of soft.trilinear).
    Returns (rows[8], lanes[8], fx, fy, fz) — all [8,128]."""
    qx = px - 0.5
    qy = py - 0.5
    qz = pz - 0.5
    q0x = jnp.floor(qx)
    q0y = jnp.floor(qy)
    q0z = jnp.floor(qz)
    fx = qx - q0x
    fy = qy - q0y
    fz = qz - q0z
    i0x = jnp.clip(q0x.astype(jnp.int32), 0, D - 1)
    i0y = jnp.clip(q0y.astype(jnp.int32), 0, D - 1)
    i0z = jnp.clip(q0z.astype(jnp.int32), 0, D - 1)
    i1x = jnp.clip(i0x + 1, 0, D - 1)
    i1y = jnp.clip(i0y + 1, 0, D - 1)
    i1z = jnp.clip(i0z + 1, 0, D - 1)
    # 6 bit-spreads, reused across the 8 corner codes
    sx = (part1by2(i0x), part1by2(i1x))
    sy = (part1by2(i0y), part1by2(i1y))
    sz = (part1by2(i0z), part1by2(i1z))
    rows, lanes = [], []
    for k in range(8):
        ex, ey, ez = (k >> 2) & 1, (k >> 1) & 1, k & 1
        code = sx[ex] | (sy[ey] << 1) | (sz[ez] << 2)
        rows.append(code >> 7)
        lanes.append(code & 127)
    return rows, lanes, fx, fy, fz


def _corner_weights(fx, fy, fz):
    """w[k] for k = ex*4+ey*2+ez."""
    wx = (1.0 - fx, fx)
    wy = (1.0 - fy, fy)
    wz = (1.0 - fz, fz)
    return [wx[(k >> 2) & 1] * wy[(k >> 1) & 1] * wz[k & 1]
            for k in range(8)]


def _lerp_ladder(v, fx, fy, fz):
    """soft.trilinear's combine order: z then y then x. v = 8x[8,128]."""
    c00 = v[0] * (1 - fz) + v[1] * fz
    c01 = v[2] * (1 - fz) + v[3] * fz
    c10 = v[4] * (1 - fz) + v[5] * fz
    c11 = v[6] * (1 - fz) + v[7] * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def _grad_ladder(v, fx, fy, fz):
    """soft.trilinear_grad's analytic basis derivative from corners."""
    c000, c001, c010, c011, c100, c101, c110, c111 = v
    gx = (((c100 - c000) * (1 - fy) + (c110 - c010) * fy) * (1 - fz)
          + ((c101 - c001) * (1 - fy) + (c111 - c011) * fy) * fz)
    gy = (((c010 - c000) * (1 - fx) + (c110 - c100) * fx) * (1 - fz)
          + ((c011 - c001) * (1 - fx) + (c111 - c101) * fx) * fz)
    gz = (((c001 - c000) * (1 - fx) + (c101 - c100) * fx) * (1 - fy)
          + ((c011 - c010) * (1 - fx) + (c111 - c110) * fx) * fy)
    return gx, gy, gz


def _dma_windows(tabs, win_ref, sem, base, Wn):
    """DMA each channel's [Wn,128] window into its lane block of the
    [Wn, 512] scratch (one window serves all four channels)."""
    for c, tab in enumerate(tabs):
        cp = pltpu.make_async_copy(
            tab.at[pl.ds(base, Wn), :],
            win_ref.at[:, c * LANES:(c + 1) * LANES], sem)
        cp.start()
        cp.wait()


def _dma_windows2(tabs, win_ref, sem, b1, b2, Wh):
    """Two-segment window fill: rows [0,Wh) of the scratch hold segment 1
    (table rows b1..b1+Wh), rows [Wh,2Wh) segment 2 — the sample-kernel
    analog of the march kernel's split window (trilinear corner stencils
    straddle Morton octant mid-planes, making corner rows BIMODAL; two
    half-windows cover both modes where one contiguous window cannot)."""
    for c, tab in enumerate(tabs):
        for half, b in ((0, b1), (1, b2)):
            cp = pltpu.make_async_copy(
                tab.at[pl.ds(b, Wh), :],
                win_ref.at[pl.ds(half * Wh, Wh),
                           c * LANES:(c + 1) * LANES], sem)
            cp.start()
            cp.wait()


def _seg_min(pends, rows, excl_base, Wh, rows_total):
    """Min still-pending corner row, excluding rows already covered by
    the segment at excl_base (pass a negative sentinel to exclude none)."""
    big = jnp.int32(1 << 28)
    m = big
    for k in range(8):
        rel = rows[k] - excl_base
        cov = (rel >= 0) & (rel < Wh)
        m = jnp.minimum(m, jnp.min(jnp.where(
            (pends[k] == 1) & (~cov), rows[k], big)))
    return jnp.clip(m, 0, rows_total - Wh)


def _extract4(g, sel):
    """g [1024, 512] f32, sel [8,128,128] f32 -> per-channel [8,128]."""
    g3 = g.reshape(8, 128, NCH * LANES)
    return [jnp.sum(g3[:, :, c * LANES:(c + 1) * LANES] * sel, axis=2)
            for c in range(NCH)]


def _sample_fwd_kernel(*refs, S, D, Wn, lit):
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref, dt_ref) = \
        refs[:8]
    tabs = refs[8:12]
    nout = 7 if lit else 4
    outs = refs[12:12 + nout]
    iters_ref = refs[12 + nout]
    win_ref, sem = refs[13 + nout:]
    rows_total = tabs[0].shape[0]
    Wh = Wn // 2

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t0, dt = t0_ref[:], dt_ref[:]
    zero = jnp.zeros(TILE, jnp.int32)
    zf = jnp.zeros(TILE, jnp.float32)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)

    def sbody(s, carry):
        b1, b2, niter = carry
        t = t0 + dt * (s.astype(jnp.float32) + 0.5)
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        rows, lanes, fx, fy, fz = _corner_setup(px, py, pz, D)
        # inactive rays (AABB miss / zero-length segment: dt == 0) never
        # demand a window — without this every sample of an edge tile
        # pays an extra fetch round for the pinned rays (measured 5.3
        # mini-iters/sample -> the train-step blowup in
        # tools/probe_r5_train_out.json). Their outputs stay 0 (finite);
        # the caller masks them via `valid`.
        act = (dt > 0).astype(jnp.int32)

        st0 = (tuple(act for _ in range(8)),
               tuple(tuple(zf for _ in range(8)) for _ in range(NCH)),
               b1, b2, jnp.int32(0))

        def mcond(st):
            pends, _, _, _, it = st
            anyp = zero
            for k in range(8):
                anyp = anyp | pends[k]
            # the bound must be the GUARANTEED-progress worst case, not a
            # small heuristic: every iteration clears at least the
            # min-row pending corner, so 8*TILE_RAYS iterations always
            # complete. A 64-iteration cap silently DROPPED corners
            # (vals left 0) for spatially-spread tiles — random-ray /
            # flat-tiled calls returned wrong samples (round-5 bug,
            # caught by tools/probe_r5 bisection + the tile simulator).
            # Coherent tiles exit after ~1-3 iterations regardless.
            return (it < 8 * 1024 + 8) & (jnp.max(anyp) > 0)

        def mbody(st):
            pends, vals, b1, b2, it = st
            # move both segments iff some pending corner is outside both
            nm = jnp.int32(0)
            for k in range(8):
                r1 = rows[k] - b1
                r2 = rows[k] - b2
                outw = ~(((r1 >= 0) & (r1 < Wh))
                         | ((r2 >= 0) & (r2 < Wh)))
                nm = jnp.maximum(nm, jnp.max(
                    pends[k] * outw.astype(jnp.int32)))
            nb1 = jnp.where(
                nm > 0, _seg_min(pends, rows, jnp.int32(-(1 << 28)), Wh,
                                 rows_total), b1)
            nb2 = jnp.where(
                nm > 0, _seg_min(pends, rows, nb1, Wh, rows_total), b2)

            @pl.when(nm > 0)
            def _():
                _dma_windows2(tabs, win_ref, sem, nb1, nb2, Wh)

            parts = _split3(win_ref[:])
            npends = []
            nvals = [list(v) for v in vals]
            for k in range(8):
                r1 = rows[k] - nb1
                r2 = rows[k] - nb2
                cov1 = (r1 >= 0) & (r1 < Wh)
                cov2 = (r2 >= 0) & (r2 < Wh)
                take = (pends[k] == 1) & (cov1 | cov2)
                rel = jnp.where(cov1, r1, Wh + r2)
                iota_w = jax.lax.broadcasted_iota(jnp.int32,
                                                  (8, 128, 2 * Wh), 2)
                oh = (iota_w == jnp.clip(rel, 0, 2 * Wh - 1)[:, :, None]
                      ).astype(jnp.bfloat16).reshape(1024, 2 * Wh)
                g = _mm3(oh, parts)
                sel = (iota_l == lanes[k][:, :, None]).astype(jnp.float32)
                cvals = _extract4(g, sel)
                for c in range(NCH):
                    nvals[c][k] = jnp.where(take, cvals[c], vals[c][k])
                npends.append(pends[k] & (~take).astype(jnp.int32))
            return (tuple(npends), tuple(tuple(v) for v in nvals), nb1,
                    nb2, it + 1)

        _, vals, b1, b2, mit = jax.lax.while_loop(mcond, mbody, st0)
        niter = niter + mit

        for c in range(NCH):
            outs[c][pl.ds(s, 1)] = _lerp_ladder(
                list(vals[c]), fx, fy, fz).reshape(1, 8, 128)
        if lit:
            gx, gy, gz = _grad_ladder(list(vals[0]), fx, fy, fz)
            outs[4][pl.ds(s, 1)] = gx.reshape(1, 8, 128)
            outs[5][pl.ds(s, 1)] = gy.reshape(1, 8, 128)
            outs[6][pl.ds(s, 1)] = gz.reshape(1, 8, 128)
        return (b1, b2, niter)

    _, _, niter = jax.lax.fori_loop(
        0, S, sbody,
        (jnp.int32(-(1 << 28)), jnp.int32(-(1 << 28)), jnp.int32(0)))
    # mini-loop iteration count per tile (window-thrash diagnostics)
    iters_ref[:, :] = jnp.zeros(TILE, jnp.int32) + niter


def sample_fields_fwd(tabs, o, d, t0, dt, S, dim, lit=False, window=64,
                      image_shape=None, block_shape=None,
                      stats=False, interpret=False):
    """Forward field sampling: rays [N] x S samples -> per-sample values.

    tabs: (sigma, r, g, b) Morton tables [rows, 128] f32.
    Returns (sig [S,N], r, g, b[, gsx, gsy, gsz]) — raw (pre-softplus /
    pre-sigmoid) trilinear values; grad channels when lit."""
    n = o.shape[0]
    rows = tabs[0].shape[0]
    Wn = min(window, rows)
    pack, unpack, raw_shape, grid = _tile_layout(n, image_shape, block_shape)
    chans = [pack(o[:, 0], 0.0), pack(o[:, 1], 0.0), pack(o[:, 2], 0.0),
             pack(d[:, 0], 0.0), pack(d[:, 1], 0.0), pack(d[:, 2], 0.0),
             pack(t0, 0.0), pack(dt, 0.0)]
    nt = raw_shape[0] // TILE[0] * (raw_shape[1] // TILE[1])
    ray_spec = pl.BlockSpec(TILE, lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    if raw_shape[1] == TILE[1]:
        out_spec = pl.BlockSpec((S, 8, 128), lambda i, j: (0, i, j),
                                memory_space=pltpu.VMEM)
        out_raw = (S,) + raw_shape
    else:
        out_spec = pl.BlockSpec((S, 8, 128), lambda i, j: (0, i, j),
                                memory_space=pltpu.VMEM)
        out_raw = (S,) + raw_shape
    nout = 7 if lit else 4
    outs = pl.pallas_call(
        functools.partial(_sample_fwd_kernel, S=S, D=dim, Wn=Wn, lit=lit),
        grid=grid,
        in_specs=[ray_spec] * 8 + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[out_spec] * nout + [ray_spec],
        out_shape=([jax.ShapeDtypeStruct(out_raw, jnp.float32)] * nout
                   + [jax.ShapeDtypeStruct(raw_shape, jnp.int32)]),
        scratch_shapes=[pltpu.VMEM((Wn, NCH * LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*chans, *tabs)

    def unp(x):
        return jax.vmap(unpack)(x)

    vals = tuple(unp(x) for x in outs[:nout])
    if stats:
        return vals, outs[nout]
    return vals


def _corner_sign_weights(fx, fy, fz):
    """d(w_k)/d(f-axis) factor triples for the grad-channel adjoint:
    for corner k, ds[k] = (sx*wy*wz, wx*sy*wz, wx*wy*sz) with s = +-1."""
    wx = (1.0 - fx, fx)
    wy = (1.0 - fy, fy)
    wz = (1.0 - fz, fz)
    out = []
    for k in range(8):
        ex, ey, ez = (k >> 2) & 1, (k >> 1) & 1, k & 1
        sx = 1.0 if ex else -1.0
        sy = 1.0 if ey else -1.0
        sz = 1.0 if ez else -1.0
        out.append((sx * wy[ey] * wz[ez], wx[ex] * sy * wz[ez],
                    wx[ex] * wy[ey] * sz))
    return out


def _value_f_grads(v, fx, fy, fz):
    """(d out/d fx, fy, fz) of the trilinear value from corners v[8]."""
    c00 = v[0] * (1 - fz) + v[1] * fz
    c01 = v[2] * (1 - fz) + v[3] * fz
    c10 = v[4] * (1 - fz) + v[5] * fz
    c11 = v[6] * (1 - fz) + v[7] * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    dfx = c1 - c0
    dfy = (c01 - c00) * (1 - fx) + (c11 - c10) * fx
    dfz = (((v[1] - v[0]) * (1 - fy) + (v[3] - v[2]) * fy) * (1 - fx)
           + ((v[5] - v[4]) * (1 - fy) + (v[7] - v[6]) * fy) * fx)
    return dfx, dfy, dfz


def _grad_f_grads(v, fx, fy, fz, ggx, ggy, ggz):
    """Second-order term: cotangents on the spatial-gradient channels
    chained to (fx, fy, fz) — the adjoint of _grad_ladder w.r.t. f.
    d gx/d fx = 0 etc.; the six cross terms below are the full set."""
    c000, c001, c010, c011, c100, c101, c110, c111 = v
    dgx_dfy = (((c110 - c010) - (c100 - c000)) * (1 - fz)
               + ((c111 - c011) - (c101 - c001)) * fz)
    dgx_dfz = (((c101 - c001) * (1 - fy) + (c111 - c011) * fy)
               - ((c100 - c000) * (1 - fy) + (c110 - c010) * fy))
    dgy_dfx = (((c110 - c100) - (c010 - c000)) * (1 - fz)
               + ((c111 - c101) - (c011 - c001)) * fz)
    dgy_dfz = (((c011 - c001) * (1 - fx) + (c111 - c101) * fx)
               - ((c010 - c000) * (1 - fx) + (c110 - c100) * fx))
    dgz_dfx = (((c101 - c100) - (c001 - c000)) * (1 - fy)
               + ((c111 - c110) - (c011 - c010)) * fy)
    dgz_dfy = (((c011 - c010) * (1 - fx) + (c111 - c110) * fx)
               - ((c001 - c000) * (1 - fx) + (c101 - c100) * fx))
    gfx = ggy * dgy_dfx + ggz * dgz_dfx
    gfy = ggx * dgx_dfy + ggz * dgz_dfy
    gfz = ggx * dgx_dfz + ggy * dgy_dfz
    return gfx, gfy, gfz


def _sample_bwd_kernel(*refs, S, D, Wn, lit, nsplit):
    nc = 7 if lit else 4
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref, dt_ref) = \
        refs[:8]
    cots = refs[8:8 + nc]
    tabs = refs[8 + nc:12 + nc]
    # refs[12+nc:16+nc] are the aliased gtab INPUT refs (same storage as
    # the gtab outputs below — all access goes through the output refs)
    outs = refs[16 + nc:16 + nc + 12]
    gtabs = outs[:4]
    gray = outs[4:]
    fwin_ref, gwin_ref, sem = refs[16 + nc + 12:]
    rows_total = tabs[0].shape[0]
    Wh = Wn // 2

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t0, dt = t0_ref[:], dt_ref[:]
    zero = jnp.zeros(TILE, jnp.int32)
    zf = jnp.zeros(TILE, jnp.float32)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)

    def flush(b1, b2):
        # The two segments MAY overlap in table space (b2 is the min
        # UNCOVERED pending row, which can sit just below b1). Overlap is
        # safe because of two invariants: (1) contributions for any row
        # covered by segment 1 are accumulated ONLY into segment 1's half
        # (cov1 takes priority in the rel select), so segment 2's overlap
        # rows hold exactly the loaded values; (2) segment 2 is flushed
        # FIRST, so segment 1's write — loaded values + contributions —
        # lands last and is the correct final state for overlap rows.
        for c in range(4):
            for half, b in ((1, b2), (0, b1)):
                cp = pltpu.make_async_copy(
                    gwin_ref.at[pl.ds(half * Wh, Wh),
                                c * LANES:(c + 1) * LANES],
                    gtabs[c].at[pl.ds(b, Wh), :], sem)
                cp.start()
                cp.wait()

    def loadw(b1, b2):
        for c in range(4):
            for half, b in ((0, b1), (1, b2)):
                cp = pltpu.make_async_copy(
                    gtabs[c].at[pl.ds(b, Wh), :],
                    gwin_ref.at[pl.ds(half * Wh, Wh),
                                c * LANES:(c + 1) * LANES], sem)
                cp.start()
                cp.wait()
        _dma_windows2(tabs, fwin_ref, sem, b1, b2, Wh)

    def splitn(v):
        parts = []
        rem = v
        for i in range(nsplit):
            p = rem.astype(jnp.bfloat16)
            parts.append(p)
            if i + 1 < nsplit:
                rem = rem - p.astype(jnp.float32)
        return parts

    def sbody(s, carry):
        b1s, b2s, have = carry[0], carry[1], carry[2]
        acc = list(carry[3:])
        t = t0 + dt * (s.astype(jnp.float32) + 0.5)
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        rows, lanes, fx, fy, fz = _corner_setup(px, py, pz, D)
        w8 = _corner_weights(fx, fy, fz)

        act = (dt > 0).astype(jnp.int32)
        gv = [cots[c][pl.ds(s, 1)].reshape(8, 128) for c in range(nc)]
        # per-corner per-channel cotangents (independent of corner values)
        gcs = [[gv[c] * w8[k] for k in range(8)] for c in range(NCH)]
        if lit:
            ds8 = _corner_sign_weights(fx, fy, fz)
            for k in range(8):
                gcs[0][k] = (gcs[0][k] + gv[4] * ds8[k][0]
                             + gv[5] * ds8[k][1] + gv[6] * ds8[k][2])

        st0 = (tuple(act for _ in range(8)),
               tuple(tuple(zf for _ in range(8)) for _ in range(NCH)),
               b1s, b2s, have, jnp.int32(0))

        def mcond(st):
            pends, _, _, _, _, it = st
            anyp = zero
            for k in range(8):
                anyp = anyp | pends[k]
            # guaranteed-progress bound — see the forward kernel's note
            return (it < 8 * 1024 + 8) & (jnp.max(anyp) > 0)

        def mbody(st):
            pends, vals, b1, b2, have, it = st
            nm = jnp.int32(0)
            for k in range(8):
                r1 = rows[k] - b1
                r2 = rows[k] - b2
                outw = ~(((r1 >= 0) & (r1 < Wh))
                         | ((r2 >= 0) & (r2 < Wh)))
                nm = jnp.maximum(nm, jnp.max(
                    pends[k] * outw.astype(jnp.int32)))
            nb1 = jnp.where(
                nm > 0, _seg_min(pends, rows, jnp.int32(-(1 << 28)), Wh,
                                 rows_total), b1)
            nb2 = jnp.where(
                nm > 0, _seg_min(pends, rows, nb1, Wh, rows_total), b2)

            @pl.when((nm > 0) & (have == 1))
            def _():
                flush(b1, b2)

            @pl.when(nm > 0)
            def _():
                loadw(nb1, nb2)

            parts = _split3(fwin_ref[:])
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 2 * Wh),
                                              2)
            npends = []
            nvals = [list(v) for v in vals]
            ohs = []
            sels = []
            for k in range(8):
                r1 = rows[k] - nb1
                r2 = rows[k] - nb2
                cov1 = (r1 >= 0) & (r1 < Wh)
                cov2 = (r2 >= 0) & (r2 < Wh)
                take = (pends[k] == 1) & (cov1 | cov2)
                rel = jnp.where(cov1, r1, Wh + r2)
                # take-masked one-hot: serves the value fetch (masked
                # writes) AND the scatter (zero rows scatter nothing, and
                # a corner scatters exactly once across mini-iterations).
                # take must ride as int32: Mosaic rejects minor-dim
                # insertion on i1 vectors ("only supported for 32-bit")
                takei = take.astype(jnp.int32)[:, :, None]
                oh = ((iota_w == jnp.clip(rel, 0, 2 * Wh - 1)[:, :, None])
                      & (takei == 1)).astype(jnp.bfloat16)
                ohs.append(oh.reshape(1024, 2 * Wh))
                g = _mm3(ohs[-1], parts)
                sel = (iota_l == lanes[k][:, :, None]).astype(jnp.float32)
                sels.append(sel)
                cvals = _extract4(g, sel)
                for c in range(NCH):
                    nvals[c][k] = jnp.where(take, cvals[c], vals[c][k])
                npends.append(pends[k] & (~take).astype(jnp.int32))
            oh8 = jnp.concatenate(ohs, axis=0)              # [8192, 2Wh]
            for c in range(NCH):
                spread = jnp.concatenate(
                    [(sels[k] * gcs[c][k][:, :, None]).reshape(1024, 128)
                     for k in range(8)], axis=0)            # [8192, 128]
                delta = zf[0:0]
                for part in splitn(spread):
                    dd = jax.lax.dot_general(
                        oh8, part.astype(jnp.bfloat16),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    delta = dd if delta.shape == (0, 128) else delta + dd
                gwin_ref[0:2 * Wh, c * LANES:(c + 1) * LANES] = (
                    gwin_ref[0:2 * Wh, c * LANES:(c + 1) * LANES] + delta)
            return (tuple(npends), tuple(tuple(v) for v in nvals), nb1,
                    nb2, jnp.int32(1), it + 1)

        _, vals, b1s, b2s, have, _ = jax.lax.while_loop(mcond, mbody, st0)

        # chain sample-position cotangents to the ray parameters
        gfx = zf
        gfy = zf
        gfz = zf
        for c in range(NCH):
            dfx, dfy, dfz = _value_f_grads(list(vals[c]), fx, fy, fz)
            gfx = gfx + gv[c] * dfx
            gfy = gfy + gv[c] * dfy
            gfz = gfz + gv[c] * dfz
        if lit:
            g2x, g2y, g2z = _grad_f_grads(list(vals[0]), fx, fy, fz,
                                          gv[4], gv[5], gv[6])
            gfx = gfx + g2x
            gfy = gfy + g2y
            gfz = gfz + g2z
        gdot = gfx * dx + gfy * dy + gfz * dz
        sf = s.astype(jnp.float32) + 0.5
        acc[0] = acc[0] + gfx
        acc[1] = acc[1] + gfy
        acc[2] = acc[2] + gfz
        acc[3] = acc[3] + gfx * t
        acc[4] = acc[4] + gfy * t
        acc[5] = acc[5] + gfz * t
        acc[6] = acc[6] + gdot
        acc[7] = acc[7] + gdot * sf
        return (b1s, b2s, have, *acc)

    out = jax.lax.fori_loop(
        0, S, sbody,
        (jnp.int32(-(1 << 28)), jnp.int32(-(1 << 28)), jnp.int32(0))
        + (zf,) * 8)
    b1s, b2s, have = out[0], out[1], out[2]

    @pl.when(have == 1)
    def _():
        flush(b1s, b2s)

    for i in range(8):
        gray[i][:, :] = out[3 + i]


def sample_fields_bwd(tabs, o, d, t0, dt, cots, dim, lit=False, window=64,
                      nsplit=3, image_shape=None, block_shape=None,
                      interpret=False):
    """Backward field sampling: per-sample cotangents -> (gtabs, go, gd,
    gt0, gdt).

    cots: (gsig, gr, gg, gb[, ggx, ggy, ggz]) each [S, N] — cotangents on
    the RAW per-sample values returned by sample_fields_fwd. Voxel-grad
    tables come back in Morton layout [rows, 128] (accumulated in-kernel
    through aliased window RMWs); ray cotangents are [N(,3)] sums over
    samples, matching autodiff through p_s = o + (t0 + dt (s+.5)) d.
    nsplit: bf16 split depth of the scatter operand (3 = f32-accurate,
    lower trades accuracy for fewer MXU passes)."""
    n = o.shape[0]
    S = cots[0].shape[0]
    rows = tabs[0].shape[0]
    Wn = min(window, rows)
    pack, unpack, raw_shape, grid = _tile_layout(n, image_shape, block_shape)
    chans = [pack(o[:, 0], 0.0), pack(o[:, 1], 0.0), pack(o[:, 2], 0.0),
             pack(d[:, 0], 0.0), pack(d[:, 1], 0.0), pack(d[:, 2], 0.0),
             pack(t0, 0.0), pack(dt, 0.0)]
    cot_raw = [jax.vmap(lambda x: pack(x, 0.0))(c) for c in cots]
    nc = len(cots)
    assert nc == (7 if lit else 4)
    gtab0 = [jnp.zeros_like(t) for t in tabs]

    ray_spec = pl.BlockSpec(TILE, lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    cot_spec = pl.BlockSpec((S, 8, 128), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = ([jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in tabs]
                 + [jax.ShapeDtypeStruct(raw_shape, jnp.float32)] * 8)
    out_specs = [any_spec] * 4 + [ray_spec] * 8
    aliases = {8 + nc + 4 + i: i for i in range(4)}
    outs = pl.pallas_call(
        functools.partial(_sample_bwd_kernel, S=S, D=dim, Wn=Wn, lit=lit,
                          nsplit=nsplit),
        grid=grid,
        in_specs=([ray_spec] * 8 + [cot_spec] * nc + [any_spec] * 8),
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.VMEM((Wn, NCH * LANES), jnp.float32),
                        pltpu.VMEM((Wn, NCH * LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*chans, *cot_raw, *tabs, *gtab0)
    gtabs = outs[:4]
    gox, goy, goz, gdx, gdy, gdz, gt0r, gdtr = [unpack(x) for x in outs[4:]]
    go = jnp.stack([gox, goy, goz], axis=-1)
    gd = jnp.stack([gdx, gdy, gdz], axis=-1)
    return tuple(gtabs), go, gd, gt0r, gdtr
