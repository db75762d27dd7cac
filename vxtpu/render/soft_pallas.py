"""Differentiable soft rendering on the Pallas field-sampling kernels —
the fast path for the contract's config-4/5 optimization loops
(BASELINE.json:10-11), built on render/kernel_sample.py.

Structure (deliberately different from render/vjp.py's scan):

  * MortonSoftGrid holds the scene fields in fine-voxel MORTON layout
    [rows, 128] — the kernels' native layout, so training steps never pay
    a grid-wide re-layout (conversion happens only at checkpoint/init
    boundaries via to_soft/from_soft).
  * ``sample_fields`` is the ONLY custom-VJP boundary: forward = the
    Pallas sampling kernel, backward = the Pallas scatter kernel. All
    volumetric math (softplus, mask gate, lit shading, transmittance
    cumprod, sky) is ordinary [S, N]-vectorized XLA that outer autodiff
    differentiates — so the hand-written part is exactly the gather/
    scatter pair, and the algebra that was round-1..4's bug farm stays
    machine-derived.
  * Memory is O(N*S) for the sample-value arrays (fine at the judged
    train shapes; chunk rays for config-5 scale — contributions are
    additive across ray chunks, composing with the bucketed grad psum in
    engine/sharding.py).

Semantics == render/soft.py:render_soft_rays (the oracle; same sample
positions, same clip conventions, same cumprod order) — parity and
gradient-allclose are locked in tests/test_sample_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vxtpu.render import dda
from vxtpu.render.kernel_sample import (build_field_morton,
                                        field_from_morton,
                                        sample_fields_bwd,
                                        sample_fields_fwd)
from vxtpu.render.settings import RenderSettings
from vxtpu.render.shade import sky_color
from vxtpu.render.soft import SoftGrid, warn_soft_scope
from vxtpu.utils import pytree_dataclass
from vxtpu.world.lights import Lights

_EPS = 1e-10


@pytree_dataclass
class MortonSoftGrid:
    """Optimizable scene in fine-voxel Morton table layout.

    sigma_tab: f32 [rows, 128] raw densities (softplus'd downstream).
    rgb_tab:   f32 [3, rows, 128] rgb logits (sigmoid'd downstream).
    dim is recovered from rows (rows * 128 = dim^3)."""

    sigma_tab: jax.Array
    rgb_tab: jax.Array

    @property
    def dim(self) -> int:
        n = self.sigma_tab.shape[0] * 128
        return round(n ** (1.0 / 3.0))

    @property
    def dims(self) -> tuple[int, int, int]:
        return (self.dim,) * 3

    def tables(self):
        return (self.sigma_tab, self.rgb_tab[0], self.rgb_tab[1],
                self.rgb_tab[2])

    @staticmethod
    def from_soft(soft: SoftGrid) -> "MortonSoftGrid":
        return MortonSoftGrid(
            sigma_tab=build_field_morton(soft.sigma_raw),
            rgb_tab=jnp.stack([build_field_morton(soft.rgb_raw[c])
                               for c in range(3)]))

    def to_soft(self) -> SoftGrid:
        d = self.dim
        return SoftGrid(
            sigma_raw=field_from_morton(self.sigma_tab, d),
            rgb_raw=jnp.stack([field_from_morton(self.rgb_tab[c], d)
                               for c in range(3)]))


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def sample_fields(sig, r, g, b, o, d, t0, dt, S, dim, lit, window,
                  image_shape, block_shape, interpret):
    """Raw trilinear field samples along rays, differentiable w.r.t. the
    Morton tables and the ray parameters (o, d, t0, dt). Returns a tuple
    of [S, N] arrays: (sigma, r, g, b[, gsx, gsy, gsz])."""
    return sample_fields_fwd((sig, r, g, b), o, d, t0, dt, S, dim,
                             lit=lit, window=window,
                             image_shape=image_shape,
                             block_shape=block_shape, interpret=interpret)


def _sf_fwd(sig, r, g, b, o, d, t0, dt, S, dim, lit, window, image_shape,
            block_shape, interpret):
    out = sample_fields_fwd((sig, r, g, b), o, d, t0, dt, S, dim, lit=lit,
                            window=window, image_shape=image_shape,
                            block_shape=block_shape, interpret=interpret)
    return out, (sig, r, g, b, o, d, t0, dt)


def _sf_bwd(S, dim, lit, window, image_shape, block_shape, interpret, res,
            cots):
    sig, r, g, b, o, d, t0, dt = res
    gtabs, go, gd, gt0, gdt = sample_fields_bwd(
        (sig, r, g, b), o, d, t0, dt, cots, dim, lit=lit, window=window,
        image_shape=image_shape, block_shape=block_shape,
        interpret=interpret)
    return (*gtabs, go, gd, gt0, gdt)


sample_fields.defvjp(_sf_fwd, _sf_bwd)


def _mask_at_cm(mask, scale, px, py, pz):
    """occmask.mask_at with component arrays (avoids a [S,N,3] minor-3
    intermediate, which tile-pads 3 -> 128 on TPU: 2.1 GB at the judged
    train shape — the r4 layout trap)."""
    Xc, Yc, Zc = mask.shape
    cx = jnp.clip(jnp.floor(px / scale).astype(jnp.int32), 0, Xc - 1)
    cy = jnp.clip(jnp.floor(py / scale).astype(jnp.int32), 0, Yc - 1)
    cz = jnp.clip(jnp.floor(pz / scale).astype(jnp.int32), 0, Zc - 1)
    idx = (cx * Yc + cy) * Zc + cz
    return jnp.take(mask.reshape(-1), idx, axis=0).astype(jnp.float32)


def _shade_samples_cm(rc, gc, bc, gx, gy, gz, px, py, pz, dx, dy, dz,
                      lights, settings):
    """soft.shade_samples in channel-major form: every operand is an
    [S, N] plane, so no array ever carries a minor dim of 3 (see
    _mask_at_cm). Same math to fp reassociation; parity-locked against
    shade_samples in tests/test_sample_kernel.py."""
    g2 = gx * gx + gy * gy + gz * gz
    rinv = jax.lax.rsqrt(g2 + 1e-9)
    nx = -gx * rinv
    ny = -gy * rinv
    nz = -gz * rinv
    acc = jnp.float32(settings.ambient)
    outr = rc * acc
    outg = gc * acc
    outb = bc * acc
    for li in range(lights.count):
        lx = lights.pos[li, 0] - px
        ly = lights.pos[li, 1] - py
        lz = lights.pos[li, 2] - pz
        dist2 = lx * lx + ly * ly + lz * lz
        linv = jax.lax.rsqrt(jnp.maximum(dist2, 1e-12))
        ldx = lx * linv
        ldy = ly * linv
        ldz = lz * linv
        ndotl = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
        atten = lights.intensity[li] / (1.0 + 0.002 * dist2)
        diff = ndotl * atten
        outr = outr + rc * diff * lights.rgb[li, 0]
        outg = outg + gc * diff * lights.rgb[li, 1]
        outb = outb + bc * diff * lights.rgb[li, 2]
        if settings.shading == "full":
            hx = ldx - dx
            hy = ldy - dy
            hz = ldz - dz
            hn = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz,
                                           1e-12))
            ndoth = jnp.maximum((nx * hx + ny * hy + nz * hz) * hn, 0.0)
            spec = (settings.specular_k
                    * (ndoth ** settings.specular_exp)
                    * (ndotl > 0.0) * atten)
            outr = outr + spec * lights.rgb[li, 0]
            outg = outg + spec * lights.rgb[li, 1]
            outb = outb + spec * lights.rgb[li, 2]
    return outr, outg, outb


def _enter_dt_soft(o, d, dims, num_samples, seg_bounds):
    """(t_start, dt, valid) of the sampled segment — vjp.py._enter_dt's
    convention (seg_bounds non-differentiable), with invalid rays pinned
    to a harmless zero-length segment (their output is pure sky)."""
    t_enter, t_exit, valid = dda.ray_grid_clip(o, d, dims)
    if seg_bounds is not None:
        t0 = jax.lax.stop_gradient(jnp.maximum(seg_bounds[0], t_enter))
        t1 = jax.lax.stop_gradient(jnp.minimum(seg_bounds[1], t_exit))
        dt = jnp.maximum(t1 - t0, 0.0) / num_samples
    else:
        t0 = t_enter
        dt = jnp.maximum(t_exit - t_enter, 0.0) / num_samples
    t0 = jnp.where(valid, t0, 0.0)
    dt = jnp.where(valid, dt, 0.0)
    return t0, dt, valid


def render_soft_rays_pallas(msoft: MortonSoftGrid, o: jax.Array,
                            d: jax.Array, settings: RenderSettings,
                            num_samples: int,
                            lights: Lights | None = None,
                            mask: jax.Array | None = None,
                            mask_scale: int = 4,
                            seg_bounds=None,
                            window: int = 64,
                            image_shape=None,
                            interpret: bool | None = None) -> jax.Array:
    """Volumetric render rgb [N,3] on the Pallas sampling kernels.

    Fully differentiable by ordinary autodiff: the kernel pair is the
    custom-VJP boundary, everything else is [S,N]-vectorized XLA matching
    render/soft.py's cumprod formulation op for op.

    interpret=None auto-selects: compiled on TPU-class backends (tpu /
    axon), interpret mode elsewhere (the CPU test platform)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    # spatially-coherent [8,128] tiles (32x32 image blocks) keep the
    # sample front's Morton row span narrow — without them a 1024-pixel
    # scanline strip's front spans many windows and the fetch mini-loop
    # thrashes (measured 90x slower on device)
    block_shape = ((32, 32) if image_shape is not None
                   and image_shape[0] % 32 == 0
                   and image_shape[1] % 32 == 0 else None)
    dims = msoft.dims
    warn_soft_scope(settings, lights)
    lit = (lights is not None and lights.count > 0
           and settings.shading != "flat")
    t0, dt, valid = _enter_dt_soft(o, d, dims, num_samples, seg_bounds)
    vals = sample_fields(*msoft.tables(), o, d, t0, dt, num_samples,
                         msoft.dim, lit, window, image_shape, block_shape,
                         interpret)
    sv, rr, gg, bb = vals[:4]                               # [S, N]
    sigma = jax.nn.softplus(sv)
    # ALL per-sample math stays channel-major [S, N]: any [S, N, 3] array
    # tile-pads its minor dim 3 -> 128 on TPU (2.1 GB per intermediate at
    # the judged train shape — measured as a ~50x step blowup,
    # tools/probe_r5_train_out.json r4-layout-trap entries)
    rc = jax.nn.sigmoid(rr)
    gc = jax.nn.sigmoid(gg)
    bc = jax.nn.sigmoid(bb)
    need_p = mask is not None or lit
    if need_p:
        s_idx = jnp.arange(num_samples, dtype=o.dtype) + 0.5
        t_s = t0[None, :] + dt[None, :] * s_idx[:, None]     # [S, N]
        px = o[None, :, 0] + t_s * d[None, :, 0]
        py = o[None, :, 1] + t_s * d[None, :, 1]
        pz = o[None, :, 2] + t_s * d[None, :, 2]
    if mask is not None:
        sigma = sigma * _mask_at_cm(mask, mask_scale, px, py, pz)
    if lit:
        rc, gc, bc = _shade_samples_cm(
            rc, gc, bc, vals[4], vals[5], vals[6], px, py, pz,
            d[None, :, 0], d[None, :, 1], d[None, :, 2], lights, settings)

    alpha = 1.0 - jnp.exp(-sigma * dt[None, :])              # [S, N]
    alpha = jnp.where(valid[None, :], alpha, 0.0)
    one_m = 1.0 - alpha + _EPS
    # exclusive cumprod via SHIFT, never division: cumprod/one_m divides
    # by EXACTLY zero at saturated samples on device (XLA reassociates
    # (1 - alpha + eps) to ((1 + eps) - alpha) == 0.0f when alpha == 1 —
    # the r4 trap, jit-only NaN invisible in CPU/interpret runs)
    T = jnp.cumprod(
        jnp.concatenate([jnp.ones((1, one_m.shape[1]), one_m.dtype),
                         one_m[:-1]], axis=0), axis=0)       # exclusive
    w = T * alpha
    T_end = jnp.prod(one_m, axis=0)
    sky = sky_color(d, settings)                             # [N, 3]
    color = jnp.stack([jnp.sum(w * rc, axis=0),
                       jnp.sum(w * gc, axis=0),
                       jnp.sum(w * bc, axis=0)], axis=-1)
    return color + T_end[..., None] * sky


def render_soft_image_pallas(msoft: MortonSoftGrid, cam,
                             settings: RenderSettings, height: int,
                             width: int, num_samples: int,
                             lights: Lights | None = None,
                             window: int = 64,
                             interpret: bool | None = None) -> jax.Array:
    """[H,W,3] differentiable render on the Pallas sampling path (grads
    flow to the Morton tables AND the camera pose)."""
    from vxtpu.camera.rays import generate_rays

    o, d = generate_rays(cam, height, width)
    rgb = render_soft_rays_pallas(msoft, o, d, settings, num_samples,
                                  lights, image_shape=(height, width),
                                  window=window, interpret=interpret)
    return rgb.reshape(height, width, 3)
