"""Custom VJP for the differentiable soft render — the contract's core
differentiability mechanism (BASELINE.json north star: "a custom VJP that
backpropagates pixel-loss gradients to voxel colors/densities and camera
pose"; design sketched in SURVEY.md §4.5).

Why a custom VJP instead of autodiff through render/soft.py: autodiff must
save O(N_rays x S_samples) residuals (sample weights, alphas, gathered
field values) for the backward pass — at config 5 scale (2.07M rays x 192
samples) that is tens of GB and cannot fit HBM. This implementation is
O(N_rays + grid):

  forward  — a `lax.scan` over samples carrying only (T, accumulated
             color); saves ONLY the per-ray output color C as residual.
  backward — re-walks the same S samples (recompute instead of store: the
             march is cheap, HBM is precious — the same trade
             jax.checkpoint makes), maintaining transmittance T_s and the
             suffix sum  S_s = sum_{j>s} w_j c_j + T_end*sky  via
             S_s = C - sum_{j<=s} w_j c_j,  which gives closed forms

               dC/dc_s     = w_s
               dC/dalpha_s = T_s c_s - S_s / (1 - alpha_s + eps)

             Voxel-grid gradients scatter-add through the trilinear-sample
             VJP (deterministic XLA scatter — same-seed-bitwise-same grads,
             tests/test_vjp.py); camera-pose gradients chain through the
             sample positions p_s = o + t_s d and the AABB clip, exactly as
             the reference-semantics autodiff does.

Parity: forward equals render/soft.py:render_soft_rays to fp tolerance
(same op order: sequential scan == cumprod), gradients allclose vs autodiff
through the reference implementation — the §5 "custom-VJP vs autodiff"
test tier (tests/test_vjp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vxtpu.render import dda
from vxtpu.render.settings import RenderSettings
from vxtpu.render.shade import sky_color
from vxtpu.render.soft import (SoftGrid, shade_samples, trilinear,
                               trilinear_grad, warn_soft_scope)
from vxtpu.world.lights import Lights

_EPS = 1e-10


def _is_lit(settings, lights) -> bool:
    """Static: whether the lit soft mode (density-gradient-normal lambert /
    Blinn-Phong shading, soft.shade_samples) is active."""
    return (lights is not None and lights.count > 0
            and settings.shading != "flat")


def _enter_dt(o, d, dims, num_samples, seg_bounds=None):
    """Differentiable (t_start, dt) of the sampled segment. With
    seg_bounds (the occupancy-mask band, occmask.mask_segment_bounds) the
    bounds are stop_gradient'd NON-differentiable constants — same
    quadrature-gradient convention as the reference renderer."""
    t_enter, t_exit, _ = dda.ray_grid_clip(o, d, dims)
    if seg_bounds is not None:
        t0 = jax.lax.stop_gradient(jnp.maximum(seg_bounds[0], t_enter))
        t1 = jax.lax.stop_gradient(jnp.minimum(seg_bounds[1], t_exit))
        return t0, jnp.maximum(t1 - t0, 0.0) / num_samples
    seg = jnp.maximum(t_exit - t_enter, 0.0)
    return t_enter, seg / num_samples


def _sample_color(soft_sigma, soft_rgb, p, d, lights, settings, dims, lit):
    """(sigma_raw_interp, effective sample color) at points p [N,3] — the
    per-sample radiance model shared by forward scan and backward re-walk
    (the backward jax.vjp's through THIS function, so lit-mode gradients to
    sigma (via normals), rays, and lights all chain automatically)."""
    sv = trilinear(soft_sigma, p, dims)
    c = jax.nn.sigmoid(trilinear(soft_rgb, p, dims))
    if lit:
        gr = trilinear_grad(soft_sigma, p, dims)
        c = shade_samples(c, gr, p, d, lights, settings)
    return sv, c


def _forward_scan(soft: SoftGrid, o, d, lights, settings, num_samples,
                  mask=None, mask_scale=4, seg_bounds=None):
    """O(N) forward: returns color [N,3] (bit-order-identical to the
    cumprod formulation in render/soft.py — both multiply one_m factors in
    sample order). mask/seg_bounds: the masked soft model + its
    empty-space-skipping sample band (render/occmask.py)."""
    dims = soft.dims
    lit = _is_lit(settings, lights)
    t_enter, dt = _enter_dt(o, d, dims, num_samples, seg_bounds)
    _, _, valid = dda.ray_grid_clip(o, d, dims)
    n = o.shape[0]

    def step(carry, s):
        T, acc = carry
        t_s = t_enter + dt * (s.astype(o.dtype) + 0.5)
        p = o + t_s[:, None] * d
        sv, c = _sample_color(soft.sigma_raw, soft.rgb_raw, p, d, lights,
                              settings, dims, lit)
        sigma = jax.nn.softplus(sv)
        if mask is not None:
            from vxtpu.render.occmask import mask_at

            sigma = sigma * mask_at(mask, mask_scale, p)
        alpha = 1.0 - jnp.exp(-sigma * dt)
        alpha = jnp.where(valid, alpha, 0.0)
        w = T * alpha
        acc = acc + w[:, None] * c
        T = T * (1.0 - alpha + _EPS)
        return (T, acc), None

    (T_end, acc), _ = jax.lax.scan(
        step, (jnp.ones((n,), o.dtype), jnp.zeros((n, 3), o.dtype)),
        jnp.arange(num_samples),
    )
    color = acc + T_end[:, None] * sky_color(d, settings)
    return color


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 7))
def render_soft_rays_fast(soft: SoftGrid, o: jax.Array, d: jax.Array,
                          settings: RenderSettings, num_samples: int,
                          lights: Lights | None = None,
                          mask: jax.Array | None = None,
                          mask_scale: int = 4,
                          seg_bounds=None):
    """Volumetric render rgb [N,3] with an O(N_rays + grid) custom VJP.

    Semantics == render/soft.py:render_soft_rays()[0] (parity-tested);
    grads == autodiff through it (allclose, tests/test_vjp.py). ``lights``
    enables the lit soft mode; gradients then also flow to the light
    parameters (pos/rgb/intensity), matching autodiff.

    mask / seg_bounds: the masked soft model and its empty-space-skipping
    sample band (render/occmask.py) — bounds are non-differentiable by
    convention (identical to autodiff through the bounded reference);
    mask cells gate density exactly, so skipped space contributes neither
    color nor gradient."""
    warn_soft_scope(settings, lights)
    return _forward_scan(soft, o, d, lights, settings, num_samples,
                         mask, mask_scale, seg_bounds)


def _fwd(soft, o, d, settings, num_samples, lights=None, mask=None,
         mask_scale=4, seg_bounds=None):
    color = _forward_scan(soft, o, d, lights, settings, num_samples,
                          mask, mask_scale, seg_bounds)
    return color, (soft, o, d, lights, mask, seg_bounds, color)


def _bwd(settings, num_samples, mask_scale, res, g):
    soft, o, d, lights, mask, seg_bounds, color = res
    dims = soft.dims
    lit = _is_lit(settings, lights)
    n = o.shape[0]

    # with seg_bounds the stop_gradient inside _enter_dt zeroes this vjp's
    # (o, d) cotangents automatically — the bounds convention in one place
    (t_enter, dt), clip_vjp = jax.vjp(
        lambda o_, d_: _enter_dt(o_, d_, dims, num_samples, seg_bounds),
        o, d)
    _, _, valid = dda.ray_grid_clip(o, d, dims)
    # invalid (AABB-miss) rays carry ~1e30-scale clip params; every one of
    # their contributions is masked, but the huge sample positions they
    # imply can turn into inf/nan inside XLA's fused step (observed as
    # scan-only NaNs on CPU) — pin them to a harmless 0-length segment at
    # the origin. Their gradients are exactly zero either way.
    t_enter = jnp.where(valid, t_enter, 0.0)
    dt = jnp.where(valid, dt, 0.0)
    sky, sky_vjp = jax.vjp(lambda d_: sky_color(d_, settings), d)

    glights0 = (jax.tree_util.tree_map(jnp.zeros_like, lights)
                if lights is not None else Lights.none())
    carry0 = (
        jnp.ones((n,), o.dtype),          # T_s (exclusive transmittance)
        jnp.zeros((n, 3), o.dtype),       # acc = sum_{j<=s} w_j c_j
        jnp.zeros_like(soft.sigma_raw),   # gsig
        jnp.zeros_like(soft.rgb_raw),     # grgb
        jnp.zeros_like(o),                # go
        jnp.zeros_like(d),                # gd
        jnp.zeros((n,), o.dtype),         # g_t_enter
        jnp.zeros((n,), o.dtype),         # g_dt
        glights0,                         # glights (zeros when unlit)
    )

    def step(carry, s):
        T, acc, gsig, grgb, go, gd, gte, gdt, gl = carry
        sf = s.astype(o.dtype)
        t_s = t_enter + dt * (sf + 0.5)
        p = o + t_s[:, None] * d

        # the sample radiance model is re-walked under jax.vjp so EVERY
        # dependency — rgb field, sigma field (via alpha AND via lit-mode
        # normals), sample position, view dir, light params — chains with
        # one vjp call; the closed forms below only supply the cotangents
        # of (sigma_raw_interp, c_eff).
        if lit:
            def f(S_, R_, p_, d_, lp, lc, li):
                return _sample_color(
                    S_, R_, p_, d_, Lights(pos=lp, rgb=lc, intensity=li),
                    settings, dims, True)
            (sv, c), f_vjp = jax.vjp(
                f, soft.sigma_raw, soft.rgb_raw, p, d,
                lights.pos, lights.rgb, lights.intensity)
        else:
            def f(S_, R_, p_):
                return _sample_color(S_, R_, p_, None, None, settings,
                                     dims, False)
            (sv, c), f_vjp = jax.vjp(f, soft.sigma_raw, soft.rgb_raw, p)

        sigma = jax.nn.softplus(sv)
        if mask is not None:
            from vxtpu.render.occmask import mask_at

            m_s = mask_at(mask, mask_scale, p)
            sigma = sigma * m_s
        else:
            m_s = 1.0
        e = jnp.exp(-sigma * dt)
        alpha = jnp.where(valid, 1.0 - e, 0.0)
        one_m = 1.0 - alpha + _EPS
        w = T * alpha

        acc_new = acc + w[:, None] * c
        suffix = color - acc_new                       # sum_{j>s} + sky term
        # divisor clamped: XLA may reassociate (1 - alpha + eps) into
        # ((1 + eps) - alpha) which rounds to EXACTLY zero for saturated
        # samples (alpha == 1.0f) — observed as jit-only inf/nan here; the
        # max() is an optimization barrier that restores the intended eps
        # floor without changing any non-saturated value.
        denom = jnp.maximum(one_m, _EPS)
        galpha = jnp.sum(g * (T[:, None] * c - suffix / denom[:, None]),
                         axis=-1)
        galpha = jnp.where(valid, galpha, 0.0)

        gc = g * w[:, None]                            # dL/dc_eff_s
        gsigma = galpha * dt * e                       # d alpha / d sigma_eff
        gsv = gsigma * m_s * jax.nn.sigmoid(sv)        # mask gate + softplus'
        if lit:
            gs_grid, gr_grid, gp, gd_shade, glp, glc, gli = f_vjp((gsv, gc))
            gl = Lights(pos=gl.pos + glp, rgb=gl.rgb + glc,
                        intensity=gl.intensity + gli)
        else:
            gs_grid, gr_grid, gp = f_vjp((gsv, gc))
            gd_shade = jnp.zeros_like(d)

        gts = jnp.sum(gp * d, axis=-1)                 # p = o + t_s d
        return (
            T * one_m,
            acc_new,
            gsig + gs_grid,
            grgb + gr_grid,
            go + gp,
            gd + gp * t_s[:, None] + gd_shade,
            gte + gts,
            gdt + gts * (sf + 0.5) + galpha * sigma * e,  # alpha's dt term
            gl,
        ), None

    (T_end, _, gsig, grgb, go, gd, gte, gdt, gl), _ = jax.lax.scan(
        step, carry0, jnp.arange(num_samples))

    # sky: C += T_end * sky(d); T_end's alpha-dependence is already inside
    # the suffix term above, only the direct d-dependence of sky remains.
    (gd_sky,) = sky_vjp(T_end[:, None] * g)
    gd = gd + gd_sky
    # chain t_enter / dt back into (o, d) through the AABB clip (zeros
    # when seg_bounds fixed the segment — see _enter_dt)
    go2, gd2 = clip_vjp((gte, gdt))
    glights = gl if lights is not None else None
    import numpy as np

    gmask = (np.zeros(mask.shape, dtype=jax.dtypes.float0)
             if mask is not None else None)
    gbounds = (tuple(jnp.zeros_like(b) for b in seg_bounds)
               if seg_bounds is not None else None)
    return (SoftGrid(sigma_raw=gsig, rgb_raw=grgb), go + go2, gd + gd2,
            glights, gmask, gbounds)


render_soft_rays_fast.defvjp(_fwd, _bwd)


def render_soft_image_fast(soft: SoftGrid, cam, settings: RenderSettings,
                           height: int, width: int, num_samples: int,
                           lights: Lights | None = None):
    """[H,W,3] differentiable render on the custom-VJP path (grads flow to
    the soft grid AND the camera pose through generate_rays)."""
    from vxtpu.camera.rays import generate_rays

    o, d = generate_rays(cam, height, width)
    rgb = render_soft_rays_fast(soft, o, d, settings, num_samples, lights)
    return rgb.reshape(height, width, 3)
