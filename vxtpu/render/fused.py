"""Fused full-frame rendering on the flagship Pallas kernel: march AND
shade inside the kernel (the reference's OpenCL kernel does the whole
per-pixel pipeline in one dispatch — SURVEY.md §4.3; round 3's build paid
~40 ms/frame of post-march XLA shading gathers instead, VERDICT r3 #3).

Two compositions:

  * no shadows: ONE kernel — march + in-kernel shade epilogue
    (march_pallas_v2 with shade_spec).
  * shadows (settings.shadows): primary march kernel -> one t_max-capped
    shadow march kernel per light -> one fused shade kernel with the
    visibility channels (shade_pallas_v2). Same shadow semantics as
    render/pipeline.shadow_visibility (parity-tested).

Palette scenes use the 24-bit material-word table; per-voxel-RGB scenes
(config 2) pass rgb8=True with a world/packed.build_rgb8_morton table —
both shade fully in-kernel (the XLA pipeline shade path remains the
parity oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.kernel_pallas_v2 import (ShadeSpec, _SHADOW_EPS,
                                           march_pallas_v2, pack_lights,
                                           shade_pallas_v2)
from vxtpu.render.settings import RenderSettings
from vxtpu.world.lights import Lights


def render_rays_fused(o, d, accel, mats, dims, lights: Lights,
                      settings: RenderSettings, image_shape=None,
                      inkernel_shadows: bool = True,
                      rgb8: bool = False,
                      interpret: bool = False):
    """Rays [N,3] -> (rgb [N,3], HitRecord), everything in-kernel.

    inkernel_shadows=True (default) runs the per-light shadow marches as
    a second DDA loop INSIDE the march kernel — the reference's
    one-dispatch shape (SURVEY.md §4.3). False keeps the 3-dispatch
    composition (primary march -> per-light shadow kernels -> shade
    kernel), retained as the parity oracle for the in-kernel path."""
    tn = settings.tuning
    max_steps = settings.resolve_max_steps(dims)
    lights_arr = pack_lights(lights)
    kw = dict(image_shape=image_shape, window=tn.window,
              block_shape=tn.block, split_window=tn.split_window,
              split_matmul2=tn.split_matmul2,
              local_advance=tn.local_advance, fetch_v4=tn.fetch_v4,
              base_every=tn.base_every,
              sublane_windows=tn.sublane_windows, unroll=tn.unroll,
              interpret=interpret)
    shadowed = (settings.shadows and settings.shading != "flat"
                and lights.count > 0)
    if not shadowed or inkernel_shadows:
        spec = ShadeSpec.from_settings(settings, lights, use_vis=False,
                                       shadows=shadowed, rgb8=rgb8)
        rec, rgb = march_pallas_v2(o, d, accel, dims, max_steps,
                                   shade_spec=spec, mats=mats,
                                   lights_arr=lights_arr, **kw)
        return rgb, rec

    rec = march_pallas_v2(o, d, accel, dims, max_steps, **kw)
    # hit point nudged off the surface along the face normal — identical
    # to pipeline.shadow_visibility; miss rays shoot a degenerate t_max=0
    # ray from the origin (their visibility is never used: vis is ANDed
    # with rec.hit below, exactly like the XLA path)
    p = o + rec.t[..., None] * d + rec.normal * _SHADOW_EPS
    p = jnp.where(rec.hit[..., None], p, 0.0)
    vis_cols = []
    for li in range(lights.count):
        lvec = lights.pos[li][None, :] - p
        dist = jnp.linalg.norm(lvec, axis=-1)
        ldir = lvec / jnp.maximum(dist, 1e-12)[..., None]
        # backfacing gate (same as the in-kernel pass): n.l <= 0 zeroes
        # both light terms, so the shadow march's vis is never read —
        # t_max=0 makes those rays exit at init, output unchanged
        ndl = jnp.sum(rec.normal * ldir, axis=-1)
        tm = jnp.where(rec.hit & (ndl > 0.0),
                       dist - 2.0 * _SHADOW_EPS, 0.0)
        srec = march_pallas_v2(p, ldir, accel, dims, max_steps,
                               t_max=tm, **kw)
        vis_cols.append(jnp.where(srec.hit & rec.hit, 0.0, 1.0))
    vis = jnp.stack(vis_cols, axis=-1)
    spec = ShadeSpec.from_settings(settings, lights, use_vis=True,
                                   shadows=False, rgb8=rgb8)
    rgb = shade_pallas_v2(rec, o, d, vis, mats, lights_arr, spec,
                          image_shape=image_shape, block_shape=tn.block,
                          interpret=interpret)
    return rgb, rec


def render_frame_fused(accel, mats, dims, cam: Camera, lights: Lights,
                       settings: RenderSettings, height: int, width: int,
                       inkernel_shadows: bool = True,
                       rgb8: bool = False,
                       interpret: bool = False) -> jax.Array:
    """Full frame [H, W, 3] through the fused kernel path.

    rgb8=True: ``mats`` is a per-voxel RGB8 fine-Morton table
    (world/packed.build_rgb8_morton) — config 2's per-voxel-RGB scenes on
    the flagship path instead of the XLA shade fallback."""
    o, d = generate_rays(cam, height, width)
    rgb, _ = render_rays_fused(o, d, accel, mats, dims, lights, settings,
                               image_shape=(height, width),
                               inkernel_shadows=inkernel_shadows,
                               rgb8=rgb8, interpret=interpret)
    return rgb.reshape(height, width, 3)
