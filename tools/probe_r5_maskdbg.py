"""Debug the masked field-kernel NaN + slowness at 512^3
(tools/probe_r5_train_out.json train_field_masked_512: loss NaN,
16.9 s/step): inspect the bounds ranges, NaN-count the forward at 512^3
and 128^3, masked and unmasked, with JITTED bounds.

Writes tools/probe_r5_maskdbg_out.json.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r5_maskdbg.py
"""

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

from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays
from vxtpu.render.occmask import mask_distance_field, mask_segment_bounds
from vxtpu.render.settings import RenderSettings
from vxtpu.render.soft import SoftGrid
from vxtpu.render.soft_pallas import MortonSoftGrid, render_soft_rays_pallas
from vxtpu.world import procgen
from vxtpu.world.lights import Lights

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r5_maskdbg_out.json")
RES = {}


def save(name, entry):
    RES[name] = entry
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(name, entry, flush=True)


def run(dim):
    dims = (dim,) * 3
    G = 4
    S = 8
    settings = RenderSettings(shading="lambert")
    lights = Lights.single((dims[0] * 0.2, -dims[1] * 0.3, dims[2] * 1.4),
                           intensity=2.0)
    cam = Camera.make(
        pos=(-dims[0] * 0.7, dims[1] * 0.5, dims[2] * 1.1),
        fov_y_deg=55.0).look_at(
        (dims[0] * 0.5, dims[1] * 0.5, dims[2] * 0.27))
    o, d = generate_rays(cam, 128, 128)
    occ = procgen.terrain(dims, seed=7).occupancy
    mask = (jax.lax.reduce_window(
        (occ > 0).astype(jnp.float32), 0.0, jax.lax.max,
        (G, G, G), (G, G, G), "VALID") > 0).astype(jnp.uint8)
    del occ
    mdf = mask_distance_field(mask)
    msoft = MortonSoftGrid.from_soft(SoftGrid.zeros(dims))

    bounds_fn = jax.jit(functools.partial(mask_segment_bounds, scale=G))
    t0b, t1b = jax.block_until_ready(bounds_fn(mask, o=o, d=d,
                                               df_flat=mdf))
    save(f"bounds_{dim}", dict(
        t0_min=float(jnp.min(t0b)), t0_max=float(jnp.max(t0b)),
        t1_max=float(jnp.max(t1b)),
        nonfinite=int(jnp.sum(~jnp.isfinite(t0b))
                      + jnp.sum(~jnp.isfinite(t1b))),
        nonzero_frac=round(float(jnp.mean((t1b > t0b)
                                          .astype(jnp.float32))), 3)))

    @jax.jit
    def fwd(ms, o, d, t0b, t1b):
        c = render_soft_rays_pallas(ms, o, d, settings, S, lights=lights,
                                    mask=mask, mask_scale=G,
                                    seg_bounds=(t0b, t1b),
                                    image_shape=(128, 128), window=64)
        return c

    t0 = time.perf_counter()
    c = jax.block_until_ready(fwd(msoft, o, d, t0b, t1b))
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    c = jax.block_until_ready(fwd(msoft, o, d, t0b, t1b))
    ms = (time.perf_counter() - t0) * 1e3
    save(f"masked_fwd_{dim}", dict(
        ms=round(ms, 1), compile_s=round(cs, 1),
        nan_pixels=int(jnp.sum(~jnp.isfinite(c))),
        mean=float(jnp.nanmean(c))))

    @jax.jit
    def fwd_nomask(ms_, o, d):
        return render_soft_rays_pallas(ms_, o, d, settings, S,
                                       lights=lights,
                                       image_shape=(128, 128), window=64)

    c2 = jax.block_until_ready(fwd_nomask(msoft, o, d))
    save(f"unmasked_fwd_{dim}", dict(
        nan_pixels=int(jnp.sum(~jnp.isfinite(c2))),
        mean=float(jnp.nanmean(c2))))


def main():
    run(128)
    run(512)


if __name__ == "__main__":
    main()
