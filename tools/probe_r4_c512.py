"""Config 4 at its CONTRACT dims (BASELINE.json:10 — 512^3 differentiable
soft grid, optimize colors/densities from target images) executed on the
real chip: records that the 512^3 SoftGrid + adam state FITS HBM and what
a train step COSTS, unmasked vs occupancy-masked (VERDICT r3 missing #2 /
next-#5a: "no artifact shows a 512^3 SoftGrid + adam state even fits and
runs").

Writes tools/probe_r4_c512_out.json incrementally."""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vxtpu.camera.camera import Camera
from vxtpu.engine.platform import enable_compilation_cache
from vxtpu.engine.sharding import (camera_frame_rays, compute_mask_bounds,
                                   make_mesh, make_sharded_train_step,
                                   render_soft_image_sharded)
from vxtpu.render.occmask import (mask_distance_field,
                                  occupancy_mask_from_soft)
from vxtpu.render.settings import RenderSettings
from vxtpu.render.soft import SoftGrid
from vxtpu.world import procgen

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r4_c512_out.json")
RES = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        RES = json.load(f)
    RES.pop("unmasked_s32", None)   # remeasure in the new order


def save(name, entry):
    RES[name] = entry
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(name, entry, flush=True)


def hbm_mb():
    try:
        st = jax.devices()[0].memory_stats()
        return round(st.get("bytes_in_use", 0) / 1e6, 1)
    except Exception:
        return -1


def main():
    enable_compilation_cache()
    dims = (512, 512, 512)
    H = W = 256
    samples = 32
    G = 8   # 64^3 mask at 512^3
    settings = RenderSettings(shading="flat")   # emission soft mode
    mesh = make_mesh(1)
    cam = Camera.make(pos=(-360.0, 256.0, 560.0),
                      fov_y_deg=55.0).look_at((256.0, 256.0, 140.0))

    t0 = time.time()
    hard = procgen.terrain(dims, seed=7)
    truth = SoftGrid.from_hard(hard, sigma_solid=25.0)
    del hard
    gc.collect()
    save("truth_built", dict(seconds=round(time.time() - t0, 1),
                             hbm_mb=hbm_mb()))

    target = render_soft_image_sharded(truth, cam, settings, H, W, samples,
                                       mesh).reshape(-1, 3)
    target.block_until_ready()
    save("target_rendered", dict(hbm_mb=hbm_mb()))

    # learner initialized NEAR the truth (a realistic mid-training state:
    # the masked step is the steady-state cost; dense steps from scratch
    # would use mask=all-ones = the unmasked cost below)
    soft = SoftGrid(sigma_raw=truth.sigma_raw * 0.8,
                    rgb_raw=truth.rgb_raw * 0.8)
    mask = occupancy_mask_from_soft(soft, G, tau=0.01, dilate=1)
    mask_df = mask_distance_field(mask)
    occ_frac = float(jnp.mean(mask.astype(jnp.float32)))
    del truth
    # park the start state on HOST between variants: at 512^3 the state is
    # 2.1 GB and the step loop must hold two generations of params + adam
    # moments (~13 GB) — an extra device-resident copy tips HBM over (the
    # earlier opaque backend error at float(loss) after the repeat loop)
    import numpy as _np
    soft_host = jax.tree_util.tree_map(_np.asarray, soft)
    del soft
    gc.collect()
    o_c, d_c = camera_frame_rays(cam, H, W)

    # masked first: the prior variant's executables/buffers linger in the
    # allocator and the 512^3 state is ~8.4 GB of the 16 GB HBM — ordering
    # matters (the first run of this probe died with an opaque backend
    # error when masked ran after unmasked)
    for name, use_mask, S in [("masked_s8", True, 8),
                              ("masked_s32", True, 32),
                              ("unmasked_s32", False, 32)]:
        if name in RES:
            continue
        init_fn, step_fn = make_sharded_train_step(
            settings, S, mesh, optimize_camera=False, use_custom_vjp=True,
            use_mask=use_mask, mask_scale=G)
        soft = jax.tree_util.tree_map(jnp.asarray, soft_host)
        opt_state = init_fn(soft, cam)
        if use_mask:
            b0, b1 = compute_mask_bounds(mask, mask_df, cam, o_c, d_c, G)
            args = (o_c, d_c, target, mask, b0, b1)
        else:
            args = (o_c, d_c, target)
        t0 = time.time()
        s2, _, opt_state, loss = step_fn(soft, cam, opt_state, *args)
        del soft
        jax.block_until_ready(s2)
        float(loss)
        compile_s = time.time() - t0
        # ONE timed repeat with a hard sync: at 512^3 the step's live set
        # is ~14 GB of the 16 GB HBM and a third enqueued step lands
        # before the async deallocation of the previous generation's
        # buffers completes — the endpoint then kills the program with an
        # opaque InvalidArgument. One steady-state step is an honest
        # timing at this endpoint's +/-25% session noise anyway.
        t0 = time.time()
        s2, _, opt_state, loss = step_fn(s2, cam, opt_state, *args)
        jax.block_until_ready(s2)
        float(loss)
        dt = time.time() - t0
        save(name, dict(step_ms=round(dt * 1e3, 1),
                        compile_s=round(compile_s, 1),
                        loss=float(loss), rays=H * W, samples=S,
                        dims=dims, hbm_mb=hbm_mb(),
                        mask_occupied_frac=round(occ_frac, 4)))
        del opt_state, s2, loss
        gc.collect()


if __name__ == "__main__":
    main()
